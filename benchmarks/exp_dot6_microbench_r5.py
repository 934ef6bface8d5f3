"""Round-5 record: f32 HIGHEST-dot emulation strategies on the fused
kernel's dot shape ((64, 256) @ (256, 256)), standalone Pallas loops.

  nat : native HIGHEST f32 dot (six internal bf16 passes)
  cat : 2x 3K-deep bf16 dots per site, bf16 limb concats
  sep : 6 separate DEFAULT dots on f32 limb arrays (the MXU port truncates
        f32->bf16 in hardware; zero VPU casts, zero concats)

All three are accuracy-equivalent (~2e-7 of a float64 oracle; the limb
split MUST be integer bitmasking — cast round-trips get elided and
lax.reduce_precision has no Mosaic lowering). In the REAL merged kernel
all three timed within ±7% by device trace (exp_f32_trace_r5.py), so the
emulations were removed; isolated wall-clock numbers from this script
varied by session (tunnel noise) and should not be trusted over traces.
See NOTES.md "f32 HIGHEST dots measured IRREDUCIBLE".
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/nr_tpu_jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB, K, N = 64, 256, 256
NBLK = 256
OUTER = 100
DEF = jax.lax.Precision.DEFAULT

def trunc_bf(x):
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)

def split3_f32(x):
    hi = trunc_bf(x)
    r1 = x - hi
    mid = trunc_bf(r1)
    lo = r1 - mid
    return hi, mid, lo

def split3_bf(x):
    hi, mid, lo = split3_f32(x)
    return hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)

def kern_nat(x_ref, c_ref, o_ref):
    cs = c_ref[...]
    def outer(i, _):
        def body(tb, _):
            s = pl.multiple_of(tb * TB, TB)
            xb = x_ref[pl.ds(s, TB), :]
            o_ref[pl.ds(s, TB), :] = jnp.dot(
                xb, cs, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return 0
        return jax.lax.fori_loop(0, NBLK, body, 0)
    jax.lax.fori_loop(0, OUTER, outer, 0)

def kern_cat(x_ref, ca_ref, cb_ref, o_ref):
    ca, cb = ca_ref[...], cb_ref[...]
    def outer(i, _):
        def body(tb, _):
            s = pl.multiple_of(tb * TB, TB)
            xb = x_ref[pl.ds(s, TB), :]
            xh, xm, xl = split3_bf(xb)
            la = jnp.concatenate([xh, xm, xl], axis=1)
            lb = jnp.concatenate([xh, xh, xm], axis=1)
            o_ref[pl.ds(s, TB), :] = (
                jnp.dot(la, ca, preferred_element_type=jnp.float32)
                + jnp.dot(lb, cb, preferred_element_type=jnp.float32))
            return 0
        return jax.lax.fori_loop(0, NBLK, body, 0)
    jax.lax.fori_loop(0, OUTER, outer, 0)

def kern_sep(x_ref, ch_ref, cm_ref, cl_ref, o_ref):
    ch, cm, cl = ch_ref[...], cm_ref[...], cl_ref[...]
    def outer(i, _):
        def body(tb, _):
            s = pl.multiple_of(tb * TB, TB)
            xb = x_ref[pl.ds(s, TB), :]
            xh, xm, xl = split3_f32(xb)
            d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                     precision=DEF)
            o_ref[pl.ds(s, TB), :] = (
                d(xh, ch) + d(xm, ch) + d(xl, ch)
                + d(xh, cm) + d(xh, cl) + d(xm, cm))
            return 0
        return jax.lax.fori_loop(0, NBLK, body, 0)
    jax.lax.fori_loop(0, OUTER, outer, 0)

def run():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NBLK * TB, K)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100*2**20)
    oshape = jax.ShapeDtypeStruct((NBLK * TB, N), jnp.float32)

    cnp = np.asarray(c)
    chi = (cnp.view(np.uint32) & 0xFFFF0000).view(np.float32)
    r1 = cnp - chi
    cmid = (r1.view(np.uint32) & 0xFFFF0000).view(np.float32)
    clo = r1 - cmid
    bf = lambda a: jnp.asarray(a, jnp.bfloat16)
    ca = jnp.concatenate([bf(chi), bf(chi), bf(chi)], axis=0)
    cb = jnp.concatenate([bf(cmid), bf(clo), bf(cmid)], axis=0)
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    pc = {}
    pc["nat"] = (pl.pallas_call(kern_nat, out_shape=oshape, compiler_params=cp),
                 (x, c))
    pc["cat"] = (pl.pallas_call(kern_cat, out_shape=oshape, compiler_params=cp),
                 (x, ca, cb))
    pc["sep"] = (pl.pallas_call(kern_sep, out_shape=oshape, compiler_params=cp),
                 (x, f32(chi), f32(cmid), f32(clo)))

    ref = np.asarray(x, np.float64) @ cnp.astype(np.float64)
    scale = np.abs(ref).max()

    def timeit(fn, *a, reps=15):
        float(fn(*a)); ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(fn(*a)); ts.append(time.perf_counter() - t0)
        return min(ts)

    t_launch = timeit(jax.jit(lambda v: jnp.sum(v) + 1.0), x[:8])
    print(f"launch {t_launch*1e3:.2f} ms")
    flops = 2 * OUTER * NBLK * TB * K * N * 6
    peak = 394e12
    for nm, (call, args) in pc.items():
        out = np.asarray(call(*args))
        acc = float(np.abs(out - ref).max() / scale)
        f = jax.jit(lambda *a, _c=call: jnp.sum(_c(*a)))
        t = timeit(f, *args)
        oc = t - t_launch
        print(f"{nm}: acc {acc:.2e}  wall {t*1e3:.3f} ms  onchip ~{oc*1e3:.3f} ms  "
              f"pass-eff {flops/oc/peak:.3f}")

run()

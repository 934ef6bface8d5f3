#!/usr/bin/env python
"""Round-4 experiment: unrolled kernel block-loops + phase-aligned gather.

Measures the headline graph (960 s, chunked 600k/30k) and the
kernel-from-blocks isolate, bf16 and f32, on the current tree. Compare
against benchmarks/profile_r4.py's baseline numbers (same session if
possible).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nr_tpu_jax_cache")
import jax.numpy as jnp

from noisereduce_tpu.config import GateConfig
from noisereduce_tpu.api import _run_nonstationary
from noisereduce_tpu.ops.pallas import dispatch as dp
from noisereduce_tpu.ops.pallas import kernels as kn

SR, DUR, CHUNK, PAD = 48000, 960, 600000, 30000
REPS = 10


def _checksum(out):
    # native-layout reduce: a reshape here forces a relayout of the
    # tile-misaligned (ch, k, 600000) core and pollutes the measurement
    return jnp.sum(out.astype(jnp.float32))


def timeit(fn, *args, reps=REPS):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def p(label, t, extra=""):
    print(f"{label:<44s} {t * 1e3:8.2f} ms {extra}", flush=True)


def main():
    print("UNROLL =", kn._UNROLL, flush=True)
    cfg = GateConfig(sr=SR, stationary=False)
    scfg = cfg.stft
    rng = np.random.default_rng(0)
    n = SR * DUR
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    from noisereduce_tpu.ops.pallas.geometry import _geometry, _merged_halo

    ngf = cfg.smoothing[0] if cfg.smoothing else 0
    halo = _merged_halo(ngf)
    view = CHUNK + 2 * PAD
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = _geometry(
        scfg, view, halo
    )
    k = (n - 1) // CHUNK + 1
    need = n_blocks * hop
    bpad = scfg.boundary_pad
    boundary = (bpad, view)

    tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
    t_launch = timeit(jax.jit(lambda x: jnp.sum(x) + 1.0), tiny)
    p("A  launch overhead (empty jit)", t_launch)

    y32 = jax.device_put(
        jnp.asarray(rng.standard_normal((1, n)), jnp.float32), dev
    )
    y16 = y32.astype(jnp.bfloat16)  # SAME signal (the dev guard compares them)

    full = jax.jit(lambda a: _checksum(
        _run_nonstationary(a, cfg, CHUNK, PAD, "matmul", use_pallas="auto")
    ))
    t_full16 = timeit(full, y16)
    p("B1 full fused bf16 (flat out)", t_full16, f"({DUR / t_full16:,.0f} RTF, "
      f"on-chip ~{(t_full16 - t_launch) * 1e3:.1f} ms)")
    t_full32 = timeit(full, y32)
    p("B2 full fused f32 (flat out)", t_full32, f"({DUR / t_full32:,.0f} RTF, "
      f"on-chip ~{(t_full32 - t_launch) * 1e3:.1f} ms)")

    fullc = jax.jit(lambda a: _checksum(
        _run_nonstationary(
            a, cfg, CHUNK, PAD, "matmul", use_pallas="auto", cores=True
        )
    ))
    t_core16 = timeit(fullc, y16)
    p("B1c full fused bf16 (cores out, API path)", t_core16,
      f"({DUR / t_core16:,.0f} RTF, "
      f"on-chip ~{(t_core16 - t_launch) * 1e3:.1f} ms)")
    t_core32 = timeit(fullc, y32)
    p("B2c full fused f32 (cores out, API path)", t_core32,
      f"({DUR / t_core32:,.0f} RTF, "
      f"on-chip ~{(t_core32 - t_launch) * 1e3:.1f} ms)")

    # kernel-from-blocks isolate (bf16 direct)
    def build_blocks(y2d):
        ch = y2d.shape[0]
        left = PAD + bpad
        right = max(0, (k - 1) * CHUNK + need - n - left)
        ypad = jnp.pad(y2d, [(0, 0), (left, right)])
        parts = [
            jax.lax.dynamic_slice_in_dim(ypad, i * CHUNK, need, axis=-1)
            for i in range(k)
        ]
        ext_sig = jnp.stack(parts, axis=1)
        n8 = -(-n_blocks // 16) * 16
        return jnp.pad(
            ext_sig.reshape(ch * k, n_blocks, hop),
            [(0, 0), (0, n8 - n_blocks), (0, 0)],
        )

    blocks16 = jax.device_put(jax.jit(build_blocks)(y16), dev)

    def from_blocks(b):
        out = dp._merged_gate_from_blocks(
            b, cfg, view, False, None,
            out_slice=(PAD, CHUNK), fast=True, boundary=boundary,
        )
        return _checksum(out)

    t_fromblk = timeit(jax.jit(from_blocks), blocks16)
    p("B4 merged kernel from blocks (bf16+tail)", t_fromblk,
      f"(on-chip ~{(t_fromblk - t_launch) * 1e3:.1f} ms)")
    print(f"   => gather in situ ~{(t_full16 - t_fromblk) * 1e3:.1f} ms",
          flush=True)

    # numerics guard: bf16 vs f32 envelope unchanged
    full_raw = jax.jit(lambda a: _run_nonstationary(
        a, cfg, CHUNK, PAD, "matmul", use_pallas="auto"
    ))
    o16 = np.asarray(full_raw(y16)).astype(np.float32)
    o32 = np.asarray(full_raw(y32))
    rel = np.max(np.abs(o16 - o32)) / np.max(np.abs(o32))
    print(f"bf16-vs-f32 rel max dev: {rel:.3e} (expect ~4.6e-3)", flush=True)
    print("done.", flush=True)


if __name__ == "__main__":
    main()

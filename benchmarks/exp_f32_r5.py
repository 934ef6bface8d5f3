#!/usr/bin/env python
"""Round-5: per-phase attribution of the f32 DEFAULT path (VERDICT r4 #2).

The f32 merged kernel runs ~23 ms/960 s against an 11.36 ms MXU model
(49% duty) while the bf16 kernel runs at 74% — this script decomposes the
f32 kernel the same way profile_r4.py decomposed bf16, plus one probe the
bf16 path doesn't need: re-tracing with every dot at DEFAULT precision
(1 MXU pass instead of HIGHEST's 6) separates "time the 6-pass dots
genuinely need" from "time stalled around them".

  A. launch overhead
  B. f32 stage deltas: full graph / blocks build / merged-from-blocks /
     kernel without the istft tail
  C. in-kernel phase ablations on the f32 kernel (fresh trace per stub —
     see profile_r4.py's methodology note): iSTFT body, mask phases,
     freq-smooth/blend, spectra-only
  P. precision probe: same kernel, all dots DEFAULT (numerics wrong; the
     checksum only forces execution)

Run on the TPU: python benchmarks/exp_f32_r5.py
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
REPS = 8


def _checksum(out):
    if out.size % 4096 == 0:
        return jnp.sum(out.reshape(-1, 4096).astype(jnp.float32))
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
    print(f"{label:<46s} {t * 1e3:8.2f} ms {extra}", flush=True)


def main():
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

    # ---- A. launch overhead ------------------------------------------------
    tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
    t_launch = timeit(jax.jit(lambda x: jnp.sum(x) + 1.0), tiny)
    p("A  launch overhead (empty jit)", t_launch)

    # ---- B. f32 stage deltas -------------------------------------------------
    y32 = jax.device_put(
        jnp.asarray(rng.standard_normal((1, n)), jnp.float32), dev
    )
    full = jax.jit(lambda a: _checksum(
        _run_nonstationary(a, cfg, CHUNK, PAD, "matmul", use_pallas="auto")
    ))
    t_full = timeit(full, y32)
    p("B1 full fused f32", t_full, f"({DUR / t_full:,.0f} RTF, on-chip "
      f"~{(t_full - t_launch) * 1e3:.1f} ms)")

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
        n8 = -(-n_blocks // 8) * 8
        return jnp.pad(
            ext_sig.reshape(ch * k, n_blocks, hop),
            [(0, 0), (0, n8 - n_blocks), (0, 0)],
        )

    t_blocks = timeit(jax.jit(lambda a: _checksum(build_blocks(a))), y32)
    p("B2 blocks build f32 (pad+slices+stack)", t_blocks,
      f"(on-chip ~{(t_blocks - t_launch) * 1e3:.1f} ms)")

    blocks32 = jax.device_put(jax.jit(build_blocks)(y32), dev)

    def from_blocks(b):
        out = dp._merged_gate_from_blocks(
            b, cfg, view, False, None,
            out_slice=(PAD, CHUNK), fast=False, boundary=boundary,
        )
        return _checksum(out)

    t_fromblk = timeit(jax.jit(from_blocks), blocks32)
    p("B3 merged kernel from blocks (f32+tail)", t_fromblk,
      f"(on-chip ~{(t_fromblk - t_launch) * 1e3:.1f} ms)")

    orig_tail = dp._scipy_istft_tail

    def tail_stub(out_blocks, scfg_, n_frames_, out_slice=None,
                  norm_done=False):
        B, tp, hp = out_blocks.shape
        return out_blocks.reshape(B, tp * hp)

    dp._scipy_istft_tail = tail_stub
    try:
        jax.clear_caches()
        t_notail = timeit(jax.jit(lambda b: from_blocks(b)), blocks32)
    finally:
        dp._scipy_istft_tail = orig_tail
    p("B4 kernel, no tail slice (plane checksum)", t_notail,
      f"-> tail+assembly ~{(t_fromblk - t_notail) * 1e3:.1f} ms")

    # ---- C. in-kernel phase ablations (fresh trace per stub) ----------------
    def run_fromblocks():
        jax.clear_caches()

        def fresh(b):
            return from_blocks(b)

        return timeit(jax.jit(fresh), blocks32)

    orig_istft = kn._apply_istft_kernel
    orig_am = kn._am_kernel
    orig_fs = kn._freq_smooth_blend_phase

    def istft_stub(re_ref, im_ref, m_ref, ci, si, out_ref, *, inv=None,
                   oacc_ref=None, **kw):
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        if oacc_ref is not None:
            oacc_ref[...] = jnp.zeros(oacc_ref.shape, oacc_ref.dtype)

    def am_stub(blocks_hbm, c_ref, s_ref, re_ref, im_ref, mask_ref, tc_ref,
                ts_ref, y_ref, blocks_ref, dma_sem, l_ref, lt_ref, dfwd_ref,
                dbwd_ref, **kw):
        from jax.experimental import pallas as pl_

        j = pl_.program_id(1)
        bin0 = kw["bin0_base"] + j * kw["core"]
        kn._spectra_phases(
            blocks_hbm, blocks_ref, dma_sem, c_ref, s_ref, re_ref, im_ref,
            tc_ref, ts_ref,
            n_tb=kw["n_tb"], n_tiles=kw["n_tiles"], r=kw["r"],
            ext=kw["ext"], bin0=bin0, j=j, col_dc=kw["col_dc"],
            n_bins=kw["n_bins"], scale=kw["scale"], prec=kw["prec"],
            boundary=kw.get("boundary"), direct=kw.get("direct", False),
        )
        mask_ref[...] = jnp.ones(mask_ref.shape, mask_ref.dtype)

    def fs_stub(mask_s, band, **kw):
        return

    kn._apply_istft_kernel = istft_stub
    dp._apply_istft_kernel = istft_stub
    try:
        t_noistft = run_fromblocks()
    finally:
        kn._apply_istft_kernel = orig_istft
        dp._apply_istft_kernel = orig_istft
    p("C1 ablate iSTFT body", t_noistft,
      f"-> iSTFT ~{(t_fromblk - t_noistft) * 1e3:.1f} ms")

    kn._am_kernel = am_stub
    dp._am_kernel = am_stub
    try:
        t_nomask = run_fromblocks()
    finally:
        kn._am_kernel = orig_am
        dp._am_kernel = orig_am
    p("C2 ablate mask phases (mask:=1)", t_nomask,
      f"-> IIR+sigmoid+tsmooth ~{(t_fromblk - t_nomask) * 1e3:.1f} ms")

    kn._freq_smooth_blend_phase = fs_stub
    dp._freq_smooth_blend_phase = fs_stub
    try:
        t_nofs = run_fromblocks()
    finally:
        kn._freq_smooth_blend_phase = orig_fs
        dp._freq_smooth_blend_phase = orig_fs
    p("C3 ablate freq-smooth/blend", t_nofs,
      f"-> band+blend ~{(t_fromblk - t_nofs) * 1e3:.1f} ms")

    kn._apply_istft_kernel = istft_stub
    dp._apply_istft_kernel = istft_stub
    kn._am_kernel = am_stub
    dp._am_kernel = am_stub
    kn._freq_smooth_blend_phase = fs_stub
    dp._freq_smooth_blend_phase = fs_stub
    try:
        t_sponly = run_fromblocks()
    finally:
        kn._apply_istft_kernel = orig_istft
        dp._apply_istft_kernel = orig_istft
        kn._am_kernel = orig_am
        dp._am_kernel = orig_am
        kn._freq_smooth_blend_phase = orig_fs
        dp._freq_smooth_blend_phase = orig_fs
    p("C4 spectra+DMA only", t_sponly,
      f"(on-chip ~{(t_sponly - t_launch) * 1e3:.1f} ms)")

    # ---- P. precision probe: every dot at DEFAULT (1 pass) ------------------
    # _HIGHEST is read as a module global at trace time in both modules; a
    # fresh trace under the patched value compiles the SAME kernel with
    # 1-pass dots. Numerics are wrong on purpose — the delta vs B3 is the
    # marginal cost of HIGHEST's extra 5 passes, and the remainder is
    # VPU/DMA/loop time the passes were hiding (or not).
    orig_prec_dp = dp._HIGHEST
    orig_prec_kn = kn._HIGHEST
    dp._HIGHEST = jax.lax.Precision.DEFAULT
    kn._HIGHEST = jax.lax.Precision.DEFAULT
    try:
        t_default = run_fromblocks()
    finally:
        dp._HIGHEST = orig_prec_dp
        kn._HIGHEST = orig_prec_kn
    p("P1 all dots DEFAULT (1-pass probe)", t_default,
      f"-> HIGHEST marginal ~{(t_fromblk - t_default) * 1e3:.1f} ms")

    print("done.", flush=True)


if __name__ == "__main__":
    main()

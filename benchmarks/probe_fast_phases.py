#!/usr/bin/env python
"""On-chip phase isolation of the bf16 FAST merged kernel (direct
windowed-DFT path), bench geometry: 960 s @48 kHz, chunk 600k/30k.

Monkeypatch no-op probes (same approach as the round-2 f32 probes in
NOTES.md): each variant stubs one phase of the merged kernel out and the
cumulative-graph difference isolates that phase's cost. Stubs keep every
ref write shape-legal so Mosaic still compiles the same pipeline skeleton.

Run on the TPU: python benchmarks/probe_fast_phases.py
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
from noisereduce_tpu.ops.pallas import dispatch as dp
from noisereduce_tpu.ops.pallas import kernels as kn

SR, DUR, CHUNK, PAD = 48000, 960, 600000, 30000
REPS = 8


def _checksum(out):
    if out.size % 4096 == 0:
        return jnp.sum(out.reshape(-1, 4096))
    return jnp.sum(out)


def timeit(fn, *args):
    float(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = GateConfig(sr=SR, stationary=False)
    scfg = cfg.stft
    rng = np.random.default_rng(0)
    n = SR * DUR
    dev = jax.devices()[0]

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

    y = jax.device_put(
        jnp.asarray(rng.standard_normal((1, n)), jnp.bfloat16), dev
    )

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
        n16 = -(-n_blocks // 16) * 16
        return jnp.pad(
            ext_sig.reshape(ch * k, n_blocks, hop),
            [(0, 0), (0, n16 - n_blocks), (0, 0)],
        )

    blocks = jax.device_put(jax.jit(build_blocks)(y), dev)

    def run():
        f = jax.jit(lambda b: _checksum(
            dp._merged_gate_from_blocks(
                b, cfg, view, False, None,
                out_slice=(PAD, CHUNK), fast=True, boundary=boundary,
            ).astype(jnp.float32)
        ))
        return timeit(f, blocks)

    t_full = run()
    print(f"P0 full merged kernel:            {t_full*1e3:8.2f} ms")

    # ---- P1: skip the iSTFT body (write out once from the OLA acc only) --
    orig_istft = kn._apply_istft_kernel

    def istft_stub(re_ref, im_ref, m_ref, ci, si, out_ref, *, inv=None,
                   oacc_ref=None, **kw):
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        if oacc_ref is not None:
            oacc_ref[...] = jnp.zeros(oacc_ref.shape, oacc_ref.dtype)

    kn._apply_istft_kernel = istft_stub
    dp._apply_istft_kernel = istft_stub
    try:
        t_noistft = run()
    finally:
        kn._apply_istft_kernel = orig_istft
        dp._apply_istft_kernel = orig_istft
    print(f"P1 skip iSTFT:                    {t_noistft*1e3:8.2f} ms"
          f"   -> iSTFT ~{(t_full-t_noistft)*1e3:.1f} ms")

    # ---- P2: mask := 1 (skip IIR + sigmoid + time smooth) -----------------
    orig_am = kn._am_kernel

    def am_stub(blocks_hbm, c_ref, s_ref, re_ref, im_ref, mask_ref, tc_ref,
                ts_ref, y_ref, blocks_ref, dma_sem, l_ref, lt_ref, dfwd_ref,
                dbwd_ref, **kw):
        import jax.experimental.pallas as pl_

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

    kn._am_kernel = am_stub
    dp._am_kernel = am_stub
    try:
        t_nomask = run()
    finally:
        kn._am_kernel = orig_am
        dp._am_kernel = orig_am
    print(f"P2 mask:=1 (no IIR/sig/tsmooth):  {t_nomask*1e3:8.2f} ms"
          f"   -> mask phases ~{(t_full-t_nomask)*1e3:.1f} ms")

    # ---- P3: no freq smoothing blend (isolate banded dot + blend) ---------
    orig_fs = kn._freq_smooth_blend_phase

    def fs_stub(mask_s, band, **kw):
        return

    kn._freq_smooth_blend_phase = fs_stub
    dp._freq_smooth_blend_phase = fs_stub
    try:
        t_nofs = run()
    finally:
        kn._freq_smooth_blend_phase = orig_fs
        dp._freq_smooth_blend_phase = orig_fs
    print(f"P3 skip freq-smooth blend:        {t_nofs*1e3:8.2f} ms"
          f"   -> band+blend ~{(t_full-t_nofs)*1e3:.1f} ms")

    # ---- P4: spectra only (P1+P2 combined) --------------------------------
    kn._apply_istft_kernel = istft_stub
    dp._apply_istft_kernel = istft_stub
    kn._am_kernel = am_stub
    dp._am_kernel = am_stub
    kn._freq_smooth_blend_phase = fs_stub
    dp._freq_smooth_blend_phase = fs_stub
    try:
        t_sponly = run()
    finally:
        kn._apply_istft_kernel = orig_istft
        dp._apply_istft_kernel = orig_istft
        kn._am_kernel = orig_am
        dp._am_kernel = orig_am
        kn._freq_smooth_blend_phase = orig_fs
        dp._freq_smooth_blend_phase = orig_fs
    print(f"P4 spectra+DMA only:              {t_sponly*1e3:8.2f} ms")

    tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
    t_launch = timeit(jax.jit(lambda x: jnp.sum(x) + 1.0), tiny)
    print(f"launch overhead:                  {t_launch*1e3:8.2f} ms")
    print(f"=> on-chip: full ~{(t_full-t_launch)*1e3:.1f}, spectra+fixed "
          f"~{(t_sponly-t_launch)*1e3:.1f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Finer on-chip split of the fused pipeline: spectra kernel alone (phases
1-2 of kernel AM), full kernel AM (spectra + IIR + sigmoid + time smooth),
AM + banded matmul + blend, and the whole gate (adds kernel B + envelope).

One-off probe over internals; run on the TPU from the repo root.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from noisereduce_tpu.config import GateConfig
from noisereduce_tpu.ops import pallas_pipeline as pp

SR = 48000
DUR = 960
CHUNK = 600000
PAD = 30000
REPS = 5


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
    view = CHUNK + 2 * PAD
    k = (n - 1) // CHUNK + 1
    geom = pp._geometry(scfg, view)
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = geom

    blocks = jnp.asarray(
        rng.standard_normal((k, nb_pad, hop)), dtype=jnp.float32
    )
    blocks = jax.device_put(blocks, jax.devices()[0])
    print(f"blocks {blocks.shape}, t_pad={t_pad}, n_tiles={n_tiles}")

    # spectra kernel only (DMA + block DFT + twiddle combine + hann)
    def spectra_from_blocks(b):
        # replicate _fused_stft_planes' pallas_call on prebuilt blocks
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        c_np, s_np = pp._block_dft_consts_np(scfg, n_tiles)
        scale = 1.0 / float(pp._analysis_window_np(scfg).sum())
        sk = functools.partial(
            pp._spectra_kernel,
            n_tb=t_pad // pp._TB, n_tiles=n_tiles, r=r, ext=ext,
            bin0_base=-pp._HALO, col_dc=pp._HALO - 1, n_bins=scfg.n_bins, scale=scale,
        )

        def kern(b_ref, c_ref, s_ref, re_ref, im_ref, tc, ts_, bv, sem):
            sk(b_ref, c_ref[0], s_ref[0], re_ref, im_ref, tc, ts_, bv, sem)

        B = b.shape[0]
        f_pad = n_tiles * pp._FT
        plane_spec = pl.BlockSpec(
            (1, t_pad, pp._FT), lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kern,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, hop, pp._FT), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hop, pp._FT), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(plane_spec, plane_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
                jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((ext, pp._FT), jnp.float32),
                pltpu.VMEM((ext, pp._FT), jnp.float32),
                pltpu.VMEM((nb_pad, hop), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(b, jnp.asarray(c_np), jnp.asarray(s_np))

    t_sp = timeit(jax.jit(lambda b: sum(jnp.sum(x) for x in spectra_from_blocks(b))), blocks)
    print(f"spectra kernel:     {t_sp*1e3:8.2f} ms")

    t_full = timeit(
        jax.jit(lambda b: jnp.sum(
            pp._fused_gate_from_blocks(b, cfg, view, False, None))),
        blocks,
    )
    print(f"gate from blocks:   {t_full*1e3:8.2f} ms")

    # spectra (re_w, im_w) for isolating kernel B
    re_w, im_w = jax.jit(spectra_from_blocks)(blocks)
    mask = jnp.ones_like(re_w)

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ci_np, si_np = pp._block_idft_consts_np(scfg, n_tiles)
    col_dc = pp._HALO - 1
    post = float(pp._analysis_window_np(scfg).sum())
    bk = functools.partial(
        pp._apply_istft_kernel,
        n_tb=t_pad // pp._TB, n_tiles=n_tiles, r=r, hop=hop,
        bin0_base=-pp._HALO, col_dc=pp._HALO - 1, n_bins=scfg.n_bins, post=post,
    )

    def istft_kernel(re_ref, im_ref, m_ref, ci_ref, si_ref, out_ref):
        bk(re_ref, im_ref, m_ref, ci_ref[0], si_ref[0], out_ref)

    def kernel_b(r_, i_, m_):
        B = r_.shape[0]
        plane_spec = pl.BlockSpec(
            (1, t_pad, pp._FT), lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        )
        idft_spec = pl.BlockSpec(
            (1, pp._FT, hop), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, t_pad, hop), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            istft_kernel,
            grid=(B, n_tiles),
            in_specs=[plane_spec, plane_spec, plane_spec, idft_spec,
                      idft_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, t_pad, hop), jnp.float32),
        )(r_, i_, m_, jnp.asarray(ci_np), jnp.asarray(si_np))

    t_b = timeit(jax.jit(lambda a, b, c: jnp.sum(kernel_b(a, b, c))),
                 re_w, im_w, mask)
    print(f"kernel B:           {t_b*1e3:8.2f} ms")

    # banded matmul alone
    w = jnp.asarray(pp._freq_band_np(5, scfg.n_bins, n_tiles))
    t_band = timeit(
        jax.jit(lambda m: jnp.sum(jnp.matmul(
            m, w, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))),
        mask,
    )
    print(f"banded matmul:      {t_band*1e3:8.2f} ms")


if __name__ == "__main__":
    main()

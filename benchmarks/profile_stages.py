#!/usr/bin/env python
"""Stage-level on-chip timings for the non-stationary pipeline.

Times each stage of STFT -> mask -> smooth -> apply+ISTFT separately with an
in-graph scalar checksum (the axon tunnel's block_until_ready returns early;
a 4-byte D2H forces real completion without timing a large transfer).

Run on the TPU:  python benchmarks/profile_stages.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from noisereduce_tpu.config import GateConfig
from noisereduce_tpu.ops import stft, istft, smooth_mask, ewma_filtfilt, sigmoid
from noisereduce_tpu.ops.pallas_mask import fused_nonstationary_mask_tm
from noisereduce_tpu.models.spectral_gate import gate_nonstationary

SR = 48000
DUR = 960
CHUNK = 600000
PAD = 30000
REPS = 5


def timeit(fn, *args):
    out = fn(*args)
    float(out)  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = GateConfig(sr=SR, stationary=False)
    scfg = cfg.stft
    n = SR * DUR
    rng = np.random.default_rng(0)
    n_chunks = (n - 1) // CHUNK + 1
    view = CHUNK + 2 * PAD
    chunks = jnp.asarray(
        rng.standard_normal((1, n_chunks, view)), dtype=jnp.float32
    )
    chunks = jax.device_put(chunks, jax.devices()[0])
    print(f"workload: {n_chunks} chunks x {view} samples "
          f"({DUR}s @ {SR} Hz), platform {jax.devices()[0].platform}")

    n_frames = scfg.n_frames(view)
    n_bins = scfg.n_bins
    print(f"per-chunk frames={n_frames} bins={n_bins}")

    # --- full pipeline ---------------------------------------------------
    @jax.jit
    def full(c):
        return jnp.sum(gate_nonstationary(c, cfg, method="matmul"))

    t_full = timeit(full, chunks)
    print(f"full pipeline: {t_full*1e3:8.2f} ms  ({DUR/t_full:,.0f} RTF)")

    # --- stft ------------------------------------------------------------
    @jax.jit
    def do_stft(c):
        re, im = stft(c, scfg, method="matmul", time_major=True, split=True)
        return jnp.sum(re) + jnp.sum(im)

    t_stft = timeit(do_stft, chunks)
    print(f"stft:          {t_stft*1e3:8.2f} ms")

    re, im = jax.jit(
        lambda c: stft(c, scfg, method="matmul", time_major=True, split=True)
    )(chunks)
    re = jax.device_put(re, jax.devices()[0])
    im = jax.device_put(im, jax.devices()[0])

    # --- mask: pallas vs jnp ----------------------------------------------
    @jax.jit
    def mask_pallas(r, i):
        return jnp.sum(fused_nonstationary_mask_tm(
            r, i, cfg.iir_b, cfg.thresh_n_mult_nonstationary,
            cfg.sigmoid_slope_nonstationary))

    @jax.jit
    def mask_jnp(r, i):
        mag = jnp.sqrt(r * r + i * i)
        floor = ewma_filtfilt(mag, cfg.iir_b, axis=-2)
        return jnp.sum(sigmoid((mag - floor) / floor,
                               -cfg.thresh_n_mult_nonstationary,
                               cfg.sigmoid_slope_nonstationary))

    t_mp = timeit(mask_pallas, re, im)
    t_mj = timeit(mask_jnp, re, im)
    print(f"mask pallas:   {t_mp*1e3:8.2f} ms")
    print(f"mask jnp:      {t_mj*1e3:8.2f} ms")

    mask = jax.jit(lambda r, i: fused_nonstationary_mask_tm(
        r, i, cfg.iir_b, cfg.thresh_n_mult_nonstationary,
        cfg.sigmoid_slope_nonstationary))(re, im)

    # --- smoothing ---------------------------------------------------------
    sm = cfg.smoothing
    @jax.jit
    def do_smooth(m):
        return jnp.sum(smooth_mask(m, *sm, time_major=True))

    t_sm = timeit(do_smooth, mask)
    print(f"smooth:        {t_sm*1e3:8.2f} ms  (kernel {sm})")

    # --- apply + istft ------------------------------------------------------
    @jax.jit
    def do_istft(r, i, m):
        y = istft((r * m, i * m), scfg, method="matmul", time_major=True)
        return jnp.sum(y)

    t_is = timeit(do_istft, re, im, mask)
    print(f"apply+istft:   {t_is*1e3:8.2f} ms")

    total = t_stft + t_mp + t_sm + t_is
    print(f"stage sum:     {total*1e3:8.2f} ms (vs full {t_full*1e3:.2f})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: real-time factor of the default (non-stationary)
denoise pipeline at 48 kHz, float32, chunked, on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": RTF, "unit": "audio-sec/sec/chip",
   "vs_baseline": RTF / reference_cpu_RTF}

The reference publishes no numbers (BASELINE.md), so the baseline is the
reference NumPy engine measured here on CPU over the same workload shape.
"""
import json
import os
import sys
import time
import warnings

import numpy as np

SR = 48000
DURATION_S = 960          # audio seconds per timed run on device
CHUNK = 600000            # reference default chunk geometry
PAD = 30000
REF_DURATION_S = 20       # reference CPU measurement length (RTF ~ length-free)


def _measure_tpu_rtf():
    import jax
    import jax.numpy as jnp

    from noisereduce_tpu.config import GateConfig
    from noisereduce_tpu.models.spectral_gate import gate_nonstationary
    from noisereduce_tpu.parallel.chunking import process_chunked

    cfg = GateConfig(sr=SR, stationary=False)
    n = SR * DURATION_S

    @jax.jit
    def forward(y):
        out = process_chunked(
            lambda c: gate_nonstationary(c, cfg, method="matmul"),
            y,
            chunk_size=CHUNK,
            padding=PAD,
        )
        # In-graph checksum: synchronizing on a 4-byte scalar forces real
        # completion even through remote-execution tunnels where
        # block_until_ready returns early, without timing a huge D2H.
        return jnp.sum(out)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((1, n)), dtype=jnp.float32)
    y = jax.device_put(y, jax.devices()[0])

    float(forward(y))  # compile + warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(forward(y))
        times.append(time.perf_counter() - t0)
    return DURATION_S / min(times)


def _measure_reference_cpu_rtf():
    ref_path = "/root/reference"
    if not os.path.isdir(ref_path):
        return None
    sys.path.insert(0, ref_path)
    try:
        import noisereduce as nr_ref
    except Exception:
        return None
    n = SR * REF_DURATION_S
    rng = np.random.default_rng(0)
    y = rng.standard_normal(n)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        nr_ref.reduce_noise(y=y[: SR * 2], sr=SR)  # warm imports/caches
        t0 = time.perf_counter()
        nr_ref.reduce_noise(y=y, sr=SR, chunk_size=CHUNK, padding=PAD)
        dt = time.perf_counter() - t0
    return REF_DURATION_S / dt


def main():
    rtf = _measure_tpu_rtf()
    ref_rtf = _measure_reference_cpu_rtf()
    vs = rtf / ref_rtf if ref_rtf else rtf / 1000.0  # fall back to north-star
    print(
        json.dumps(
            {
                "metric": "nonstationary reduce_noise RTF @48kHz f32 (chunked)",
                "value": round(rtf, 1),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

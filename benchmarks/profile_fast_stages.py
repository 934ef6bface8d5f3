#!/usr/bin/env python
"""Stage-level on-chip timings for the bf16 FAST path (direct windowed-DFT
merged kernel), bench geometry: 960 s @ 48 kHz, chunk 600k, pad 30k.

Stages (cumulative-graph differences, see profile_fused.py):
  - blocks build (XLA pad + overlapped slices + stack, bf16 rows)
  - merged kernel from prebuilt blocks (+ istft tail slice)
  - full fused chunked path (production dispatch)

Run on the TPU:  python benchmarks/profile_fast_stages.py
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

SR = 48000
DUR = 960
CHUNK = 600000
PAD = 30000
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
    y = jax.device_put(
        jnp.asarray(rng.standard_normal((1, n)), jnp.bfloat16), dev
    )

    from noisereduce_tpu.ops.pallas import dispatch as dp
    from noisereduce_tpu.ops.pallas.geometry import (
        _geometry, _merged_halo,
    )

    ngf = cfg.smoothing[0] if cfg.smoothing else 0
    halo = _merged_halo(ngf)
    view = CHUNK + 2 * PAD
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = _geometry(
        scfg, view, halo
    )
    k = (n - 1) // CHUNK + 1
    need = n_blocks * hop
    bpad = scfg.boundary_pad
    print(f"chunks={k} t_pad={t_pad} n_tiles={n_tiles} hop={hop} r={r}")

    # ---- blocks build (bf16 rows, raw — boundary applied in-kernel) -----
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

    t_blocks = timeit(jax.jit(lambda a: _checksum(build_blocks(a).astype(jnp.float32))), y)
    print(f"blocks build (+f32 cast for sum): {t_blocks*1e3:8.2f} ms")

    blocks = jax.device_put(jax.jit(build_blocks)(y), dev)
    boundary = (bpad, view)

    def from_blocks(b):
        out = dp._merged_gate_from_blocks(
            b, cfg, view, False, None,
            out_slice=(PAD, CHUNK), fast=True, boundary=boundary,
        )
        return _checksum(out.astype(jnp.float32))

    t_fromblk = timeit(jax.jit(from_blocks), blocks)
    print(f"merged kernel from blocks:        {t_fromblk*1e3:8.2f} ms")

    full = jax.jit(
        lambda a: _checksum(
            _run_nonstationary(a, cfg, CHUNK, PAD, "matmul", use_pallas="auto")
        )
    )
    t_full = timeit(full, y)
    print(f"full fused (bf16):                {t_full*1e3:8.2f} ms  "
          f"({DUR/t_full:,.0f} RTF)")

    # empty-launch overhead for reference
    tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
    t_launch = timeit(jax.jit(lambda x: jnp.sum(x) + 1.0), tiny)
    print(f"launch overhead:                  {t_launch*1e3:8.2f} ms")
    print(f"=> on-chip full ~{(t_full-t_launch)*1e3:.1f} ms; kernel "
          f"~{(t_fromblk-t_launch)*1e3:.1f} ms; blocks "
          f"~{(t_blocks-t_launch)*1e3:.1f} ms")


if __name__ == "__main__":
    main()

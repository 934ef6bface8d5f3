#!/usr/bin/env python
"""Stage-level on-chip timings for the FUSED (production) pipeline, plus a
launch-overlap probe for the remote-execution tunnel.

Stages timed (bench geometry: 960 s @ 48 kHz, chunk 600k, pad 30k):
  - blocks build (XLA gather/pad from the padded signal)
  - kernel AM  (spectra + IIR floor + sigmoid + time smoothing)
  - + banded matmul (frequency smoothing + blend)
  - + kernel B (mask apply + inverse DFT + OLA)
  - full fused chunked path (production dispatch)

Each stage is timed with an in-graph scalar checksum; the difference between
cumulative graphs isolates one stage (XLA cannot fuse across pallas_call
boundaries, so cumulative differences are honest).

The overlap probe times K back-to-back full-pipeline dispatches synced once
at the end vs K synchronous calls: if the tunnel pipelines host launches
against device compute, the per-call launch cost (~31 ms here) amortizes —
that difference is what a production serving loop would see.

Run on the TPU:  python benchmarks/profile_fused.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from noisereduce_tpu.config import GateConfig
from noisereduce_tpu.api import _run_nonstationary

SR = 48000
DUR = 960
CHUNK = 600000
PAD = 30000
REPS = 5


def timeit(fn, *args):
    float(fn(*args))  # compile + warm
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
    y = jax.device_put(
        jnp.asarray(rng.standard_normal((1, n)), jnp.float32), jax.devices()[0]
    )

    from noisereduce_tpu.ops import pallas_pipeline as pp

    view = CHUNK + 2 * PAD
    geom = pp._geometry(scfg, view)
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = geom
    k = (n - 1) // CHUNK + 1
    print(f"chunks={k} view={view} frames={n_frames} t_pad={t_pad} "
          f"hop={hop} r={r} n_tiles={n_tiles}")

    # ---- stage graphs (cumulative prefixes of _fused_chunked_impl) --------
    def build_blocks(y2d):
        ch = y2d.shape[0]
        need = n_blocks * hop
        bpad = scfg.boundary_pad
        left = PAD + bpad
        right = max(0, (k - 1) * CHUNK + need - n - left)
        ypad = jnp.pad(y2d.astype(jnp.float32), [(0, 0), (left, right)])
        parts = [
            jax.lax.dynamic_slice_in_dim(ypad, i * CHUNK, need, axis=-1)
            for i in range(k)
        ]
        ext_sig = jnp.stack(parts, axis=1)
        pos = jnp.arange(need, dtype=jnp.int32)
        ext_sig = jnp.where((pos >= bpad) & (pos < bpad + view), ext_sig, 0.0)
        blocks = ext_sig.reshape(ch * k, n_blocks, hop)
        return jnp.pad(blocks, [(0, 0), (0, nb_pad - n_blocks), (0, 0)])

    t_blocks = timeit(jax.jit(lambda a: jnp.sum(build_blocks(a))), y)
    print(f"blocks build:     {t_blocks*1e3:8.2f} ms")

    blocks = jax.jit(build_blocks)(y)
    blocks = jax.device_put(blocks, jax.devices()[0])

    # full from blocks (kernel AM + banded + kernel B + envelope)
    t_fromblk = timeit(
        jax.jit(
            lambda b: jnp.sum(
                pp._fused_gate_from_blocks(b, cfg, view, False, None)
            )
        ),
        blocks,
    )
    print(f"gate from blocks: {t_fromblk*1e3:8.2f} ms")

    # production path end to end
    full = jax.jit(
        lambda a: jnp.sum(
            _run_nonstationary(a, cfg, CHUNK, PAD, "matmul", use_pallas="auto")
        )
    )
    t_full = timeit(full, y)
    print(f"full fused:       {t_full*1e3:8.2f} ms  ({DUR/t_full:,.0f} RTF)")

    # ---- launch-overlap probe ---------------------------------------------
    for K in (2, 4):
        # synchronous: K sequential round-trips
        t0 = time.perf_counter()
        for _ in range(K):
            float(full(y))
        t_sync = time.perf_counter() - t0
        # pipelined: dispatch K, sync once
        t0 = time.perf_counter()
        outs = [full(y) for _ in range(K)]
        for o in outs:
            float(o)
        t_pipe = time.perf_counter() - t0
        print(f"K={K}: sync {t_sync*1e3:7.1f} ms ({K*DUR/t_sync:,.0f} RTF)  "
              f"pipelined {t_pipe*1e3:7.1f} ms ({K*DUR/t_pipe:,.0f} RTF)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-4 training-step measurement: fused primal + DEFAULT-precision
staged cotangent (ops.precision.cotangent_precision), after the kernel
block-loop unroll. Compare against profile_r4.py E rows."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nr_tpu_jax_cache")
import jax.numpy as jnp

from noisereduce_tpu.models.tpu_gate import TPUGate

REPS = 6


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
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev,
          "cotangent prec:", os.environ.get("NRTPU_COTANGENT_PRECISION",
                                            "default"), flush=True)

    tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
    t_launch = timeit(jax.jit(lambda x: jnp.sum(x) + 1.0), tiny, reps=10)
    p("A  launch overhead (empty jit)", t_launch)

    g2 = TPUGate(sr=16000, nonstationary=True)
    xb = jax.device_put(
        jnp.asarray(rng.standard_normal((256, 16000 * 4)), jnp.float32), dev
    )

    def loss_fn(xx):
        return jnp.mean(g2(xx) ** 2)

    def train_step(x):
        loss, grads = jax.value_and_grad(loss_fn)(x)
        return loss + jnp.sum(grads)

    audio_s = 256 * 4
    t_fwd = timeit(jax.jit(loss_fn), xb)
    p("E2 train fwd only (fused primal)", t_fwd,
      f"(on-chip ~{(t_fwd - t_launch) * 1e3:.1f} ms)")
    t_step = timeit(jax.jit(train_step), xb)
    p("E1 train step b256 (fwd+bwd)", t_step,
      f"({audio_s / t_step:,.0f} RTF; bwd residue "
      f"~{(t_step - t_fwd) * 1e3:.1f} ms)")

    # gradient sanity: finite, nonzero, and close to the HIGH-precision
    # cotangent on a small batch
    xs = xb[:8]
    g_def = np.asarray(jax.jit(jax.grad(loss_fn))(xs))
    os.environ["NRTPU_COTANGENT_PRECISION"] = "high"
    g_hi = np.asarray(jax.jit(jax.grad(loss_fn))(xs))
    del os.environ["NRTPU_COTANGENT_PRECISION"]
    rel = np.max(np.abs(g_def - g_hi)) / max(np.max(np.abs(g_hi)), 1e-30)
    print(f"grad dev DEFAULT vs HIGH cotangent: {rel:.3e}", flush=True)
    print("done.", flush=True)


if __name__ == "__main__":
    main()

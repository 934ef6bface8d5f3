"""Convergence-neutrality of the bf16 cotangent default (VERDICT r4 #1c).

Trains the examples/tpugate_training.py workload — a learnable FIR
front-end optimized THROUGH the differentiable gate — twice on the current
default device: once under the default ``NRTPU_COTANGENT_PRECISION=bf16``
(staged twin's backward in bf16 arrays + single-pass MXU dots) and once
under ``high`` (uncast, 3-pass dots). The claim the training default makes
is that its ~2e-2 per-step gradient deviation is convergence-neutral: both
runs must reach the same final loss within a small tolerance.

On CPU the modes are bit-identical by construction
(tests/test_cotangent_precision.py), so this experiment is only
informative on TPU. Results are recorded in NOTES.md (round 5).

Run: python benchmarks/exp_convergence_r5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nr_tpu_jax_cache")
import jax.numpy as jnp
import optax

from noisereduce_tpu.models.tpu_gate import TPUGate

SR, N, BATCH, TAPS, STEPS = 8000, 4096, 8, 31, 200


def make_batch(rng, batch=BATCH):
    t = np.arange(N) / SR
    clean = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 220 * t)
    noisy = clean + rng.standard_normal((batch, N)) * 0.4
    return (
        jnp.asarray(noisy, jnp.float32),
        jnp.asarray(np.tile(clean, (batch, 1)), jnp.float32),
    )


def train(mode: str):
    """One full training run with the given cotangent mode baked into the
    traces (the mode is read at trace time; fresh caches force re-trace)."""
    os.environ["NRTPU_COTANGENT_PRECISION"] = mode
    jax.clear_caches()
    gate = TPUGate(sr=SR, nonstationary=True)
    rng = np.random.default_rng(0)  # identical data stream per mode
    params = {"fir": jnp.zeros(TAPS, jnp.float32).at[TAPS // 2].set(1.0)}

    def model(params, x):
        k = params["fir"].reshape(1, 1, TAPS)
        pre = jax.lax.conv_general_dilated(
            x[:, None, :], k, (1,), [(TAPS // 2, TAPS // 2)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )[:, 0, :]
        return gate(pre)

    def loss_fn(params, x, target):
        est = model(params, x)
        return jnp.mean((est - target[:, : est.shape[-1]]) ** 2)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, target)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    losses = []
    for i in range(STEPS):
        xb, tb = make_batch(rng)
        params, opt_state, loss = step(params, opt_state, xb, tb)
        losses.append(float(loss))
    dt = time.perf_counter() - t0
    # final quality on a held-out batch (fresh seed)
    xv, tv = make_batch(np.random.default_rng(123))
    final = float(loss_fn(params, xv, tv))
    return {
        "mode": mode,
        "final_train_loss": losses[-1],
        "mean_last10": float(np.mean(losses[-10:])),
        "heldout_loss": final,
        "wall_s": dt,
        "fir": np.asarray(params["fir"]),
    }


def main():
    print(f"device: {jax.devices()[0]}")
    rb = train("bf16")
    rh = train("high")
    for r in (rb, rh):
        print(
            f"mode={r['mode']:5s} final={r['final_train_loss']:.6f} "
            f"last10={r['mean_last10']:.6f} heldout={r['heldout_loss']:.6f} "
            f"wall={r['wall_s']:.1f}s"
        )
    rel = abs(rb["heldout_loss"] - rh["heldout_loss"]) / max(
        rh["heldout_loss"], 1e-12
    )
    fir_dev = float(
        np.abs(rb["fir"] - rh["fir"]).max() / max(np.abs(rh["fir"]).max(), 1e-12)
    )
    print(f"heldout-loss rel delta: {rel:.4f}; trained-FIR max-rel dev: {fir_dev:.4f}")
    # convergence-neutral = same heldout loss within 2%
    verdict = "NEUTRAL" if rel < 0.02 else "NOT NEUTRAL"
    print(f"verdict: {verdict} (threshold 2%)")


if __name__ == "__main__":
    main()

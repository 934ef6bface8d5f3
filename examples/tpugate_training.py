#!/usr/bin/env python
"""TPUGate inside a training loop — the notebook-3.0 walkthrough, TPU-native.

The reference ships ``notebooks/3.0-torchgate-as-nn-module.ipynb``: TorchGate
used as an ``nn.Module`` on batched audio. That module is wrapped in
``@torch.no_grad()`` — it can sit in a model but gradients stop at it. Our
``TPUGate`` is fully differentiable, so the gate can live INSIDE the trained
graph: here a tiny learned pre-filter is optimized *through* the gate's
STFT → mask → ISTFT pipeline with optax, something the reference cannot do.

Run:  python examples/tpugate_training.py        (CPU ok; TPU if available)

Walkthrough structure:
  1. build a batch of noisy sine mixtures (the notebook's toy workload)
  2. denoise once with the gate alone — the zero-shot baseline
  3. put a learnable FIR pre-filter in front of the gate and train it to
     minimize reconstruction error against the clean targets
  4. show the trained front-end beats the zero-shot gate
"""
import os
import sys

# runnable as a script from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS even when a sitecustomize pre-registered another
# platform (plugin registration can override the env var contract).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import jax
import jax.numpy as jnp
import optax

from noisereduce_tpu.models.tpu_gate import TPUGate

SR = 8000
N = 4096          # 0.5 s clips
BATCH = 8
TAPS = 31         # learnable FIR length
STEPS = 200


def make_batch(rng, batch=BATCH):
    """Noisy two-tone mixtures, like the reference notebook's toy signals."""
    t = np.arange(N) / SR
    clean = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 220 * t)
    noisy = clean + rng.standard_normal((batch, N)) * 0.4
    return (
        jnp.asarray(noisy, jnp.float32),
        jnp.asarray(np.tile(clean, (batch, 1)), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    x, target = make_batch(rng)

    # --- 1. the gate as a drop-in module (TorchGate equivalent) ----------
    # (batch, samples) in -> (batch, samples') out, jit/vmap/grad-friendly.
    gate = TPUGate(sr=SR, nonstationary=True)
    zero_shot = gate(x)
    L = zero_shot.shape[-1]  # torch istft convention: (n_frames-1)*hop

    def snr_db(est):
        err = est - target[:, :L]
        return 10 * jnp.log10(
            jnp.sum(target[:, :L] ** 2) / jnp.sum(err**2)
        )

    print(f"zero-shot gate SNR: {snr_db(zero_shot):.2f} dB")

    # --- 2. a learnable front-end trained THROUGH the gate ---------------
    # params: FIR taps initialized to identity (delta).
    params = {"fir": jnp.zeros(TAPS, jnp.float32).at[TAPS // 2].set(1.0)}

    def model(params, x):
        # 'same' FIR pre-filter, then the differentiable gate
        k = params["fir"].reshape(1, 1, TAPS)
        xb = x[:, None, :]
        pre = jax.lax.conv_general_dilated(
            xb, k, (1,), [(TAPS // 2, TAPS // 2)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )[:, 0, :]
        return gate(pre)

    def loss_fn(params, x, target):
        est = model(params, x)
        return jnp.mean((est - target[:, : est.shape[-1]]) ** 2)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, target)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for step in range(STEPS):
        xb, tb = make_batch(rng)
        params, opt_state, loss = train_step(params, opt_state, xb, tb)
        if step % 50 == 0 or step == STEPS - 1:
            print(f"step {step:4d}  loss {float(loss):.5f}")

    trained = model(params, x)
    print(f"trained front-end SNR: {snr_db(trained):.2f} dB "
          f"(zero-shot {snr_db(zero_shot):.2f} dB)")


if __name__ == "__main__":
    main()

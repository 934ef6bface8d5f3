"""Differentiability of TPUGate — the feature the reference's no_grad
TorchGate lacks — plus the notebook-3.0 training-loop workload
(BASELINE.json config #5)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from noisereduce_tpu.models.tpu_gate import TPUGate
from noisereduce_tpu.models.spectral_gate import gate_nonstationary
from noisereduce_tpu.config import GateConfig

RNG = np.random.default_rng(9)
SR = 8000
N = 4096


def _batch(b=2):
    t = np.arange(N) / SR
    clean = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 220 * t)
    noisy = clean + RNG.standard_normal((b, N)) * 0.3
    return jnp.asarray(noisy), jnp.asarray(np.tile(clean, (b, 1)))


def test_gate_is_differentiable():
    gate = TPUGate(sr=SR, nonstationary=True)
    x, _ = _batch()

    def loss(x):
        return jnp.mean(gate(x) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_gate_jit_vmap_compose():
    gate = TPUGate(sr=SR, nonstationary=True)
    x, _ = _batch(4)
    direct = gate(x)
    jitted = jax.jit(lambda a: gate(a))(x)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(jitted), atol=1e-10)


def test_functional_gate_gradient():
    cfg = GateConfig(sr=SR, n_fft=512)
    x = jnp.asarray(RNG.standard_normal(N))

    def loss(x):
        return jnp.mean(gate_nonstationary(x, cfg) ** 2)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_training_loop_with_gate_in_graph():
    """Notebook-3.0 workload: a tiny denoising model trained THROUGH the
    gate — gradients must flow through STFT/mask/ISTFT into the params."""
    gate = TPUGate(sr=SR, nonstationary=True, freq_mask_smooth_hz=None,
                   time_mask_smooth_ms=None)
    noisy, clean = _batch()

    params = {"scale": jnp.ones(()), "bias": jnp.zeros(())}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pre = noisy * p["scale"] + p["bias"]
            den = gate(pre)
            m = min(den.shape[-1], clean.shape[-1])
            return jnp.mean((den[..., :m] - clean[..., :m]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # optimizer makes progress through the gate


def test_gate_input_validation():
    gate = TPUGate(sr=SR)
    with pytest.raises(ValueError):
        gate(jnp.zeros((N,)))  # 1-D rejected (torchgate.py:214)
    with pytest.raises(ValueError):
        gate(jnp.zeros((1, 100)))  # too short (torchgate.py:215-216)
    with pytest.raises(ValueError):
        TPUGate(sr=SR, prop_decrease=1.5)

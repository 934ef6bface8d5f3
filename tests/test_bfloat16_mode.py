"""Opt-in bfloat16 fast mode: accuracy envelope pinned vs float32.

``compute_dtype=jnp.bfloat16`` keeps the HBM-heavy arrays (frames,
spectrogram re/im, ISTFT) half-width while the mask-decision math (dB
statistics, threshold compares, IIR floor, sigmoid) upcasts to float32
(models/spectral_gate._mask_dtype). The envelope below is the *measured*
behavior on white noise — the worst case for the stationary binary gate,
where spectrogram quantization flips near-threshold bins; the default
soft-sigmoid non-stationary gate sits at ≈−45 dB error.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import noisereduce_tpu as nr
from noisereduce_tpu.models.tpu_gate import TPUGate

SR = 48000
RNG = np.random.default_rng(0)
Y = RNG.standard_normal(SR * 4).astype(np.float32)


def _rel_devs(a, b):
    a64, b64 = a.astype(np.float64), b.astype(np.float64)
    d = a64 - b64
    rel_max = np.max(np.abs(d)) / np.max(np.abs(a64))
    rel_rms = np.sqrt(np.mean(d**2)) / np.sqrt(np.mean(a64**2))
    return rel_max, rel_rms


@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_nonstationary_bf16_envelope(method):
    f32 = nr.reduce_noise(y=Y, sr=SR, compute_dtype=np.float32, method=method)
    b16 = nr.reduce_noise(y=Y, sr=SR, compute_dtype=jnp.bfloat16, method=method)
    assert b16.dtype == np.float32  # output restores the input dtype
    rel_max, rel_rms = _rel_devs(f32, b16)
    assert rel_max <= 2.5e-2, rel_max
    assert rel_rms <= 1.2e-2, rel_rms  # ≈ -45 dB measured


def test_stationary_bf16_envelope():
    f32 = nr.reduce_noise(y=Y, sr=SR, stationary=True,
                          compute_dtype=np.float32, method="matmul")
    b16 = nr.reduce_noise(y=Y, sr=SR, stationary=True,
                          compute_dtype=jnp.bfloat16, method="matmul")
    rel_max, rel_rms = _rel_devs(f32, b16)
    # binary-mask bin flips near threshold dominate; white noise is the
    # worst case (every bin sits at the threshold)
    assert rel_max <= 1.5e-1, rel_max
    assert rel_rms <= 1.0e-1, rel_rms


def test_stationary_bf16_warns():
    """The -25 dB stationary bf16 envelope must not be silent (VERDICT r2)."""
    with pytest.warns(UserWarning, match="bfloat16.*stationary"):
        nr.reduce_noise(y=Y[: SR // 2], sr=SR, stationary=True,
                        compute_dtype=jnp.bfloat16, method="matmul")


def test_nonstationary_bf16_does_not_warn():
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        nr.reduce_noise(y=Y[: SR // 2], sr=SR,
                        compute_dtype=jnp.bfloat16, method="matmul")


def test_torch_path_bf16_runs_and_bounded():
    f32 = nr.reduce_noise(y=Y, sr=SR, use_torch=True,
                          compute_dtype=np.float32, method="matmul")
    b16 = nr.reduce_noise(y=Y, sr=SR, use_torch=True,
                          compute_dtype=jnp.bfloat16, method="matmul")
    rel_max, _ = _rel_devs(f32, b16)
    assert rel_max <= 5e-2, rel_max


def test_tpugate_module_accepts_bf16():
    gate = TPUGate(sr=8000, nonstationary=True, n_fft=256)
    x = jnp.asarray(RNG.standard_normal((2, 8000)), dtype=jnp.bfloat16)
    out = gate(x, method="matmul")
    assert out.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))


def test_bf16_chunked_matches_unchunked_envelope():
    """Chunking must not amplify bf16 error."""
    f32 = nr.reduce_noise(y=Y, sr=SR, compute_dtype=np.float32,
                          chunk_size=50000, padding=5000, method="matmul")
    b16 = nr.reduce_noise(y=Y, sr=SR, compute_dtype=jnp.bfloat16,
                          chunk_size=50000, padding=5000, method="matmul")
    rel_max, rel_rms = _rel_devs(f32, b16)
    assert rel_max <= 2.5e-2, rel_max
    assert rel_rms <= 1.2e-2, rel_rms

"""Banded-MXU-matmul lowering of the mask-smoothing / moving-average convs.

On TPU the small 'same' convolutions in the staged engines lower to dense
banded matmuls (ops/dsp.py `_band_matrix_np`): XLA's TPU conv converts f32
convs to bf16 (measured ~4e-3 rel error on device, NOTES.md round 4) while
the banded matmul runs at the staged HIGH dot precision AND off the layout-
bound conv path. These tests force each lowering via NRTPU_SMOOTH_MM on CPU
and pin that they compute the same sums — values and gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noisereduce_tpu.ops.dsp import (
    _band_matrix_np,
    moving_average_same,
    smooth_mask,
    smooth_mask_2d_torchgate,
)


def _both(monkeypatch, fn):
    monkeypatch.setenv("NRTPU_SMOOTH_MM", "conv")
    a = np.asarray(fn())
    monkeypatch.setenv("NRTPU_SMOOTH_MM", "mm")
    b = np.asarray(fn())
    return a, b


def _rel(a, b):
    return np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-30)


def test_band_matrix_is_the_same_correlation():
    # (B @ x)[i] == sum_k taps[k] * x[i+k-left], zero-padded
    taps = np.asarray([0.2, 0.5, 0.3, 0.1])
    length, left = 11, 1
    b = _band_matrix_np(tuple(taps), length, left)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(length)
    want = np.zeros(length)
    for i in range(length):
        for k, t in enumerate(taps):
            j = i + k - left
            if 0 <= j < length:
                want[i] += t * x[j]
    np.testing.assert_allclose(b @ x, want, rtol=0, atol=1e-14)


@pytest.mark.parametrize("time_major", [False, True])
def test_smooth_mask_mm_matches_conv(monkeypatch, time_major):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 100, 70)), jnp.float64)
    a, b = _both(monkeypatch, lambda: smooth_mask(x, 3, 5, time_major=time_major))
    assert _rel(a, b) < 1e-13


@pytest.mark.parametrize("ngf,ngt", [(16, 9), (4, 6), (1, 3)])
def test_smooth_mask_2d_torchgate_mm_matches_conv(monkeypatch, ngf, ngt):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 80, 60)), jnp.float64)
    a, b = _both(
        monkeypatch,
        lambda: smooth_mask_2d_torchgate(x, ngf, ngt, time_major=True),
    )
    assert _rel(a, b) < 1e-13


@pytest.mark.parametrize("axis,n", [(-1, 7), (-1, 20), (-2, 20), (-2, 4)])
def test_moving_average_mm_matches_conv(monkeypatch, axis, n):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 40)), jnp.float64)
    a, b = _both(monkeypatch, lambda: moving_average_same(x, n, axis=axis))
    assert _rel(a, b) < 1e-13


def test_smooth_mask_mm_gradients_match_conv(monkeypatch):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((40, 30)), jnp.float64)

    def loss(fn):
        return lambda z: jnp.sum(fn(z) ** 2)

    a, b = _both(
        monkeypatch,
        lambda: jax.grad(loss(lambda z: smooth_mask_2d_torchgate(z, 3, 4)))(x),
    )
    assert _rel(a, b) < 1e-13
    a, b = _both(
        monkeypatch,
        lambda: jax.grad(loss(lambda z: moving_average_same(z, 9, axis=-2)))(x),
    )
    assert _rel(a, b) < 1e-13


def test_mm_auto_gates_on_axis_length(monkeypatch):
    # the O(L^2) band is gated on axis length: a >4096 axis keeps the conv
    # lowering even on TPU (auto), while forcing mm always takes the band —
    # the gate is purely a performance choice.
    import noisereduce_tpu.models.spectral_gate as sg
    from noisereduce_tpu.ops.dsp import _BAND_MM_MAX_LEN, _band_mm_enabled

    monkeypatch.setattr(sg, "_tpu_available", lambda: True)
    monkeypatch.setenv("NRTPU_SMOOTH_MM", "auto")
    assert _band_mm_enabled(_BAND_MM_MAX_LEN)
    assert not _band_mm_enabled(_BAND_MM_MAX_LEN + 1)
    monkeypatch.setenv("NRTPU_SMOOTH_MM", "mm")
    assert _band_mm_enabled(10**6)


def test_mm_env_validation(monkeypatch):
    from noisereduce_tpu.ops.dsp import _band_mm_enabled

    monkeypatch.setenv("NRTPU_SMOOTH_MM", "bogus")
    with pytest.raises(ValueError):
        _band_mm_enabled(8)

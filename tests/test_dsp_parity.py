"""Unit parity of DSP kernels vs scipy / numpy / torch reference formulas."""
import numpy as np
import pytest
import scipy.signal

from noisereduce_tpu.config import iir_b_coefficient
from noisereduce_tpu.ops import (
    amp_to_db,
    ewma_filtfilt,
    moving_average_same,
    smooth_mask,
    triangular_vector,
)

RNG = np.random.default_rng(1)


def _ref_amp_to_db(x, top_db=80.0, eps=np.finfo(np.float64).eps):
    x_db = 20 * np.log10(np.abs(x) + eps)
    return np.maximum(x_db, np.max(x_db, axis=-1, keepdims=True) - top_db)


@pytest.mark.parametrize("top_db", [80.0, 40.0])
def test_amp_to_db(top_db):
    x = RNG.standard_normal((5, 257, 100)) * np.exp(RNG.uniform(-20, 5, (5, 257, 100)))
    x[0, 0, :10] = 0.0  # exercise the eps floor on exact zeros
    np.testing.assert_allclose(
        np.asarray(amp_to_db(x, top_db=top_db)), _ref_amp_to_db(x, top_db), atol=1e-12
    )


def test_amp_to_db_complex():
    z = RNG.standard_normal((3, 64)) + 1j * RNG.standard_normal((3, 64))
    np.testing.assert_allclose(
        np.asarray(amp_to_db(z)), _ref_amp_to_db(z), atol=1e-12
    )


def test_triangular_vector_matches_reference_linspace():
    for n in [1, 2, 5, 8]:
        ref = np.concatenate(
            [
                np.linspace(0, 1, n + 1, endpoint=False),
                np.linspace(1, 0, n + 2),
            ]
        )[1:-1]
        np.testing.assert_allclose(triangular_vector(n), ref, atol=1e-15)


def _ref_smoothing_filter(n_grad_freq, n_grad_time):
    f = np.outer(triangular_vector(n_grad_freq), triangular_vector(n_grad_time))
    return f / f.sum()


@pytest.mark.parametrize("ngf,ngt", [(5, 8), (1, 8), (5, 1), (2, 2)])
def test_smooth_mask_matches_fftconvolve(ngf, ngt):
    mask = RNG.uniform(0, 1, (513, 120))
    ref = scipy.signal.fftconvolve(mask, _ref_smoothing_filter(ngf, ngt), mode="same")
    out = np.asarray(smooth_mask(mask, ngf, ngt))
    np.testing.assert_allclose(out, ref, atol=1e-10)


def test_smooth_mask_batched():
    mask = RNG.uniform(0, 1, (2, 3, 129, 77))
    out = np.asarray(smooth_mask(mask, 3, 4))
    for i in range(2):
        for j in range(3):
            ref = scipy.signal.fftconvolve(
                mask[i, j], _ref_smoothing_filter(3, 4), mode="same"
            )
            np.testing.assert_allclose(out[i, j], ref, atol=1e-10)


@pytest.mark.parametrize("time_constant_s,sr,hop", [(2.0, 44100, 256), (0.5, 8000, 128)])
def test_ewma_filtfilt_matches_scipy(time_constant_s, sr, hop):
    b = iir_b_coefficient(time_constant_s, sr, hop)
    x = np.abs(RNG.standard_normal((513, 300))) + 0.01
    ref = scipy.signal.filtfilt([b], [1, b - 1], x, axis=-1, padtype=None)
    out = np.asarray(ewma_filtfilt(x, b))
    np.testing.assert_allclose(out, ref, atol=1e-10, rtol=1e-10)


@pytest.mark.parametrize("n", [20, 344, 7, 1])
def test_moving_average_matches_torch_conv1d_same(n):
    torch = pytest.importorskip("torch")
    x = RNG.standard_normal((6, 500))
    ref = (
        torch.nn.functional.conv1d(
            torch.from_numpy(x).reshape(-1, 1, 500),
            torch.ones(n, dtype=torch.float64).view(1, 1, -1),
            padding="same",
        )
        .view(6, 500)
        .numpy()
        / n
    )
    out = np.asarray(moving_average_same(x, n))
    np.testing.assert_allclose(out, ref, atol=1e-10)

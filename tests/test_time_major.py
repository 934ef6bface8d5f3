"""Time-major layout equivalence (the internal pipeline layout)."""
import numpy as np
import jax.numpy as jnp
import pytest

from noisereduce_tpu.config import StftConfig, Convention, iir_b_coefficient
from noisereduce_tpu.ops import stft, istft, smooth_mask, ewma_filtfilt, amp_to_db

RNG = np.random.default_rng(31)


@pytest.mark.parametrize("conv", [Convention.SCIPY, Convention.TORCH])
def test_stft_time_major_is_transpose(conv):
    cfg = StftConfig(n_fft=512, convention=conv)
    x = RNG.standard_normal((2, 6000))
    fm = np.asarray(stft(x, cfg))
    tm = np.asarray(stft(x, cfg, time_major=True))
    np.testing.assert_array_equal(np.swapaxes(tm, -1, -2), fm)


def test_istft_time_major_matches():
    cfg = StftConfig(n_fft=512)
    x = RNG.standard_normal(6000)
    Z = stft(x, cfg)
    a = np.asarray(istft(Z, cfg))
    b = np.asarray(istft(jnp.swapaxes(Z, -1, -2), cfg, time_major=True))
    np.testing.assert_array_equal(a, b)


def test_smooth_mask_time_major():
    mask = RNG.uniform(0, 1, (3, 77, 129))  # (batch, time, freq)
    tm = np.asarray(smooth_mask(jnp.asarray(mask), 5, 8, time_major=True))
    fm = np.asarray(
        smooth_mask(jnp.asarray(np.swapaxes(mask, -1, -2)), 5, 8)
    )
    np.testing.assert_allclose(np.swapaxes(tm, -1, -2), fm, atol=1e-12)


def test_ewma_filtfilt_axis_minus2():
    b = iir_b_coefficient(2.0, 44100, 256)
    x = np.abs(RNG.standard_normal((4, 300, 65))) + 0.01  # (batch, T, F)
    tm = np.asarray(ewma_filtfilt(jnp.asarray(x), b, axis=-2))
    fm = np.asarray(ewma_filtfilt(jnp.asarray(np.swapaxes(x, -1, -2)), b))
    np.testing.assert_allclose(np.swapaxes(tm, -1, -2), fm, atol=1e-12)


def test_amp_to_db_axis():
    x = RNG.standard_normal((5, 40, 30))
    a = np.asarray(amp_to_db(jnp.asarray(x), axis=-2))
    b = np.asarray(amp_to_db(jnp.asarray(np.swapaxes(x, -1, -2))))
    np.testing.assert_array_equal(np.swapaxes(a, -1, -2), b)

"""Error-path parity with the reference's constructor validations."""
import numpy as np
import pytest

import noisereduce_tpu as nr

Y = np.random.default_rng(0).standard_normal(8000)


def test_freq_smooth_too_small():
    # reference base.py:105-110: freq_mask_smooth_hz below one bin width
    with pytest.raises(ValueError, match="freq_mask_smooth_hz"):
        nr.reduce_noise(y=Y, sr=44100, freq_mask_smooth_hz=10)


def test_time_smooth_too_small():
    # reference base.py:118-123
    with pytest.raises(ValueError, match="time_mask_smooth_ms"):
        nr.reduce_noise(y=Y, sr=44100, time_mask_smooth_ms=1)


def test_smoothing_none_combo_ok():
    out = nr.reduce_noise(
        y=Y, sr=44100, freq_mask_smooth_hz=None, time_mask_smooth_ms=None
    )
    assert out.shape == Y.shape


def test_freq_none_time_set():
    out = nr.reduce_noise(y=Y, sr=44100, freq_mask_smooth_hz=None)
    assert out.shape == Y.shape

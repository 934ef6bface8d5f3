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


def test_public_signature_is_reference_plus_documented_extras():
    """reduce_noise's signature is exactly the reference's ~20 kwargs
    (noisereduce.py:13-36) plus the documented TPU extras — no private
    plumbing like the former ``_defer`` (VERDICT r4 #6)."""
    import inspect

    params = list(inspect.signature(nr.reduce_noise).parameters)
    reference = [
        "y", "sr", "stationary", "y_noise", "prop_decrease",
        "time_constant_s", "freq_mask_smooth_hz", "time_mask_smooth_ms",
        "thresh_n_mult_nonstationary", "sigmoid_slope_nonstationary",
        "n_std_thresh_stationary", "tmp_folder", "chunk_size", "padding",
        "n_fft", "win_length", "hop_length", "clip_noise_stationary",
        "use_tqdm", "n_jobs", "use_torch", "device",
    ]
    extras = ["compute_dtype", "method", "mesh", "max_parallel_chunks"]
    assert params == reference + extras
    assert not any(p.startswith("_") for p in params)

"""Error-path parity with the reference's constructor validations."""
import jax.numpy as jnp
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


def test_silence_semantics_oracle_vs_fused():
    """Digital silence (all-zero input) is degenerate for the
    non-stationary gate: the reference's ``(|Z| - floor) / floor`` is 0/0
    and its whole output is NaN (verified live: 100% NaN on an 8000-zero
    signal). Two pinned behaviors here:

    - the staged jnp path (the float64 oracle this suite runs) reproduces
      the reference's NaN — degenerate-input parity;
    - the fused production kernels substitute a safe divisor and emit
      FINITE output (all-zero, in fact) — the documented intentional
      divergence (ops/pallas_mask.py's fused_nonstationary_mask docstring;
      silence is a realistic serving input: VAD gaps, padded streams).
    """
    out = nr.reduce_noise(y=np.zeros(8000), sr=22050)
    assert out.shape == (8000,)
    assert np.isnan(out).any()  # oracle == reference on degenerate input

    from noisereduce_tpu.config import GateConfig
    from noisereduce_tpu.ops.pallas.dispatch import (
        _fused_gate_impl,
        fused_gate_supported,
    )

    cfg = GateConfig(sr=48000, stationary=False)
    n = 48000
    assert fused_gate_supported(cfg, n, cfg.smoothing[1] if cfg.smoothing else 0)
    got = np.asarray(
        _fused_gate_impl(jnp.zeros((1, n), jnp.float32), cfg, interpret=True)
    )
    assert np.all(np.isfinite(got))
    assert np.all(got == 0.0)

    # the stationary engine has no 0/0 (binary threshold on dB values):
    # silence stays silent on the staged path too
    out_st = nr.reduce_noise(y=np.zeros(8000), sr=22050, stationary=True)
    assert np.all(out_st == 0.0)


def test_stationary_noise_clip_shorter_than_window():
    """Documented divergence from the reference: a stationary noise clip
    shorter than ``win_length - hop_length + 1`` samples crashes the
    reference inside scipy ("noverlap must be less than nperseg", because
    scipy clamps nperseg to the clip length while noverlap stays
    win_length - hop_length; verified live at n_fft=1024: clips < 769
    samples raise, >= 769 pass). Short clips are legitimate — a user
    hands over whatever noise-only span they have — so here the STFT's
    own zero-padded framing applies and the gate runs."""
    rng = np.random.default_rng(7)
    y = rng.standard_normal(8000)
    for n_clip in (600, 100):
        out = nr.reduce_noise(
            y=y.copy(), sr=22050, stationary=True,
            y_noise=rng.standard_normal(n_clip),
        )
        assert out.shape == y.shape
        assert np.all(np.isfinite(out))

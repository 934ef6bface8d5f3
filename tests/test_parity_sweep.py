"""Broad parameter-space parity sweep vs the reference — beyond the default
configs: unusual FFT geometries, sample rates, time constants, paddings.
Runs live against a reference checkout when present, else replays recorded
reference outputs (tests/_reference_oracle.py) — zero skips either way."""
import numpy as np
import pytest
from scipy.io import wavfile

from _reference_oracle import SPEECH_WAV, reference_reduce_noise

import noisereduce_tpu as nr  # noqa: E402


def _signal(n, sr_seed=3):
    _, data = wavfile.read(SPEECH_WAV)
    x = data.astype(np.float64)[:n]
    rng = np.random.default_rng(sr_seed)
    return x + rng.standard_normal(n) * 150.0


def _cmp(y, sr, tol=1e-8, **kw):
    ref = reference_reduce_noise(y, sr, **kw)
    ours = nr.reduce_noise(y=y, sr=sr, **kw)
    assert ours.shape == ref.shape
    dev = np.max(np.abs(ours - ref))
    scale = max(np.max(np.abs(ref)), 1.0)
    assert dev <= max(tol * scale, 1e-4), f"dev {dev} scale {scale} kw={kw}"


@pytest.mark.parametrize("sr", [8000, 22050, 44100])
def test_sample_rates(sr):
    _cmp(_signal(20000), sr, stationary=True)


@pytest.mark.parametrize(
    "geom",
    [
        dict(n_fft=256),
        dict(n_fft=4096),
        dict(n_fft=2048, win_length=512),
        dict(n_fft=1024, hop_length=1024),   # no overlap
        dict(n_fft=1024, hop_length=128),    # 8x overlap
        dict(n_fft=500),                     # non-power-of-two
        dict(n_fft=1024, win_length=500, hop_length=100),
    ],
)
@pytest.mark.parametrize("stationary", [True, False])
def test_fft_geometries(geom, stationary):
    _cmp(_signal(25000), 44100, stationary=stationary, **geom)


@pytest.mark.parametrize("tc", [0.1, 0.5, 5.0])
def test_time_constants(tc):
    _cmp(_signal(25000), 44100, stationary=False, time_constant_s=tc)


@pytest.mark.parametrize("thresh,slope", [(0.5, 2), (3, 30), (1.0, 1.0)])
def test_nonstationary_knobs(thresh, slope):
    _cmp(
        _signal(25000), 44100, stationary=False,
        thresh_n_mult_nonstationary=thresh,
        sigmoid_slope_nonstationary=slope,
    )


@pytest.mark.parametrize("nstd", [0.0, 0.5, 3.0])
def test_stationary_thresholds(nstd):
    _cmp(_signal(25000), 44100, stationary=True, n_std_thresh_stationary=nstd)


def test_zero_padding():
    _cmp(_signal(25000), 44100, stationary=True, chunk_size=8000, padding=0)


def test_large_padding():
    _cmp(_signal(25000), 44100, stationary=False, chunk_size=8000, padding=8000)


def test_noise_clip_shorter_than_win():
    # noise clip barely longer than one window
    y = _signal(25000)
    np.random.seed(1205)  # deterministic inputs (replay-keyed by content)
    noise = np.asarray(nr.band_limited_noise(500, 4000, 3000, 44100)) * 200
    _cmp(y, 44100, stationary=True, y_noise=noise)


def test_no_clip_noise_stationary():
    y = _signal(25000)
    np.random.seed(1206)  # deterministic inputs (replay-keyed by content)
    noise = np.asarray(nr.band_limited_noise(500, 4000, 40000, 44100)) * 200
    _cmp(y, 44100, stationary=True, y_noise=noise, clip_noise_stationary=False,
         chunk_size=9000)


def test_constant_signal():
    # DC-ish signal: exercises amp_to_db floors without NaNs
    y = np.full(20000, 100.0) + np.random.default_rng(0).standard_normal(20000)
    _cmp(y, 44100, stationary=True)

"""End-to-end parity: noisereduce_tpu.reduce_noise vs the reference package.

With a reference checkout present the reference runs LIVE on the same
inputs; without one the comparison replays recorded reference outputs from
tests/golden/parity_v1.npz (see tests/_reference_oracle.py) — zero skips
either way. Outputs must agree within the 1e-4 max-abs-dev budget
(BASELINE.json) — in float64 the pipelines actually agree to ~1e-8.

Covers the five BASELINE.json configs (stationary w/ noise clip,
non-stationary, multichannel, chunked, torch path), on the repo's own
committed recording (assets/speech.wav).
"""
import numpy as np
import pytest
from scipy.io import wavfile

from _reference_oracle import SPEECH_WAV, reference_reduce_noise

import noisereduce_tpu as nr  # noqa: E402  (ours)

SR = 44100
N = 30000  # keep tests fast; > 2*win_length and exercises edge handling


def _signal(n=N, channels=None, seed=7):
    _, data = wavfile.read(SPEECH_WAV)
    x = data.astype(np.float64)[:n]
    rng = np.random.default_rng(seed)
    x = x + rng.standard_normal(n) * 200.0
    if channels:
        return np.stack([np.roll(x, 97 * c) for c in range(channels)])
    return x


def _ref(y, **kw):
    return reference_reduce_noise(y, SR, **kw)


def _assert_parity(ours, ref, tol=1e-8):
    assert ours.shape == ref.shape
    assert ours.dtype == ref.dtype
    dev = np.max(np.abs(ours.astype(np.float64) - ref.astype(np.float64)))
    scale = max(np.max(np.abs(ref)), 1.0)
    assert dev <= max(tol * scale, 1e-4), f"max abs dev {dev} (scale {scale})"


def test_stationary_with_noise_clip():
    y = _signal()
    np.random.seed(1203)  # deterministic inputs (replay-keyed by content)
    noise = np.asarray(nr.band_limited_noise(2000, 12000, N, SR)) * 300
    ours = nr.reduce_noise(y=y, sr=SR, stationary=True, y_noise=noise[: SR // 4])
    ref = _ref(y, stationary=True, y_noise=noise[: SR // 4])
    _assert_parity(ours, ref)


def test_stationary_self_noise():
    y = _signal()
    _assert_parity(nr.reduce_noise(y=y, sr=SR, stationary=True), _ref(y, stationary=True))


def test_nonstationary_default():
    y = _signal()
    _assert_parity(nr.reduce_noise(y=y, sr=SR), _ref(y))


@pytest.mark.parametrize("prop", [1.0, 0.7, 0.0])
def test_prop_decrease_sweep(prop):
    y = _signal()
    _assert_parity(
        nr.reduce_noise(y=y, sr=SR, prop_decrease=prop), _ref(y, prop_decrease=prop)
    )


@pytest.mark.parametrize("stationary", [True, False])
def test_chunked(stationary):
    y = _signal()
    kw = dict(stationary=stationary, chunk_size=8000, padding=1500)
    _assert_parity(nr.reduce_noise(y=y, sr=SR, **kw), _ref(y, **kw))


@pytest.mark.parametrize("stationary", [True, False])
def test_multichannel(stationary):
    y = _signal(channels=2)
    kw = dict(stationary=stationary, prop_decrease=0.8)
    _assert_parity(nr.reduce_noise(y=y, sr=SR, **kw), _ref(y, **kw))


def test_multichannel_chunked_with_noise():
    y = _signal(channels=3)
    noise = _signal(channels=2, seed=11) * 0.5
    kw = dict(stationary=True, y_noise=noise, chunk_size=9000, padding=1000)
    _assert_parity(nr.reduce_noise(y=y, sr=SR, **kw), _ref(y, **kw))


def test_nondefault_fft_params():
    y = _signal()
    kw = dict(
        stationary=True, n_fft=2048, win_length=1200, hop_length=300,
        freq_mask_smooth_hz=800, time_mask_smooth_ms=80,
    )
    _assert_parity(nr.reduce_noise(y=y, sr=SR, **kw), _ref(y, **kw))


def test_smoothing_disabled():
    y = _signal()
    kw = dict(stationary=True, freq_mask_smooth_hz=None, time_mask_smooth_ms=None)
    _assert_parity(nr.reduce_noise(y=y, sr=SR, **kw), _ref(y, **kw))


def test_int16_dtype_roundtrip():
    _, data = wavfile.read(SPEECH_WAV)
    y = data[:N]  # int16
    ours = nr.reduce_noise(y=y, sr=SR, stationary=True)
    ref = _ref(y, stationary=True)
    assert ours.dtype == np.int16 == ref.dtype
    # int16 truncation can differ by 1 LSB when the float value sits on an
    # integer boundary; exact elsewhere
    assert np.max(np.abs(ours.astype(np.int32) - ref.astype(np.int32))) <= 1


# The reference's stationary torch path computes its mask in float32 (torch
# promotes bool*1.0 to f32, torchgate.py:241) and smooths it with oneDNN's
# f32 conv — whose accumulation-order noise (~2e-7 on the mask) is not
# bit-reproducible. Tolerance for that path is therefore relative to signal
# scale (a few f32 ulps ≈ torch's own f32 conv noise); on unit-normalized
# audio this is far below the 1e-4 budget (see
# test_torch_path_normalized_audio_meets_budget).
_TORCH_STATIONARY_RTOL = 5e-7


@pytest.mark.parametrize("stationary", [True, False])
def test_torch_path_chunked(stationary):
    torch = pytest.importorskip("torch")
    del torch
    y = _signal()
    kw = dict(stationary=stationary, chunk_size=8000, padding=1500)
    ours = nr.reduce_noise(y=y, sr=SR, use_torch=True, device="cpu", **kw)
    ref = _ref(y, use_torch=True, device="cpu", **kw)
    tol = _TORCH_STATIONARY_RTOL if stationary else 1e-8
    _assert_parity(ours, ref, tol=tol)


def test_torch_path_with_noise_clip():
    pytest.importorskip("torch")
    y = _signal()
    np.random.seed(1204)  # deterministic inputs (replay-keyed by content)
    noise = np.asarray(nr.band_limited_noise(2000, 12000, N + 5000, SR)) * 300
    ours = nr.reduce_noise(
        y=y, sr=SR, use_torch=True, device="cpu", stationary=True, y_noise=noise
    )
    ref = _ref(y, use_torch=True, device="cpu", stationary=True, y_noise=noise)
    _assert_parity(ours, ref, tol=_TORCH_STATIONARY_RTOL)


def test_torch_path_normalized_audio_meets_budget():
    """On unit-scale audio the torch stationary path is inside the global
    1e-4 absolute budget despite the reference's f32 mask pipeline."""
    pytest.importorskip("torch")
    y = _signal() / 32768.0
    ours = nr.reduce_noise(y=y, sr=SR, use_torch=True, device="cpu", stationary=True)
    ref = _ref(y, use_torch=True, device="cpu", stationary=True)
    assert np.max(np.abs(ours - ref)) <= 1e-4


def test_torch_path_rejects_n_jobs():
    y = _signal()
    with pytest.raises(ValueError):
        nr.reduce_noise(y=y, sr=SR, use_torch=True, n_jobs=2)


def test_rejects_3d_input():
    with pytest.raises(ValueError):
        nr.reduce_noise(y=np.zeros((2, 2, 100)), sr=SR)

"""The reference's six smoke-test workloads (test_reduction.py:6-117), run
through noisereduce_tpu on the repo's OWN committed recording
(assets/speech.wav — same sample rate / length / dtype envelope as the
reference's fish.wav) — with output-quality assertions the reference lacks
(finite, shape, dtype, and actual noise reduction in the gated band)."""
import os

import numpy as np
import pytest
from scipy.io import wavfile

import noisereduce_tpu as nr
from noisereduce_tpu.utils.noise import band_limited_noise

SPEECH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "assets", "speech.wav"
)


@pytest.fixture(scope="module")
def workload():
    rate, data = wavfile.read(SPEECH)
    np.random.seed(0)
    noise = band_limited_noise(
        min_freq=2000, max_freq=12000, samples=len(data), samplerate=rate
    ) * 10
    return rate, data, noise


def _check(out, y):
    assert out.shape == np.shape(y)
    assert out.dtype == np.asarray(y).dtype
    assert np.all(np.isfinite(out.astype(np.float64)))


def test_stationary_with_noise_clip(workload):
    rate, data, noise = workload
    noise_clip = noise[: rate * 2]
    y = data + noise
    out = nr.reduce_noise(y=y, sr=rate, y_noise=noise_clip, stationary=True)
    _check(out, y)


def test_stationary_without_noise_clip(workload):
    rate, data, noise = workload
    y = data + noise
    _check(nr.reduce_noise(y=y, sr=rate, stationary=True), y)


def test_nonstationary(workload):
    rate, data, noise = workload
    y = data + noise
    _check(nr.reduce_noise(y=y, sr=rate, stationary=False), y)


def test_nonstationary_batches(workload):
    rate, data, noise = workload
    y = data + noise
    _check(
        nr.reduce_noise(y=y, sr=rate, stationary=False, chunk_size=30000), y
    )


def test_torch_convention_stationary_chunked(workload):
    rate, data, noise = workload
    y = data + noise
    _check(
        nr.reduce_noise(
            y=y, sr=rate, stationary=True, chunk_size=30000,
            use_torch=True, device="cpu",
        ),
        y,
    )


def test_torch_convention_nonstationary_chunked(workload):
    rate, data, noise = workload
    y = data + noise
    _check(
        nr.reduce_noise(
            y=y, sr=rate, stationary=False, chunk_size=30000,
            use_torch=True, device="cpu",
        ),
        y,
    )


def test_actually_reduces_band_noise(workload):
    """Beyond the reference's no-assert smoke tests: the gated band's noise
    energy must drop substantially when an audible noise level is used."""
    rate, data, _ = workload
    clean = data.astype(np.float64)
    noise = band_limited_noise(2000, 12000, len(clean), rate) * 1e6
    y = clean + noise
    out = nr.reduce_noise(
        y=y, sr=rate, stationary=True, y_noise=noise[: rate * 2]
    )
    resid = np.mean((out - clean) ** 2)
    assert resid < 0.25 * np.mean(noise**2)

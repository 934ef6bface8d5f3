"""Streaming file pipeline + CLI: must match the in-memory reduce_noise."""
import subprocess
import sys

import numpy as np
import pytest

import noisereduce_tpu as nr
from noisereduce_tpu.streaming import reduce_noise_file
from noisereduce_tpu.utils import io as nrio

SR = 22050
N = 60000


@pytest.fixture
def wav(tmp_path):
    rng = np.random.default_rng(3)
    t = np.arange(N) / SR
    y = (0.4 * np.sin(2 * np.pi * 440 * t) + rng.standard_normal(N) * 0.1).astype(
        np.float32
    )
    p = str(tmp_path / "in.wav")
    nrio.write_wav(p, y, SR, as_float=True)
    return p, y


@pytest.mark.parametrize("stationary", [False, True])
def test_file_matches_in_memory(tmp_path, wav, stationary):
    in_path, y = wav
    out_path = str(tmp_path / "out.wav")
    frames = reduce_noise_file(
        in_path, out_path, stationary=stationary,
        chunk_size=20000, padding=3000, as_float=True,
    )
    assert frames == N
    _, got = nrio.read_wav(out_path, dtype="float32")
    want = nr.reduce_noise(
        y=y, sr=SR, stationary=stationary, chunk_size=20000, padding=3000,
        compute_dtype=np.float32,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_file_with_noise_clip(tmp_path, wav):
    in_path, y = wav
    out_path = str(tmp_path / "out.wav")
    rng = np.random.default_rng(4)
    noise = rng.standard_normal(8000).astype(np.float32) * 0.1
    reduce_noise_file(
        in_path, out_path, stationary=True, y_noise=noise,
        chunk_size=20000, padding=3000, as_float=True,
    )
    _, got = nrio.read_wav(out_path, dtype="float32")
    want = nr.reduce_noise(
        y=y, sr=SR, stationary=True, y_noise=noise,
        chunk_size=20000, padding=3000, compute_dtype=np.float32,
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_cli_end_to_end(tmp_path, wav):
    in_path, _ = wav
    out_path = str(tmp_path / "cli_out.wav")
    proc = subprocess.run(
        [sys.executable, "-m", "noisereduce_tpu", in_path, out_path,
         "--chunk-size", "20000", "--padding", "3000", "--float"],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    assert "real-time" in proc.stderr
    _, got = nrio.read_wav(out_path, dtype="float32")
    assert got.shape == (N,)
    assert np.all(np.isfinite(got))

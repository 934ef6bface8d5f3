"""End-to-end CLI coverage: ``python -m noisereduce_tpu in.wav out.wav``.

The reference has no CLI (SURVEY.md §5); ours drives the streaming file
pipeline. These tests run main() in-process (same interpreter, CPU backend
forced by conftest) and assert the output is a valid denoised WAV whose
content matches the library call it claims to wrap.
"""
import numpy as np
import pytest

from noisereduce_tpu import reduce_noise
from noisereduce_tpu.__main__ import build_parser, main
from noisereduce_tpu.utils import io as nrio

SR = 16000


@pytest.fixture
def noisy_wav(tmp_path):
    rng = np.random.default_rng(7)
    t = np.arange(SR * 2) / SR
    y = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
    p = str(tmp_path / "in.wav")
    nrio.write_wav(p, y, SR, as_float=True)
    return p, y


def test_cli_nonstationary_matches_library(noisy_wav, tmp_path):
    src, y = noisy_wav
    out = str(tmp_path / "out.wav")
    rc = main([src, out, "--quiet", "--float"])
    assert rc == 0
    rate, got = nrio.read_wav(out, dtype="float32")
    assert rate == SR
    # the CLI wraps reduce_noise_file == chunked reduce_noise on this length
    _, y_read = nrio.read_wav(src, dtype="float32")
    want = reduce_noise(y=y_read, sr=SR)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_cli_noise_clip_implies_stationary(noisy_wav, tmp_path, capsys):
    src, y = noisy_wav
    noise_p = str(tmp_path / "noise.wav")
    rng = np.random.default_rng(8)
    nrio.write_wav(noise_p, 0.1 * rng.standard_normal(SR).astype(np.float32),
                   SR, as_float=True)
    out = str(tmp_path / "out.wav")
    rc = main([src, out, "--noise", noise_p, "--float"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "implies --stationary" in err
    assert "x real-time" in err  # the summary line
    _, got = nrio.read_wav(out, dtype="float32")
    _, y_read = nrio.read_wav(src, dtype="float32")
    _, n_read = nrio.read_wav(noise_p, dtype="float32")
    want = reduce_noise(y=y_read, y_noise=n_read, sr=SR, stationary=True)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_cli_pcm16_output_default(noisy_wav, tmp_path):
    src, _ = noisy_wav
    out = str(tmp_path / "out16.wav")
    assert main([src, out, "--quiet"]) == 0
    _, got = nrio.read_wav(out, dtype="int16")
    assert got.dtype == np.int16 and got.size > 0


def test_cli_parser_defaults_match_reference():
    # the reference's reduce_noise defaults (noisereduce.py:13-36) are the
    # CLI defaults too — a CLI user gets reference semantics unasked
    a = build_parser().parse_args(["i.wav", "o.wav"])
    assert (a.prop_decrease, a.time_constant_s) == (1.0, 2.0)
    assert (a.freq_mask_smooth_hz, a.time_mask_smooth_ms) == (500, 50)
    assert (a.chunk_size, a.padding, a.n_fft) == (600000, 30000, 1024)
    assert a.clip_noise_stationary and not a.stationary and not a.use_torch

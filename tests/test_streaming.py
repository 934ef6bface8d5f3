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


def test_file_unclipped_noise_stats_match_in_memory(tmp_path, wav):
    """clip_noise_stationary=False + y_noise=None: the reference computes
    noise statistics over the ENTIRE signal (stationary.py:47-64); the
    streaming path must reproduce that via its two-pass threshold, not the
    first-chunk approximation."""
    in_path, y = wav
    out_path = str(tmp_path / "out.wav")
    reduce_noise_file(
        in_path, out_path, stationary=True, clip_noise_stationary=False,
        chunk_size=20000, padding=3000, as_float=True,
    )
    _, got = nrio.read_wav(out_path, dtype="float32")
    want = nr.reduce_noise(
        y=y, sr=SR, stationary=True, clip_noise_stationary=False,
        chunk_size=20000, padding=3000, compute_dtype=np.float32,
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
    # and it must NOT equal the first-chunk threshold's output (the whole
    # point): re-run with clipping on and check they differ
    out2 = str(tmp_path / "out2.wav")
    reduce_noise_file(
        in_path, out2, stationary=True, clip_noise_stationary=True,
        chunk_size=20000, padding=3000, as_float=True,
    )
    _, got_clip = nrio.read_wav(out2, dtype="float32")
    assert np.max(np.abs(got_clip - got)) > 1e-6


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_streaming_threshold_matches_in_memory(tmp_path, wav, method):
    """The two-pass streamed threshold equals stationary_noise_threshold
    on the full mono mix (f32 reduction-order rounding), on both DFT
    backends."""
    import jax.numpy as jnp

    from noisereduce_tpu.config import Convention, GateConfig
    from noisereduce_tpu.models.spectral_gate import stationary_noise_threshold
    from noisereduce_tpu.streaming import _streaming_noise_threshold

    in_path, y = wav
    cfg = GateConfig(sr=SR, stationary=True, convention=Convention.SCIPY)
    want = np.asarray(
        stationary_noise_threshold(
            jnp.asarray(y, jnp.float32), cfg, method=method
        )
    )
    got = np.asarray(_streaming_noise_threshold(in_path, cfg, method))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_file_stereo_unclipped_stats(tmp_path):
    """Stereo file + whole-recording stats: the streamed threshold must
    collapse channels to the mono mean exactly like the in-memory path."""
    rng = np.random.default_rng(9)
    t = np.arange(N) / SR
    y = np.stack([
        0.4 * np.sin(2 * np.pi * 440 * t) + rng.standard_normal(N) * 0.1,
        0.3 * np.sin(2 * np.pi * 660 * t) + rng.standard_normal(N) * 0.1,
    ]).astype(np.float32)
    in_path = str(tmp_path / "stereo.wav")
    nrio.write_wav(in_path, y.T, SR, as_float=True)
    out_path = str(tmp_path / "stereo_out.wav")
    reduce_noise_file(
        in_path, out_path, stationary=True, clip_noise_stationary=False,
        chunk_size=20000, padding=3000, as_float=True,
    )
    _, got = nrio.read_wav(out_path, dtype="float32")
    want = nr.reduce_noise(
        y=y, sr=SR, stationary=True, clip_noise_stationary=False,
        chunk_size=20000, padding=3000, compute_dtype=np.float32,
    )
    np.testing.assert_allclose(got.T, want, atol=2e-5)


def test_streaming_threshold_many_segments(tmp_path):
    """Segment boundaries (multiple slabs incl. a short tail) are exact."""
    import jax.numpy as jnp

    import noisereduce_tpu.streaming as st
    from noisereduce_tpu.config import Convention, GateConfig
    from noisereduce_tpu.models.spectral_gate import stationary_noise_threshold

    rng = np.random.default_rng(11)
    n = 40000
    y = (rng.standard_normal(n) * 0.2).astype(np.float32)
    p = str(tmp_path / "seg.wav")
    nrio.write_wav(p, y, SR, as_float=True)
    cfg = GateConfig(sr=SR, stationary=True, convention=Convention.SCIPY)
    want = np.asarray(
        stationary_noise_threshold(jnp.asarray(y, jnp.float32), cfg)
    )
    orig = st._THRESH_SEG_FRAMES
    st._THRESH_SEG_FRAMES = 17  # force many slabs + ragged tail
    try:
        got = np.asarray(st._streaming_noise_threshold(p, cfg, "auto"))
    finally:
        st._THRESH_SEG_FRAMES = orig
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


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


def test_cli_no_clip_noise_and_progress(tmp_path, wav):
    in_path, y = wav
    out_path = str(tmp_path / "cli_unclipped.wav")
    proc = subprocess.run(
        [sys.executable, "-m", "noisereduce_tpu", in_path, out_path,
         "--stationary", "--no-clip-noise", "--progress",
         "--chunk-size", "20000", "--padding", "3000", "--float"],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr
    _, got = nrio.read_wav(out_path, dtype="float32")
    want = nr.reduce_noise(
        y=y, sr=SR, stationary=True, clip_noise_stationary=False,
        chunk_size=20000, padding=3000, compute_dtype=np.float32,
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_short_file_matches_in_memory_nonstationary(tmp_path, wav):
    """Files shorter than chunk_size must take the same unchunked fast path
    as reduce_noise (the IIR floor is global over frames, so a zero-extended
    full-chunk view would change the output)."""
    in_path, y = wav
    out_path = str(tmp_path / "short.wav")
    frames = reduce_noise_file(
        in_path, out_path, stationary=False,
        chunk_size=100000, padding=3000, as_float=True,  # N=60000 < chunk
    )
    assert frames == N
    _, got = nrio.read_wav(out_path, dtype="float32")
    want = nr.reduce_noise(
        y=y, sr=SR, stationary=False, chunk_size=100000, padding=3000,
        compute_dtype=np.float32,
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_wav_writer_incremental(tmp_path):
    rng = np.random.default_rng(9)
    y = rng.uniform(-0.8, 0.8, (5000, 2)).astype(np.float32)
    p = str(tmp_path / "w.wav")
    with nrio.WavWriter(p, 22050, 2, 5000, as_float=True) as w:
        for i in range(0, 5000, 1234):
            w.write(y[i : i + 1234])
    rate, back = nrio.read_wav(p)
    assert rate == 22050
    np.testing.assert_array_equal(back, y)


def test_wav_writer_pads_missing_tail(tmp_path):
    p = str(tmp_path / "pad.wav")
    with nrio.WavWriter(p, 8000, 1, 100, as_float=True) as w:
        w.write(np.ones(40, np.float32))
    _, back = nrio.read_wav(p)
    assert back.shape == (100,)
    assert np.all(back[:40] == 1.0) and np.all(back[40:] == 0.0)


def test_stream_chunks_unsupported_format_raises(tmp_path):
    if not nrio.native_available():
        import pytest

        pytest.skip("native lib required")
    from scipy.io import wavfile

    p = str(tmp_path / "i32.wav")
    wavfile.write(p, 8000, np.zeros(50000, dtype=np.int32))
    import pytest

    with pytest.raises(IOError, match="unsupported sample format"):
        list(nrio.stream_chunks(p, 20000, 1000))


def test_read_wav_fallback_scales_int32(tmp_path):
    from scipy.io import wavfile

    p = str(tmp_path / "i32b.wav")
    x = (np.linspace(-1, 1, 1000) * 2**31 * 0.5).astype(np.int32)
    wavfile.write(p, 8000, x)
    real_load = nrio._load
    nrio._lib = None
    try:
        nrio._load = lambda: None
        _, got = nrio.read_wav(p, dtype="float32")
    finally:
        nrio._load = real_load
        nrio._lib = None
    np.testing.assert_allclose(got, x / 2147483648.0, atol=1e-7)
    # native reader agrees
    if nrio.native_available():
        _, got_native = nrio.read_wav(p, dtype="float32")
        np.testing.assert_allclose(got_native, got, atol=1e-7)


# ---------------------------------------------------------------------------
# streamed-file-on-mesh (VERDICT r1 item 4): sharded chunk batches must match
# the single-device stream exactly
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("stationary", [False, True])
def test_file_on_mesh_matches_single_device(tmp_path, wav, stationary):
    import jax
    from noisereduce_tpu.parallel.mesh import chunk_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    in_path, _ = wav
    base_path = str(tmp_path / "base.wav")
    mesh_path = str(tmp_path / "mesh.wav")
    kw = dict(stationary=stationary, chunk_size=9000, padding=1500,
              as_float=True)  # N=60000 -> 7 chunks: uneven tail group
    reduce_noise_file(in_path, base_path, **kw)
    reduce_noise_file(in_path, mesh_path, mesh=chunk_mesh(4), **kw)
    _, base = nrio.read_wav(base_path, dtype="float32")
    _, got = nrio.read_wav(mesh_path, dtype="float32")
    # the single-device stream fuses the int16 feed + core slice into the
    # gate graph (one launch per chunk); the sharded batch graph is
    # compiled separately, so agreement is to f32 fusion-order rounding
    np.testing.assert_allclose(got, base, atol=2e-7)


def test_file_on_mesh_torch_path(tmp_path, wav):
    import jax
    from noisereduce_tpu.parallel.mesh import chunk_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    in_path, _ = wav
    base_path = str(tmp_path / "base_t.wav")
    mesh_path = str(tmp_path / "mesh_t.wav")
    kw = dict(use_torch=True, chunk_size=20000, padding=3000, as_float=True)
    reduce_noise_file(in_path, base_path, **kw)
    reduce_noise_file(in_path, mesh_path, mesh=chunk_mesh(4), **kw)
    _, base = nrio.read_wav(base_path, dtype="float32")
    _, got = nrio.read_wav(mesh_path, dtype="float32")
    np.testing.assert_allclose(got, base, atol=2e-7)  # see comment above


@pytest.mark.parametrize("stationary", [True, False])
def test_file_use_torch_matches_in_memory(tmp_path, wav, stationary):
    in_path, y = wav
    out_path = str(tmp_path / "t.wav")
    reduce_noise_file(
        in_path, out_path, stationary=stationary, use_torch=True,
        chunk_size=20000, padding=3000, as_float=True,
    )
    _, got = nrio.read_wav(out_path, dtype="float32")
    want = nr.reduce_noise(
        y=y, sr=SR, stationary=stationary, use_torch=True,
        chunk_size=20000, padding=3000, compute_dtype=np.float32,
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


# ---------------------------------------------------------------------------
# round 4: int16 device feed + on-device PCM16 quantize
# ---------------------------------------------------------------------------
def test_stream_chunks_int16_feed_bit_identical(tmp_path):
    """PCM16 sources may stream as raw int16 (half the feed bytes); the
    consumer's x * 2^-15 must reproduce the float32 stream bitwise."""
    rng = np.random.default_rng(7)
    y = (rng.standard_normal(50000) * 0.3).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "pcm16.wav")
    nrio.write_wav(p, y, SR)  # PCM16
    f32 = list(nrio.stream_chunks(p, 12000, 2000, dtype="float32"))
    i16 = list(nrio.stream_chunks(p, 12000, 2000, dtype="int16"))
    assert len(f32) == len(i16)
    for (ia, a), (ib, b) in zip(f32, i16):
        assert ia == ib
        assert a.dtype == np.float32
        if b.dtype == np.int16:  # native lib present / PCM16 detected
            conv = b.astype(np.float32) * np.float32(1.0 / 32768.0)
        else:  # fallback already yielded float32
            conv = b
        np.testing.assert_array_equal(conv, a)


def test_stream_chunks_int16_falls_back_for_float_wavs(tmp_path, wav):
    in_path, _ = wav  # written as_float=True -> IEEE float32 source
    got = list(nrio.stream_chunks(in_path, 20000, 3000, dtype="int16"))
    assert all(c.dtype == np.float32 for _, c in got)


def test_pcm16_output_matches_host_quantize(tmp_path, wav):
    """The on-device trunc-after-clip PCM16 quantize must equal the host
    writer's numpy C-cast conversion sample-for-sample."""
    in_path, y = wav
    out16 = str(tmp_path / "o16.wav")
    outf = str(tmp_path / "of.wav")
    kw = dict(chunk_size=20000, padding=3000)
    reduce_noise_file(in_path, out16, **kw)               # PCM16 (device quantize)
    reduce_noise_file(in_path, outf, as_float=True, **kw)  # f32 (host values)
    _, got16 = nrio.read_wav(out16, dtype="int16")
    _, gotf = nrio.read_wav(outf, dtype="float32")
    want16 = np.clip(gotf * 32767.0, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(got16, want16)


def test_writer_accepts_prequantized_int16(tmp_path):
    p = str(tmp_path / "w.wav")
    q = (np.arange(-100, 100, dtype=np.int16))[:, None]
    w = nrio.WavWriter(p, SR, 1, len(q), as_float=False)
    w.write(q)
    w.close()
    _, back = nrio.read_wav(p, dtype="int16")
    np.testing.assert_array_equal(back[:, None] if back.ndim == 1 else back, q)

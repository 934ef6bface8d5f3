"""StreamingGate: block-fed live output must equal offline reduce_noise.

The stateful gate emits each block from the SAME halo'd view the offline
chunked runtime builds (parallel.chunking.extract_chunks), so the
concatenated stream equals ``reduce_noise(y, sr, chunk_size=block_size,
padding=padding)`` up to XLA fusion-order float32 rounding — the envelope
the file-streaming tests already pin (tests/test_streaming.py, atol 2e-6).
"""
import numpy as np
import pytest

import noisereduce_tpu as nr
from noisereduce_tpu.streaming import StreamingGate

RNG = np.random.default_rng(11)
SR = 16000
B, P = 4000, 512


def _offline(y, **kw):
    return nr.reduce_noise(y=y, sr=SR, chunk_size=B, padding=P, **kw)


def _stream(gate, y, feed):
    """Feed ``y`` in pieces of ``feed`` samples; return the whole output."""
    parts = []
    x2d = y if y.ndim == 2 else y[None]
    for s in range(0, x2d.shape[-1], feed):
        piece = x2d[:, s : s + feed]
        parts.append(gate.process(piece if y.ndim == 2 else piece[0]))
    parts.append(gate.flush())
    return np.concatenate(parts, axis=-1)


@pytest.mark.parametrize("feed", [B, 1000, 1719], ids=lambda f: f"feed{f}")
def test_nonstationary_stream_matches_offline(feed):
    y = (0.3 * RNG.standard_normal(3 * B + 700)).astype(np.float32)
    got = _stream(StreamingGate(SR, B, P), y, feed)
    want = _offline(y)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_stationary_self_noise_stream_matches_offline():
    y = (0.3 * RNG.standard_normal(3 * B + 123)).astype(np.float32)
    got = _stream(StreamingGate(SR, B, P, stationary=True), y, B)
    want = _offline(y, stationary=True)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_stationary_noise_clip_stream_matches_offline():
    y = (0.3 * RNG.standard_normal(2 * B + 50)).astype(np.float32)
    clip = (0.1 * RNG.standard_normal(6000)).astype(np.float32)
    got = _stream(StreamingGate(SR, B, P, stationary=True, y_noise=clip),
                  y, 777)
    want = _offline(y, stationary=True, y_noise=clip)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_short_stream_uses_unchunked_view():
    # whole stream fits one block -> flush must reproduce the offline
    # UNCHUNKED ±padding view (the IIR floor spans different frames there)
    y = (0.3 * RNG.standard_normal(B - 300)).astype(np.float32)
    gate = StreamingGate(SR, B, P)
    assert gate.process(y).size == 0
    got = gate.flush()
    np.testing.assert_allclose(got, _offline(y), atol=2e-6)


def test_multichannel_stream():
    y = (0.3 * RNG.standard_normal((2, 2 * B + 10))).astype(np.float32)
    gate = StreamingGate(SR, B, P, channels=2)
    got = _stream(gate, y, 1500)
    want = _offline(y)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_latency_and_emission_schedule():
    gate = StreamingGate(SR, B, P)
    assert gate.latency_samples == B + P
    assert gate.latency_s == (B + P) / SR
    # nothing until block 0's lookahead is complete
    assert gate.process(np.zeros(B + P - 1, np.float32)).size == 0
    out = gate.process(np.zeros(1, np.float32))
    assert out.shape == (B,)  # block 0 exactly at B + P samples
    # then one block per further block_size samples
    assert gate.process(np.zeros(B - 1, np.float32)).size == 0
    assert gate.process(np.zeros(1, np.float32)).shape == (B,)


def test_process_after_flush_raises():
    gate = StreamingGate(SR, B, P)
    gate.process(np.zeros(10, np.float32))
    gate.flush()
    with pytest.raises(RuntimeError, match="flush"):
        gate.process(np.zeros(10, np.float32))
    assert gate.flush().size == 0  # idempotent


def test_full_signal_rejected_modes():
    with pytest.raises(ValueError, match="clip_noise_stationary"):
        StreamingGate(SR, B, P, stationary=True,
                      clip_noise_stationary=False)
    with pytest.raises(ValueError, match="block_size"):
        StreamingGate(SR, 0, P)
    with pytest.raises(ValueError, match="channels"):
        StreamingGate(SR, B, P, channels=0)
    gate = StreamingGate(SR, B, P)  # channels=1 default
    with pytest.raises(ValueError, match="channel"):
        gate.process(np.zeros((2, 100), np.float32))


def test_warmup_compiles_without_state_change():
    gate = StreamingGate(SR, B, P, stationary=True)
    assert gate.warmup() is gate
    assert gate._received() == 0 and gate._emitted == 0
    assert gate._thresh is None  # self-noise stats still from the stream
    y = (0.3 * RNG.standard_normal(2 * B)).astype(np.float32)
    got = _stream(gate, y, B)
    np.testing.assert_allclose(got, _offline(y, stationary=True), atol=2e-6)


def test_bounded_state():
    # the host buffer never holds more than ~2 blocks regardless of stream
    # length (real-time memory contract)
    gate = StreamingGate(SR, B, P)
    y = (0.3 * RNG.standard_normal(20 * B)).astype(np.float32)
    for s in range(0, y.shape[-1], B):
        gate.process(y[s : s + B])
        assert gate._buf.shape[-1] <= 2 * B + 2 * P

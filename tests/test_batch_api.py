"""reduce_noise_batch: grouped single-launch serving == per-signal calls."""
import numpy as np
import pytest

from noisereduce_tpu import reduce_noise, reduce_noise_batch

SR = 16000
RNG = np.random.default_rng(11)


def _signals():
    return [
        RNG.standard_normal(20000).astype(np.float32),
        RNG.standard_normal(20000).astype(np.float32),  # same length: groups
        RNG.standard_normal(12000).astype(np.float32),  # different length
        (RNG.standard_normal(20000) * 8000).astype(np.int16),  # dtype group
    ]


def test_batch_nonstationary_matches_per_signal():
    ys = _signals()
    got = reduce_noise_batch(ys, SR)
    assert len(got) == len(ys)
    for y, g in zip(ys, got):
        want = reduce_noise(y=y, sr=SR)
        assert g.shape == y.shape and g.dtype == y.dtype
        np.testing.assert_allclose(
            np.asarray(g, np.float64), np.asarray(want, np.float64),
            rtol=0, atol=2e-5 * max(np.abs(np.asarray(want, np.float64)).max(), 1),
        )


def test_batch_stationary_shared_clip_matches_per_signal():
    ys = _signals()[:3]
    noise = (0.3 * RNG.standard_normal(8000)).astype(np.float32)
    got = reduce_noise_batch(ys, SR, y_noise=noise, stationary=True)
    for y, g in zip(ys, got):
        want = reduce_noise(y=y, sr=SR, y_noise=noise, stationary=True)
        np.testing.assert_allclose(
            np.asarray(g, np.float64), np.asarray(want, np.float64),
            rtol=0, atol=2e-5 * max(np.abs(np.asarray(want, np.float64)).max(), 1),
        )


def _count_deferred(monkeypatch):
    """Count _reduce_noise_deferred invocations (== device launch groups)."""
    import noisereduce_tpu.api as api

    calls = []
    real = api._reduce_noise_deferred

    def spy(*a, **k):
        calls.append(k)
        return real(*a, **k)

    monkeypatch.setattr(api, "_reduce_noise_deferred", spy)
    return calls


def test_batch_stationary_self_noise_batches_and_is_exact(monkeypatch):
    # self-noise thresholds are per-row (B, bins), computed and consumed in
    # ONE batched launch per (length, dtype) group (VERDICT r4 #3) — and
    # each row's output is EXACTLY the per-signal call's
    calls = _count_deferred(monkeypatch)
    ys = _signals()[:3]  # two length-20000 rows + one length-12000 row
    got = reduce_noise_batch(ys, SR, stationary=True)
    assert len(calls) == 2  # one per (length, dtype) group, not per signal
    assert all(k.get("_noise_rows") is not None for k in calls)
    for y, g in zip(ys, got):
        want = reduce_noise(y=y, sr=SR, stationary=True)
        np.testing.assert_array_equal(g, want)


def test_batch_per_signal_noise_clips(monkeypatch):
    calls = _count_deferred(monkeypatch)
    ys = _signals()[:2]
    clips = [
        (0.2 * RNG.standard_normal(6000)).astype(np.float32),
        (0.4 * RNG.standard_normal(7000)).astype(np.float32),
    ]
    got = reduce_noise_batch(ys, SR, y_noise=clips, stationary=True)
    # clip lengths differ -> two (length, dtype, clip-geometry) groups
    assert len(calls) == 2
    for y, c, g in zip(ys, clips, got):
        want = reduce_noise(y=y, sr=SR, y_noise=c, stationary=True)
        np.testing.assert_array_equal(g, want)


def test_batch_per_signal_equal_clips_single_launch(monkeypatch):
    calls = _count_deferred(monkeypatch)
    ys = _signals()[:2]
    clips = [
        (0.2 * RNG.standard_normal(6000)).astype(np.float32),
        (0.4 * RNG.standard_normal(6000)).astype(np.float32),
    ]
    got = reduce_noise_batch(ys, SR, y_noise=clips, stationary=True)
    assert len(calls) == 1  # equal signal + clip geometry: one group
    for y, c, g in zip(ys, clips, got):
        want = reduce_noise(y=y, sr=SR, y_noise=c, stationary=True)
        np.testing.assert_array_equal(g, want)


def test_batch_per_signal_2d_clips_fall_back(monkeypatch):
    # multichannel clips need a mono collapse -> pipelined per-signal path
    calls = _count_deferred(monkeypatch)
    ys = _signals()[:2]
    clips = [
        (0.2 * RNG.standard_normal((2, 6000))).astype(np.float32),
        (0.4 * RNG.standard_normal((2, 6000))).astype(np.float32),
    ]
    got = reduce_noise_batch(ys, SR, y_noise=clips, stationary=True)
    assert len(calls) == len(ys)
    for y, c, g in zip(ys, clips, got):
        want = reduce_noise(y=y, sr=SR, y_noise=c, stationary=True)
        np.testing.assert_array_equal(g, want)


def test_batch_nonstationary_2d_clips_still_batch(monkeypatch):
    # the non-stationary gate never reads the noise, so per-signal
    # MULTICHANNEL clips must NOT trigger the per-signal fallback — the
    # group stays one batched launch and the clips are dropped
    calls = _count_deferred(monkeypatch)
    ys = _signals()[:2]
    clips = [
        (0.2 * RNG.standard_normal((2, 6000))).astype(np.float32),
        (0.4 * RNG.standard_normal((2, 6000))).astype(np.float32),
    ]
    got = reduce_noise_batch(ys, SR, y_noise=clips, stationary=False)
    assert len(calls) == 1  # one batched launch, not len(ys) fallbacks
    for y, c, g in zip(ys, clips, got):
        want = reduce_noise(y=y, sr=SR, y_noise=c, stationary=False)
        np.testing.assert_array_equal(g, want)


def test_batch_stationary_self_noise_chunked_exact(monkeypatch):
    # chunked geometry: per-row (B, bins) thresholds broadcast across the
    # chunk axis the combinator inserts (models.spectral_gate._align_thresh)
    calls = _count_deferred(monkeypatch)
    ys = _signals()[:2]
    got = reduce_noise_batch(
        ys, SR, stationary=True, chunk_size=8000, padding=1024
    )
    assert len(calls) == 1
    for y, g in zip(ys, got):
        want = reduce_noise(
            y=y, sr=SR, stationary=True, chunk_size=8000, padding=1024
        )
        np.testing.assert_array_equal(g, want)


def test_batch_torch_stationary_self_noise_batches(monkeypatch):
    # TPUGate's stationary statistics are per batch row already
    # (torchgate.py:126-165): self-noise batches in one launch
    calls = _count_deferred(monkeypatch)
    ys = _signals()[:2]
    got = reduce_noise_batch(ys, SR, stationary=True, use_torch=True,
                             device="cpu")
    assert len(calls) == 1
    for y, g in zip(ys, got):
        want = reduce_noise(y=y, sr=SR, stationary=True, use_torch=True,
                            device="cpu")
        np.testing.assert_array_equal(g, want)


def test_batch_torch_per_signal_clips_batch(monkeypatch):
    calls = _count_deferred(monkeypatch)
    ys = _signals()[:2]
    clips = [
        (0.2 * RNG.standard_normal(6000)).astype(np.float32),
        (0.4 * RNG.standard_normal(6000)).astype(np.float32),
    ]
    got = reduce_noise_batch(ys, SR, y_noise=clips, stationary=True,
                             use_torch=True, device="cpu")
    assert len(calls) == 1
    for y, c, g in zip(ys, clips, got):
        want = reduce_noise(y=y, sr=SR, y_noise=c, stationary=True,
                            use_torch=True, device="cpu")
        np.testing.assert_array_equal(g, want)


def test_batch_torch_convention():
    ys = _signals()[:2]
    got = reduce_noise_batch(ys, SR, use_torch=True, device="cpu")
    for y, g in zip(ys, got):
        want = reduce_noise(y=y, sr=SR, use_torch=True, device="cpu")
        np.testing.assert_allclose(
            np.asarray(g, np.float64), np.asarray(want, np.float64),
            rtol=0, atol=2e-5 * max(np.abs(np.asarray(want, np.float64)).max(), 1),
        )


def test_batch_validation():
    with pytest.raises(ValueError, match="mono"):
        reduce_noise_batch([np.zeros((2, 100), np.float32)], SR)
    with pytest.raises(ValueError, match="noise clips"):
        reduce_noise_batch(
            [np.zeros(100, np.float32)], SR,
            y_noise=[np.zeros(50, np.float32)] * 2, stationary=True,
        )
    assert reduce_noise_batch([], SR) == []


def test_batch_order_preserved_across_groups():
    ys = _signals()
    got = reduce_noise_batch(ys, SR)
    # per-index shape/dtype must track the inputs exactly (regression for
    # group-scatter ordering)
    for y, g in zip(ys, got):
        assert g.shape == y.shape and g.dtype == y.dtype

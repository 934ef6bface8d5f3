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


def test_batch_stationary_self_noise_is_per_signal_exact():
    # self-noise statistics are signal-coupled -> per-signal fallback,
    # which must be EXACTLY the per-signal call
    ys = _signals()[:2]
    got = reduce_noise_batch(ys, SR, stationary=True)
    for y, g in zip(ys, got):
        want = reduce_noise(y=y, sr=SR, stationary=True)
        np.testing.assert_array_equal(g, want)


def test_batch_per_signal_noise_clips():
    ys = _signals()[:2]
    clips = [
        (0.2 * RNG.standard_normal(6000)).astype(np.float32),
        (0.4 * RNG.standard_normal(7000)).astype(np.float32),
    ]
    got = reduce_noise_batch(ys, SR, y_noise=clips, stationary=True)
    for y, c, g in zip(ys, clips, got):
        want = reduce_noise(y=y, sr=SR, y_noise=c, stationary=True)
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

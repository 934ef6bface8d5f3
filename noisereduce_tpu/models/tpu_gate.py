"""TPUGate — differentiable spectral-gating module (TorchGate equivalent).

Mirrors the reference's ``TorchGate`` nn.Module (torchgate/torchgate.py:7-264)
with torch STFT conventions, but as a jit/vmap/grad-compatible JAX callable:

* The reference wraps everything except ``forward``'s body in
  ``@torch.no_grad()``; here the whole pipeline is differentiable — gradients
  through the gate are a feature (embed it in training loops, BASELINE.json
  config #5).
* Torch-path quirks preserved: ``amp_to_db`` with top_db=40
  (torchgate/utils.py:6), noise statistics with ddof=1 (``torch.std_mean``
  default, torchgate.py:157), moving-average noise floor (torchgate.py:179-190),
  ``temperature_sigmoid`` (torchgate.py:192-197), prop_decrease blend BEFORE
  conv2d smoothing (torchgate.py:241-249).

The module is a frozen dataclass of static hyper-parameters (registered as a
pytree with no leaves), so it can be closed over or passed through jit
boundaries freely.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from noisereduce_tpu.config import Convention, StftConfig, smoothing_kernel_sizes
from noisereduce_tpu.ops import (
    amp_to_db,
    moving_average_same,
    smooth_mask_2d_torchgate,
    stft,
    istft,
    temperature_sigmoid,
)

__all__ = ["TPUGate", "stationary_mask_torch", "nonstationary_mask_torch"]


def stationary_mask_torch(
    X_db: jax.Array,
    XN_db: Optional[jax.Array],
    n_std_thresh: float,
    time_axis: int = -1,
) -> jax.Array:
    """Binary mask: X_db > per-(batch,freq) noise threshold
    (torchgate.py:126-165). Noise stats use ddof=1 (torch.std default).
    ``time_axis``: which axis holds frames (-1 freq-major, -2 time-major)."""
    ref_db = X_db if XN_db is None else XN_db
    mean = jnp.mean(ref_db, axis=time_axis)
    n = ref_db.shape[time_axis]
    var = jnp.var(ref_db, axis=time_axis) * (n / (n - 1))  # ddof=1 (torch)
    thresh = mean + jnp.sqrt(var) * n_std_thresh
    if time_axis == -1:
        return (X_db > thresh[..., None]).astype(X_db.dtype)
    return (X_db > thresh[..., None, :]).astype(X_db.dtype)


def nonstationary_mask_torch(
    X_abs: jax.Array,
    n_movemean: int,
    n_thresh: float,
    temp_coeff: float,
    time_axis: int = -1,
) -> jax.Array:
    """Moving-average noise floor + temperature sigmoid
    (torchgate.py:167-198)."""
    X_smoothed = moving_average_same(X_abs, n_movemean, axis=time_axis)
    ratio = (X_abs - X_smoothed) / X_smoothed
    return temperature_sigmoid(ratio, n_thresh, temp_coeff)


@dataclasses.dataclass(frozen=True)
class TPUGate:
    """Differentiable spectral gate with torch.stft conventions.

    Drop-in functional equivalent of the reference ``TorchGate``
    (torchgate/torchgate.py:32-46 for the constructor surface). Call with
    ``x`` of shape (batch, signal_length) and optional noise ``xn`` of shape
    (signal_length,) or (batch_n, signal_length).
    """

    sr: int
    nonstationary: bool = False
    n_std_thresh_stationary: float = 1.5
    n_thresh_nonstationary: float = 1.3
    temp_coeff_nonstationary: float = 0.1
    n_movemean_nonstationary: int = 20
    prop_decrease: float = 1.0
    n_fft: int = 1024
    win_length: Optional[int] = None
    hop_length: Optional[int] = None
    freq_mask_smooth_hz: Optional[float] = 500
    time_mask_smooth_ms: Optional[float] = 50

    def __post_init__(self):
        if not (0.0 <= self.prop_decrease <= 1.0):
            raise ValueError("prop_decrease must be in [0, 1]")
        if self.win_length is None:
            object.__setattr__(self, "win_length", self.n_fft)
        if self.hop_length is None:
            object.__setattr__(self, "hop_length", self.win_length // 4)
        # validate smoothing geometry eagerly, like the reference constructor
        self.smoothing

    @property
    def stft_config(self) -> StftConfig:
        return StftConfig(
            n_fft=self.n_fft,
            win_length=self.win_length,
            hop_length=self.hop_length,
            convention=Convention.TORCH,
            quantize_window_f32=True,  # torch.hann_window default-f32 parity
        )

    @property
    def smoothing(self):
        return smoothing_kernel_sizes(
            self.sr,
            self.n_fft,
            self.hop_length,
            self.freq_mask_smooth_hz,
            self.time_mask_smooth_ms,
        )

    def __call__(
        self,
        x: jax.Array,
        xn: Optional[jax.Array] = None,
        method: str = "auto",
        use_pallas: object = "auto",
    ) -> jax.Array:
        """Denoise (batch, signal_length) -> same shape
        (torchgate.py:200-264).

        On TPU with supported geometry the whole gate runs as fused Pallas
        kernels (ops/pallas.fused_tpugate) — including as the primal under
        ``jax.grad`` (training forward == serving forward); the staged jnp
        body below is the CPU/parity path and supplies the cotangent.
        """
        if x.ndim != 2:
            raise ValueError("x must have shape (batch, signal_length)")
        if x.shape[-1] < self.win_length * 2:
            raise ValueError(f"x must be bigger than {self.win_length * 2}")
        if xn is not None:
            if xn.ndim not in (1, 2):
                raise ValueError("xn must be 1-D or 2-D")
            if xn.shape[-1] < self.win_length * 2:
                raise ValueError(f"xn must be bigger than {self.win_length * 2}")

        if use_pallas is not False and x.dtype in (jnp.float32, jnp.bfloat16):
            from noisereduce_tpu.models.spectral_gate import _tpu_available
            from noisereduce_tpu.ops.pallas_pipeline import (
                fused_tpugate,
                fused_tpugate_supported,
            )

            wanted = use_pallas is True or (
                use_pallas == "auto" and _tpu_available()
            )
            xn_len = None if xn is None else xn.shape[-1]
            # torch broadcast semantics: the noise-clip batch must be 1 or
            # match the signal batch — otherwise fall through to the jnp
            # path, which raises the reference's broadcast error (the fused
            # threshold BlockSpec would silently clamp to the last clip)
            xn_b = None if xn is None else (
                xn.shape[0] if xn.ndim == 2 else 1
            )
            compatible = xn_b is None or xn_b in (1, x.shape[0])
            if (
                wanted
                and compatible
                and fused_tpugate_supported(self, x.shape[-1], xn_len)
            ):
                return fused_tpugate(x, xn, self)
        return self._call_jnp(x, xn, method)

    def batched_chunks(
        self,
        chunks: jax.Array,
        xn: Optional[jax.Array] = None,
        method: str = "auto",
        use_pallas: object = "auto",
    ) -> jax.Array:
        """Apply the gate over (channels, n_chunks, view) halo'd chunks,
        zero-filling each chunk's natural istft deficit back to ``view``.

        The fused Pallas path cannot be vmapped over (its hop-block operand
        lives in HBM), so when it is eligible the chunk axis flattens into
        the batch axis — one kernel launch for all chunks — with a
        multi-channel noise clip mapped channel-major onto the flattened
        rows. Otherwise the chunk axis is vmapped over the staged path
        (the reference's per-chunk loop, base.py:162-165)."""
        ch, k, view = chunks.shape

        def one(c, x_n):
            out = self(c, x_n, method=method, use_pallas=use_pallas)
            deficit = view - out.shape[-1]
            if deficit:
                out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, deficit)])
            return out

        if use_pallas is not False and chunks.dtype in (
            jnp.float32, jnp.bfloat16
        ):
            from noisereduce_tpu.models.spectral_gate import _tpu_available
            from noisereduce_tpu.ops.pallas_pipeline import (
                fused_tpugate,
                fused_tpugate_supported,
            )

            wanted = use_pallas is True or (
                use_pallas == "auto" and _tpu_available()
            )
            xn2 = None if xn is None else (xn if xn.ndim == 2 else xn[None])
            # reference broadcast semantics: xn batch is 1 or == channels
            divisible = xn2 is None or xn2.shape[0] in (1, ch)
            if (
                wanted
                and divisible
                and fused_tpugate_supported(
                    self, view, None if xn2 is None else xn2.shape[-1]
                )
            ):
                flat = fused_tpugate(chunks.reshape(ch * k, view), xn2, self)
                deficit = view - flat.shape[-1]
                if deficit:
                    flat = jnp.pad(flat, [(0, 0), (0, deficit)])
                return flat.reshape(ch, k, view)
        return jax.vmap(
            lambda c: one(c, xn), in_axes=-2, out_axes=-2
        )(chunks)

    def _call_jnp(
        self,
        x: jax.Array,
        xn: Optional[jax.Array] = None,
        method: str = "auto",
    ) -> jax.Array:
        """Staged XLA pipeline — the numerical oracle and grad twin of the
        fused Pallas path."""
        scfg = self.stft_config
        # time-major split-complex internally: (batch, frames, bins) re/im —
        # the DFT's native layout, no complex64 materialization
        re, im = stft(x, scfg, method=method, time_major=True, split=True)

        # Reference dtype quirk: the stationary path's mask is a BOOL tensor
        # and torch promotes ``bool * 1.0`` to float32 (torchgate.py:241), so
        # the reference's blend + conv2d smoothing run in float32 even for
        # f64 audio. We keep the blend/smooth in the compute dtype (values
        # agree to torch's own f32-conv accumulation noise, ~2e-7 on the
        # mask) — bit-matching oneDNN's f32 accumulation order is neither
        # possible nor desirable on TPU.
        # bf16 fast mode: spectrogram storage stays bf16, mask-decision math
        # upcasts to f32 (see models/spectral_gate._mask_dtype)
        ddt = jnp.float32 if re.dtype == jnp.bfloat16 else re.dtype
        mag = jnp.sqrt(re.astype(ddt) ** 2 + im.astype(ddt) ** 2)
        if self.nonstationary:
            mask = nonstationary_mask_torch(
                mag,
                self.n_movemean_nonstationary,
                self.n_thresh_nonstationary,
                self.temp_coeff_nonstationary,
                time_axis=-2,
            )
        else:
            XN_db = None
            if xn is not None:
                xn2 = xn if xn.ndim == 2 else xn[None]
                rn, in_ = stft(xn2, scfg, method=method, time_major=True, split=True)
                XN_db = amp_to_db(
                    jnp.sqrt(rn.astype(ddt) ** 2 + in_.astype(ddt) ** 2),
                    top_db=40.0, axis=-2,
                )
            mask = stationary_mask_torch(
                amp_to_db(mag, top_db=40.0, axis=-2),
                XN_db,
                self.n_std_thresh_stationary,
                time_axis=-2,
            )

        # prop_decrease blend BEFORE smoothing (torch-path order)
        mask = self.prop_decrease * (mask - 1.0) + 1.0
        smoothing = self.smoothing
        if smoothing is not None:
            mask = smooth_mask_2d_torchgate(mask, *smoothing, time_major=True)

        mask = mask.astype(re.dtype)
        # torch.istft without `length` returns (n_frames-1)*hop samples —
        # shorter than the input; the reference returns that natural length
        # (torchgate.py:255-264) and callers slice/zero-fill as needed.
        y = istft((re * mask, im * mask), scfg, method=method, time_major=True)
        return y.astype(x.dtype)


# register as a leafless pytree so the module can cross jit boundaries
jax.tree_util.register_pytree_node(
    TPUGate,
    lambda g: ((), dataclasses.astuple(g)),
    lambda aux, _: TPUGate(*aux),
)

"""Fused spectral-gating pipelines (NumPy-engine semantics), pure JAX.

The reference implements these as per-channel Python loops over scipy calls
(spectralgate/stationary.py:83-126, spectralgate/nonstationary.py:47-95).
Here each pipeline is ONE pure function on a (..., samples) array — a single
XLA graph: STFT → statistics/floor → mask → smooth → mask·STFT → ISTFT, all
HBM-resident, batchable over channels/chunks with vmap and shardable with
shard_map.

Per-path quirk parity (SURVEY.md §5.3):
  - stationary applies prop_decrease BEFORE smoothing (stationary.py:108-114)
  - non-stationary applies it AFTER smoothing (nonstationary.py:78-84)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from noisereduce_tpu.config import GateConfig
from noisereduce_tpu.ops import (
    amp_to_db,
    ewma_filtfilt,
    sigmoid,
    smooth_mask,
    stft,
    istft,
)

__all__ = [
    "stationary_noise_threshold",
    "gate_stationary",
    "gate_nonstationary",
]


def _tpu_available() -> bool:
    """True when the default backend's devices are TPUs (the Mosaic kernel
    is TPU-only). Matches TPU PJRT plugins whose platform name isn't 'tpu'
    (e.g. tunneled platforms) via device_kind."""
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover
        return False
    return dev.platform == "tpu" or "TPU" in getattr(dev, "device_kind", "").upper()


def _mask_dtype(dtype):
    """Dtype for the mask-decision math.

    bfloat16 (the opt-in fast mode) keeps the HBM-heavy spectrogram arrays
    half-width but computes the gating decisions — dB statistics, threshold
    compares, IIR floor, sigmoid — in float32: bf16's ~3 significant digits
    bias the noise statistics and flip threshold compares, costing ~13%
    output deviation, while the upcast fuses into the producing pass (reads
    stay bf16). See tests/test_bfloat16_mode.py for the pinned envelope.
    """
    return jnp.float32 if dtype == jnp.bfloat16 else dtype


def _pallas_decision(use_pallas, dtype, n_frames: int) -> bool:
    """Whether the fused Mosaic mask kernel should run.

    The kernel keeps the whole frame axis resident in VMEM, so the frame
    count is bounded by the actual VMEM budget
    (ops.pallas_mask.max_frames_for_vmem — derived, not a magic number).
    ``use_pallas=True`` past the budget falls back to the jnp path with a
    warning instead of failing at Mosaic compile/runtime.
    """
    if use_pallas is False:
        return False
    from noisereduce_tpu.ops.pallas_mask import max_frames_for_vmem

    budget = max_frames_for_vmem()
    if use_pallas is True:
        if n_frames > budget:
            import warnings

            warnings.warn(
                f"use_pallas=True but {n_frames} frames exceed the fused "
                f"kernel's VMEM budget ({budget} frames); falling back to "
                "the jnp path (chunk the signal to stay under the budget)",
                stacklevel=3,
            )
            return False
        return True
    # bf16 is accepted: the kernel upcasts its operands and computes in f32
    return (
        use_pallas == "auto"
        and _tpu_available()
        and dtype in (jnp.float32, jnp.bfloat16)
        and n_frames <= budget
    )


def _apply_mask_and_invert(
    Z, mask: jax.Array, cfg: GateConfig, n_samples: int, method: str
) -> jax.Array:
    """mask · STFT → ISTFT, zero-filled back to the input length.

    The reference writes the (shorter) ISTFT output into a zeros buffer of
    the chunk's shape (stationary.py:85,126; nonstationary.py:49,95).
    Operates in time-major split-complex form (re, im) end-to-end.
    """
    re, im = Z
    mask = mask.astype(re.dtype)
    y = istft((re * mask, im * mask), cfg.stft, method=method, time_major=True)
    out_len = y.shape[-1]
    if out_len < n_samples:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, n_samples - out_len)])
    elif out_len > n_samples:
        y = y[..., :n_samples]
    return y


def stationary_noise_threshold(
    y_noise: jax.Array, cfg: GateConfig, method: str = "auto",
    use_pallas: object = "auto",
) -> jax.Array:
    """Per-frequency dB threshold from a (mono) noise clip.

    mean + std * n_std_thresh over time of the noise dB spectrogram
    (stationary.py:67-81; np.std ddof=0). On TPU the noise spectra come
    from the fused true-f32 STFT kernel when the geometry allows.
    """
    if use_pallas is not False and y_noise.dtype in (jnp.float32, jnp.bfloat16):
        from noisereduce_tpu.ops.pallas_pipeline import (
            fused_threshold_supported,
            fused_stationary_threshold,
        )

        wanted = use_pallas is True or (use_pallas == "auto" and _tpu_available())
        if wanted and fused_threshold_supported(cfg, y_noise.shape[-1]):
            return fused_stationary_threshold(y_noise.astype(jnp.float32), cfg)
    re, im = stft(y_noise, cfg.stft, method=method, time_major=True, split=True)
    ddt = _mask_dtype(re.dtype)
    re, im = re.astype(ddt), im.astype(ddt)
    Zn_db = amp_to_db(jnp.sqrt(re * re + im * im), top_db=80.0, axis=-2)
    mean = jnp.mean(Zn_db, axis=-2)
    std = jnp.std(Zn_db, axis=-2)  # ddof=0, matching np.std
    return mean + std * cfg.n_std_thresh_stationary  # (..., n_bins)


def _align_thresh(noise_thresh: jax.Array, zdb_ndim: int) -> jax.Array:
    """Broadcast a per-frequency threshold against (..., frames, bins) dB
    spectra. 1-D ``(bins,)`` thresholds broadcast as-is (one threshold for
    every row — the reference's only case). Per-row ``(B, ..., bins)``
    thresholds (reduce_noise_batch: one set of noise statistics per batched
    signal) left-align their batch axes with the spectra's leading axes —
    the frames axis, and any chunk/group axes the chunking combinator
    added, are inserted as broadcast axes just before bins."""
    if noise_thresh.ndim <= 1:
        return noise_thresh
    n_new = zdb_ndim - noise_thresh.ndim
    shape = noise_thresh.shape[:-1] + (1,) * n_new + noise_thresh.shape[-1:]
    return noise_thresh.reshape(shape)


def gate_stationary(
    chunk: jax.Array,
    noise_thresh: jax.Array,
    cfg: GateConfig,
    method: str = "auto",
    use_pallas: object = "auto",
) -> jax.Array:
    """Stationary spectral gate over (..., samples) (stationary.py:83-126).

    On TPU with supported geometry the whole gate runs as two fused Pallas
    kernels + a banded matmul (ops/pallas_pipeline.py), like the
    non-stationary path; otherwise the staged jnp pipeline below.

    ``noise_thresh``: ``(bins,)`` (shared, the reference semantics) or
    per-row ``(B, bins)`` with B = the leading axis of ``chunk`` (batched
    serving: independent signals ride the channel axis, each with its own
    noise statistics).
    """
    if use_pallas is not False and chunk.dtype in (jnp.float32, jnp.bfloat16):
        from noisereduce_tpu.ops.pallas_pipeline import (
            fused_gate_supported,
            fused_gate_stationary,
        )

        smoothing = cfg.smoothing
        n_grad_time = smoothing[1] if smoothing else 0
        wanted = use_pallas is True or (use_pallas == "auto" and _tpu_available())
        if wanted and fused_gate_supported(cfg, chunk.shape[-1], n_grad_time):
            return fused_gate_stationary(chunk, noise_thresh, cfg)
    return _gate_stationary_jnp(chunk, noise_thresh, cfg, method)


def _gate_stationary_jnp(
    chunk: jax.Array,
    noise_thresh: jax.Array,
    cfg: GateConfig,
    method: str = "auto",
) -> jax.Array:
    """Staged pipeline (XLA ops), time-major: (..., frames, bins) — the
    DFT's native layout, the per-frequency threshold broadcasts over
    frames. Also the numerical oracle and backward-pass (cotangent)
    twin of the fused path — the fused kernels are the grad primal."""
    n_samples = chunk.shape[-1]
    re, im = stft(chunk, cfg.stft, method=method, time_major=True, split=True)
    ddt = _mask_dtype(re.dtype)
    Z_db = amp_to_db(
        jnp.sqrt(re.astype(ddt) ** 2 + im.astype(ddt) ** 2),
        top_db=80.0, axis=-2,
    )
    # mask where the signal rises above the per-frequency noise threshold
    thresh = _align_thresh(noise_thresh.astype(ddt), Z_db.ndim)
    mask = (Z_db > thresh).astype(ddt)
    # prop_decrease blend FIRST (stationary-path order)
    mask = mask * cfg.prop_decrease + (1.0 - cfg.prop_decrease)
    smoothing = cfg.smoothing
    if smoothing is not None:
        mask = smooth_mask(mask, *smoothing, time_major=True)
    return _apply_mask_and_invert((re, im), mask, cfg, n_samples, method)


def gate_nonstationary(
    chunk: jax.Array,
    cfg: GateConfig,
    method: str = "auto",
    use_pallas: object = "auto",
) -> jax.Array:
    """Non-stationary spectral gate over (..., samples)
    (nonstationary.py:47-95).

    ``use_pallas``: True / False / "auto". On TPU with supported geometry
    the whole gate runs as three fused Pallas kernels (framing+DFT, IIR
    mask+time smoothing, apply+iDFT+OLA — ops/pallas_pipeline.py), keeping
    each chunk's time axis resident in VMEM per frequency tile. Otherwise
    the |Z| → IIR floor → sigmoid stage alone runs as one fused kernel
    (ops/pallas_mask.py) when eligible; the float64/CPU parity path keeps
    the jnp composition.
    """
    if use_pallas is not False and chunk.dtype in (jnp.float32, jnp.bfloat16):
        from noisereduce_tpu.ops.pallas_pipeline import (
            fused_gate_supported,
            fused_gate_nonstationary,
        )

        smoothing = cfg.smoothing
        n_grad_time = smoothing[1] if smoothing else 0
        wanted = use_pallas is True or (use_pallas == "auto" and _tpu_available())
        if wanted and fused_gate_supported(cfg, chunk.shape[-1], n_grad_time):
            return fused_gate_nonstationary(chunk, cfg)
    return _gate_nonstationary_jnp(chunk, cfg, method, use_pallas)


def _gate_nonstationary_jnp(
    chunk: jax.Array,
    cfg: GateConfig,
    method: str = "auto",
    use_pallas: object = False,
) -> jax.Array:
    """Staged pipeline (XLA ops; optional fused mask kernel). Also the
    numerical oracle and backward-pass (cotangent) twin of the fully
    fused Pallas path — the fused kernels are the grad primal."""
    n_samples = chunk.shape[-1]
    re, im = stft(chunk, cfg.stft, method=method, time_major=True, split=True)
    pallas_ok = _pallas_decision(use_pallas, re.dtype, re.shape[-2])
    if pallas_ok:
        from noisereduce_tpu.ops.pallas_mask import fused_nonstationary_mask_tm

        mask = fused_nonstationary_mask_tm(
            re,
            im,
            cfg.iir_b,
            cfg.thresh_n_mult_nonstationary,
            cfg.sigmoid_slope_nonstationary,
        )
    else:
        ddt = _mask_dtype(re.dtype)
        mag = jnp.sqrt(re.astype(ddt) ** 2 + im.astype(ddt) ** 2)
        # time-smoothed noise floor: zero-phase first-order IIR per
        # frequency, along the frame axis (nonstationary.py:106-115)
        floor = ewma_filtfilt(mag, cfg.iir_b, axis=-2)
        ratio = (mag - floor) / floor
        mask = sigmoid(
            ratio,
            -cfg.thresh_n_mult_nonstationary,
            cfg.sigmoid_slope_nonstationary,
        )
    smoothing = cfg.smoothing
    if smoothing is not None:
        mask = smooth_mask(mask, *smoothing, time_major=True)
    # prop_decrease blend AFTER smoothing (non-stationary-path order)
    mask = mask * cfg.prop_decrease + (1.0 - cfg.prop_decrease)
    return _apply_mask_and_invert((re, im), mask, cfg, n_samples, method)

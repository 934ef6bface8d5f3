"""Elementwise / small-kernel DSP ops for spectral gating.

Each op documents the reference behavior it reproduces (file:line into
/root/reference). All ops are pure, dtype-polymorphic, and operate on the
last one or two axes with arbitrary leading batch axes, so they compose with
``vmap``/``shard_map`` and fuse under ``jit``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from noisereduce_tpu.ops.precision import staged_precision

__all__ = [
    "amp_to_db",
    "sigmoid",
    "temperature_sigmoid",
    "triangular_vector",
    "smooth_mask",
    "smooth_mask_2d_torchgate",
    "ewma_filtfilt",
    "moving_average_same",
]

# float64 machine epsilon — the reference uses this constant in *both*
# backends regardless of compute dtype (spectralgate/utils.py:11,
# torchgate/utils.py:6).
_EPS_F64 = float(np.finfo(np.float64).eps)


def amp_to_db(
    x: jax.Array, top_db: float = 80.0, eps: float = _EPS_F64, axis: int = -1
) -> jax.Array:
    """Amplitude -> dB with a per-row dynamic-range floor.

    ``20*log10(|x| + eps)`` floored at (max over ``axis``) - top_db. The
    reference reduces over time — the last axis of its freq-major layout
    (spectralgate/utils.py:11-16, top_db=80; torchgate/utils.py:6-23,
    top_db=40); time-major callers pass axis=-2.
    """
    mag = jnp.abs(x)
    x_db = 20.0 * jnp.log10(mag + jnp.asarray(eps, dtype=mag.dtype))
    floor = jnp.max(x_db, axis=axis, keepdims=True) - top_db
    return jnp.maximum(x_db, floor)


def sigmoid(x: jax.Array, shift: float, mult: float) -> jax.Array:
    """``1 / (1 + exp(-(x + shift) * mult))`` (spectralgate/utils.py:4-8)."""
    return jax.nn.sigmoid((x + shift) * mult)


def temperature_sigmoid(x: jax.Array, x0: float, temp_coeff: float) -> jax.Array:
    """``sigmoid((x - x0) / temp)`` (torchgate/utils.py:27-39)."""
    return jax.nn.sigmoid((x - x0) / temp_coeff)


# ---------------------------------------------------------------------------
# Mask smoothing: separable triangular filter
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def triangular_vector(n_grad: int) -> np.ndarray:
    """Length-(2n+1) symmetric triangular ramp, unnormalized float64.

    Equals the reference's concatenated linspace construction
    (spectralgate/base.py:14-27, torchgate/torchgate.py:113-123):
    [1,...,n]/(n+1), 1, [n,...,1]/(n+1).
    """
    up = np.linspace(0.0, 1.0, n_grad + 1, endpoint=False)
    down = np.linspace(1.0, 0.0, n_grad + 2)
    return np.concatenate([up, down])[1:-1]


@functools.lru_cache(maxsize=None)
def _smoothing_vectors_np(n_grad_freq: int, n_grad_time: int):
    """Separable factors of the normalized 2-D smoothing filter.

    The reference builds ``outer(v_f, v_t) / outer.sum()``
    (spectralgate/base.py:7-29); since the filter is rank-1 we convolve with
    ``v_f / v_f.sum()`` along frequency then ``v_t / v_t.sum()`` along time —
    two cheap 1-D convs instead of one 2-D conv, identical result.
    """
    v_f = triangular_vector(n_grad_freq)
    v_t = triangular_vector(n_grad_time)
    return v_f / v_f.sum(), v_t / v_t.sum()


def _conv1d_same_last(x: jax.Array, kernel_np: np.ndarray, pad_left: int, pad_right: int) -> jax.Array:
    """Cross-correlate the last axis of (..., T) with a static 1-D kernel,
    with explicit (pad_left, pad_right) zero padding. Batch axes collapse to
    one conv batch dim."""
    k = len(kernel_np)
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    xb = x.reshape((-1, 1, t))
    kern = jnp.asarray(kernel_np, dtype=x.dtype).reshape((1, 1, k))
    out = jax.lax.conv_general_dilated(
        xb,
        kern,
        window_strides=(1,),
        padding=[(pad_left, pad_right)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(batch_shape + (out.shape[-1],))


@functools.lru_cache(maxsize=None)
def _torchgate_smoothing_kernel_np(n_grad_freq: int, n_grad_time: int) -> np.ndarray:
    """TorchGate's 2-D smoothing kernel with its float32 rounding.

    The reference registers the filter as a buffer built from
    ``torch.linspace``/``torch.outer`` in DEFAULT float32
    (torchgate.py:113-124), then casts to the mask dtype (torchgate.py:246).
    The f32 rounding makes the kernel no longer exactly rank-1, so parity
    needs the true 2-D kernel. Values are taken from torch when importable,
    else emulated in float32 numpy (≤1 ulp).
    """
    try:  # pragma: no cover - torch present in CI image
        import torch

        v_f = torch.cat(
            [
                torch.linspace(0, 1, n_grad_freq + 2)[:-1],
                torch.linspace(1, 0, n_grad_freq + 2),
            ]
        )[1:-1]
        v_t = torch.cat(
            [
                torch.linspace(0, 1, n_grad_time + 2)[:-1],
                torch.linspace(1, 0, n_grad_time + 2),
            ]
        )[1:-1]
        k = torch.outer(v_f, v_t)
        return (k / k.sum()).to(torch.float64).numpy()
    except Exception:
        v_f = triangular_vector(n_grad_freq).astype(np.float32)
        v_t = triangular_vector(n_grad_time).astype(np.float32)
        k = np.outer(v_f, v_t).astype(np.float32)
        return (k / k.sum(dtype=np.float32)).astype(np.float64)


@functools.lru_cache(maxsize=None)
def _torchgate_kernel_svd_np(n_grad_freq: int, n_grad_time: int):
    """SVD factorization of the TorchGate smoothing kernel.

    The f32 rounding makes the kernel not *exactly* rank-1, but its trailing
    singular values are ~1e-8 of σ₀ (pure rounding noise). We keep every
    term with σᵢ > 1e-10·σ₀ (rank 3-4 in practice, residual ≤ ~3e-11 —
    orders of magnitude below the reference's own oneDNN f32-conv noise),
    turning the pathologically slow single-channel 2-D TPU conv into two
    channel-parallel 1-D convs.
    Returns (rows, cols): rows (r, kf) = σᵢ·uᵢ, cols (r, kt) = vᵢ.
    """
    k = _torchgate_smoothing_kernel_np(n_grad_freq, n_grad_time)
    u, s, vt = np.linalg.svd(k)
    r = max(1, int(np.sum(s > 1e-10 * s[0])))
    return (u[:, :r] * s[:r]).T.copy(), vt[:r].copy()


# ---------------------------------------------------------------------------
# Banded-matmul lowering of the small "same" convolutions
#
# XLA's TPU conv_general_dilated on the tall-skinny mask shapes here is
# HBM/layout-bound at ~6x its byte roofline (device trace, NOTES.md round 4:
# the staged cotangent twin spent ~9 ms of a ~20 ms b256 training step in
# these convs whose FLOPs round to zero). A dense banded matrix B with the
# taps on its diagonals computes the identical sums as one MXU matmul per
# axis. O(L^2) FLOPs/bytes instead of O(L*k), so it is gated on L (the mask
# axes are a few hundred to ~2k; the chunked staged path's ~5.5k-frame time
# axis keeps the conv).
# ---------------------------------------------------------------------------
_BAND_MM_MAX_LEN = 4096


def _band_mm_enabled(length: int) -> bool:
    import os

    env = os.environ.get("NRTPU_SMOOTH_MM", "auto").lower()
    if env in ("0", "conv", "off"):
        return False
    if env in ("1", "mm", "on"):
        return True
    if env != "auto":
        raise ValueError(f"NRTPU_SMOOTH_MM={env!r}: use auto|mm|conv")
    from noisereduce_tpu.models.spectral_gate import _tpu_available

    return length <= _BAND_MM_MAX_LEN and _tpu_available()


@functools.lru_cache(maxsize=None)
def _band_matrix_np(taps: tuple, length: int, pad_left: int) -> np.ndarray:
    """Dense float64 band matrix: (B @ x)[i] = sum_k taps[k]*x[i+k-pad_left],
    reading x as zero outside [0, length) — exactly the 'same'-padded
    cross-correlation the lax convs above compute."""
    b = np.zeros((length, length), np.float64)
    idx = np.arange(length)
    for k, t in enumerate(taps):
        off = k - pad_left
        src = idx + off
        ok = (src >= 0) & (src < length)
        b[idx[ok], src[ok]] = t
    return b


def _band_acc(dtype):
    return jnp.float32 if dtype in (jnp.float32, jnp.bfloat16) else dtype


def _band_mm_last(x: jax.Array, b_np: np.ndarray) -> jax.Array:
    """Apply a band matrix along the last axis: out[..., i] = (B @ x)[i]."""
    bt = jnp.asarray(b_np.T, x.dtype)
    return jnp.matmul(
        x, bt, preferred_element_type=_band_acc(x.dtype),
        precision=staged_precision(),
    ).astype(x.dtype)


def _band_mm_rows(x: jax.Array, b_np: np.ndarray) -> jax.Array:
    """Apply a band matrix along axis -2 of (..., h, w)."""
    b = jnp.asarray(b_np, x.dtype)
    return jnp.einsum(
        "ij,...jw->...iw", b, x,
        preferred_element_type=_band_acc(x.dtype),
        precision=staged_precision(),
    ).astype(x.dtype)


def smooth_mask_2d_torchgate(
    mask: jax.Array,
    n_grad_freq: int,
    n_grad_time: int,
    time_major: bool = False,
) -> jax.Array:
    """TorchGate-parity smoothing: 'same' conv with the f32-rounded 2-D
    kernel (torchgate.py:241-249). Shape (..., freq, time), or
    (..., time, freq) with ``time_major`` (kernel transposed — the kernel's
    f32 values are identical either way).

    Implemented as an SVD-separable pair of 1-D convs with the SVD rank as
    the channel axis (one row-conv fanning out to r channels, one col-conv
    contracting them) — ~40× faster on TPU than the naive 2-D conv, within
    ~3e-11 of it. On TPU the 1-D convs lower further to banded MXU matmuls
    (identical sums; see _band_matrix_np) when the axes fit.
    """
    rows_np, cols_np = _torchgate_kernel_svd_np(n_grad_freq, n_grad_time)
    if time_major:
        rows_np, cols_np = cols_np, rows_np
        pr, pc = n_grad_time, n_grad_freq
    else:
        pr, pc = n_grad_freq, n_grad_time
    r, kf = rows_np.shape
    _, kt = cols_np.shape
    batch_shape = mask.shape[:-2]
    h, w = mask.shape[-2], mask.shape[-1]
    if _band_mm_enabled(max(h, w)):
        # out = sum_r (Br @ x) @ Cr^T as two rank-batched MXU einsums
        br_np = np.stack(
            [_band_matrix_np(tuple(rows_np[i]), h, pr) for i in range(r)]
        )
        ct_np = np.stack(
            [_band_matrix_np(tuple(cols_np[i]), w, pc).T for i in range(r)]
        )
        xb = mask.reshape((-1, h, w))
        acc = _band_acc(mask.dtype)
        prec = staged_precision()
        mid = jnp.einsum(
            "rij,bjw->briw", jnp.asarray(br_np, mask.dtype), xb,
            preferred_element_type=acc, precision=prec,
        ).astype(mask.dtype)
        out = jnp.einsum(
            "briw,rwv->biv", mid, jnp.asarray(ct_np, mask.dtype),
            preferred_element_type=acc, precision=prec,
        ).astype(mask.dtype)
        return out.reshape(batch_shape + (h, w))
    xb = mask.reshape((-1, 1, h, w))
    # (r,1,kf,1): fan out to r channels, each convolved with σᵢ·uᵢ over rows
    k_rows = jnp.asarray(rows_np, mask.dtype).reshape(r, 1, kf, 1)
    mid = jax.lax.conv_general_dilated(
        xb, k_rows, (1, 1), [(pr, pr), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    # (1,r,1,kt): convolve each channel with vᵢ over cols and sum channels
    k_cols = jnp.asarray(cols_np, mask.dtype).reshape(1, r, 1, kt)
    out = jax.lax.conv_general_dilated(
        mid, k_cols, (1, 1), [(0, 0), (pc, pc)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(batch_shape + (h, w))


def smooth_mask(
    mask: jax.Array,
    n_grad_freq: int,
    n_grad_time: int,
    time_major: bool = False,
) -> jax.Array:
    """Smooth a (..., freq, time) mask — or (..., time, freq) with
    ``time_major=True`` — with the normalized triangular filter.

    Matches ``fftconvolve(mask, outer(v_f, v_t)/sum, mode='same')``
    (stationary.py:110-114, nonstationary.py:78-81) and TorchGate's
    ``conv2d(..., padding='same')`` (torchgate.py:244-249): both kernels are
    odd-length and symmetric, so 'same' cropping is symmetric and
    cross-correlation equals convolution.
    """
    v_f, v_t = _smoothing_vectors_np(n_grad_freq, n_grad_time)
    batch_shape = mask.shape[:-2]
    h, w = mask.shape[-2], mask.shape[-1]
    if time_major:
        vr, vc = v_t, v_f
        pr, pc = n_grad_time, n_grad_freq
    else:
        vr, vc = v_f, v_t
        pr, pc = n_grad_freq, n_grad_time
    # separable: two 1-D passes (rank-1 kernel), each along one spatial dim;
    # each pass lowers to a banded MXU matmul on TPU when its axis fits,
    # else a lax conv (identical sums either way)
    out = mask.reshape((-1, h, w))
    if len(vr) > 1:
        if _band_mm_enabled(h):
            out = _band_mm_rows(out, _band_matrix_np(tuple(vr), h, pr))
        else:
            out = jax.lax.conv_general_dilated(
                out[:, None],
                jnp.asarray(vr, mask.dtype).reshape(1, 1, -1, 1),
                (1, 1),
                [(pr, pr), (0, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )[:, 0]
    if len(vc) > 1:
        if _band_mm_enabled(w):
            out = _band_mm_last(out, _band_matrix_np(tuple(vc), w, pc))
        else:
            out = jax.lax.conv_general_dilated(
                out[:, None],
                jnp.asarray(vc, mask.dtype).reshape(1, 1, 1, -1),
                (1, 1),
                [(0, 0), (pc, pc)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )[:, 0]
    return out.reshape(batch_shape + (h, w))


# ---------------------------------------------------------------------------
# Non-stationary noise floors
# ---------------------------------------------------------------------------
def _ewma_forward_scan(x: jax.Array, b: float) -> jax.Array:
    """Reference implementation of the first-order recurrence
    y[0]=x[0]; y[t] = b*x[t] + (1-b)*y[t-1] as a log-depth associative scan.

    Kept as the numerical oracle for the matmul formulation below; the tuple
    carries make it HBM-heavy (~4 array passes per log step), so the default
    path is ``_ewma_forward``.
    """
    a = jnp.full_like(x, 1.0 - b)
    # Element 0 carries the initial condition: y[0] = x[0].
    a = a.at[..., 0].set(0.0)
    bx = x * jnp.asarray(b, dtype=x.dtype)
    bx = bx.at[..., 0].set(x[..., 0])

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (a, bx), axis=-1)
    return y


@functools.lru_cache(maxsize=None)
def _ewma_block_consts_np(b: float, block: int):
    """Trace-time constants for the blockwise linear-recurrence matmul:

    L[i, j] = b * a^(i-j) for i >= j (lower-triangular in-block kernel),
    decay[i] = a^(i+1)    (carry propagation into a block),
    a_block  = a^block    (block-to-block carry factor),
    with a = 1 - b.
    """
    a = 1.0 - b
    i = np.arange(block, dtype=np.float64)
    L = np.zeros((block, block), dtype=np.float64)
    for d in range(block):  # diagonal d holds b * a^d
        L += np.diag(np.full(block - d, b * (a**d)), -d)
    decay = a ** (i + 1)
    return L, decay, float(a**block)


def _ewma_forward_tm(x: jax.Array, b: float, block: int = 128) -> jax.Array:
    """Time-major twin of ``_ewma_forward``: the recurrence runs along axis
    -2 of (..., T, F) via L @ x_block matmuls — no transposes."""
    x = jnp.asarray(x)
    T = x.shape[-2]
    if T <= block:
        y = _ewma_forward_scan(jnp.swapaxes(x, -1, -2), b)
        return jnp.swapaxes(y, -1, -2)
    dtype = x.dtype
    L_np, decay_np, a_block = _ewma_block_consts_np(b, block)

    x = x.at[..., 0, :].divide(jnp.asarray(b, dtype))
    n_blocks = -(-T // block)
    pad = n_blocks * block - T
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)])
    F = x.shape[-1]
    xb = x.reshape(x.shape[:-2] + (n_blocks, block, F))

    L = jnp.asarray(L_np, dtype)
    acc = jnp.float32 if dtype in (jnp.float32, jnp.bfloat16) else dtype
    P = jnp.matmul(
        L, xb, preferred_element_type=acc, precision=staged_precision()
    ).astype(dtype)

    last = P[..., -1, :]  # (..., n_blocks, F)
    ab = jnp.asarray(a_block, dtype)

    def combine(c1, c2):
        a1, v1 = c1
        a2, v2 = c2
        return a1 * a2, a2 * v1 + v2

    coeff = jnp.broadcast_to(ab, last.shape)
    _, carries = jax.lax.associative_scan(combine, (coeff, last), axis=-2)
    prev_carry = jnp.concatenate(
        [jnp.zeros_like(carries[..., :1, :]), carries[..., :-1, :]], axis=-2
    )

    decay = jnp.asarray(decay_np, dtype)[:, None]
    y = P + prev_carry[..., None, :] * decay
    return y.reshape(y.shape[:-3] + (n_blocks * block, F))[..., :T, :]


def _ewma_forward(x: jax.Array, b: float, block: int = 128) -> jax.Array:
    """First-order IIR y[0]=x[0]; y[t] = b*x[t] + (1-b)*y[t-1] along the last
    axis, as blockwise matmuls + a tiny block-carry scan (TPU MXU path).

    Math: rescale x[0] -> x[0]/b so the recurrence is uniform
    (y[t] = a·y[t-1] + b·x[t] from zero state), then
      P   = X_blocks @ L^T            (in-block partial responses, parallel)
      c_k = P_k[last] + a^B · c_{k-1} (carry scan over ~T/B blocks)
      y   = P + decay ⊗ c_{k-1}       (carry injection)
    Two passes over the data instead of the associative scan's
    4·log2(T) passes. Exactly scipy's ``lfilter([b],[1,b-1],x,zi=(1-b)x[0])``
    up to float summation order (reference nonstationary.py:106-115).
    """
    x = jnp.asarray(x)
    T = x.shape[-1]
    if T <= block:  # small inputs: the scan is cheaper than padding
        return _ewma_forward_scan(x, b)
    dtype = x.dtype
    L_np, decay_np, a_block = _ewma_block_consts_np(b, block)

    # uniform recurrence via first-element rescale
    x = x.at[..., 0].divide(jnp.asarray(b, dtype))

    n_blocks = -(-T // block)
    pad = n_blocks * block - T
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xb = x.reshape(x.shape[:-1] + (n_blocks, block))

    Lt = jnp.asarray(L_np.T, dtype)
    acc = jnp.float32 if dtype in (jnp.float32, jnp.bfloat16) else dtype
    P = jnp.matmul(
        xb, Lt, preferred_element_type=acc, precision=staged_precision()
    ).astype(dtype)

    # carry scan over blocks: c_k = P_k[-1] + a^B * c_{k-1}
    last = P[..., -1]  # (..., n_blocks)
    ab = jnp.asarray(a_block, dtype)

    def combine(c1, c2):
        a1, v1 = c1
        a2, v2 = c2
        return a1 * a2, a2 * v1 + v2

    coeff = jnp.broadcast_to(ab, last.shape)
    _, carries = jax.lax.associative_scan(combine, (coeff, last), axis=-1)
    prev_carry = jnp.concatenate(
        [jnp.zeros_like(carries[..., :1]), carries[..., :-1]], axis=-1
    )

    decay = jnp.asarray(decay_np, dtype)
    y = P + prev_carry[..., None] * decay
    return y.reshape(y.shape[:-2] + (n_blocks * block,))[..., :T]


def ewma_filtfilt(x: jax.Array, b: float, axis: int = -1) -> jax.Array:
    """Zero-phase forward-backward first-order low-pass along ``axis``
    (-1 or -2).

    Equals ``scipy.signal.filtfilt([b], [1, b-1], x, axis=..., padtype=None)``
    (nonstationary.py:115) including the lfilter_zi initial conditions
    (y starts at the first sample in each direction). axis=-2 runs natively
    in time-major layout (no transposes).
    """
    if axis == -2:
        fwd = _ewma_forward_tm(x, b)
        bwd = _ewma_forward_tm(jnp.flip(fwd, axis=-2), b)
        return jnp.flip(bwd, axis=-2)
    assert axis == -1
    fwd = _ewma_forward(x, b)
    bwd = _ewma_forward(jnp.flip(fwd, axis=-1), b)
    return jnp.flip(bwd, axis=-1)


def moving_average_same(x: jax.Array, n: int, axis: int = -1) -> jax.Array:
    """Torch-convention 'same' moving average along ``axis`` (-1 or -2).

    Matches TorchGate's ``conv1d(x, ones(n)/n, padding='same')``
    (torchgate.py:179-190): zero padding split left=(n-1)//2,
    right=n-1-left (torch pads more on the right for even n).
    """
    left = (n - 1) // 2
    right = (n - 1) - left
    kernel = np.full(n, 1.0 / n, dtype=np.float64)
    if axis == -1:
        if _band_mm_enabled(x.shape[-1]):
            return _band_mm_last(
                x, _band_matrix_np(tuple(kernel), x.shape[-1], left)
            )
        return _conv1d_same_last(x, kernel, left, right)
    assert axis == -2
    batch_shape = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    if _band_mm_enabled(h):
        out = _band_mm_rows(
            x.reshape((-1, h, w)), _band_matrix_np(tuple(kernel), h, left)
        )
        return out.reshape(batch_shape + (h, w))
    xb = x.reshape((-1, 1, h, w))
    kern = jnp.asarray(kernel, dtype=x.dtype).reshape((1, 1, n, 1))
    out = jax.lax.conv_general_dilated(
        xb, kern, (1, 1), [(left, right), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(batch_shape + (h, w))

"""Fused non-stationary mask as a Pallas TPU kernel.

Computes, in ONE pass over the spectrogram (per (batch, freq-tile) grid
cell, with the whole time axis resident in VMEM):

    mag   = |Z|
    floor = filtfilt-style forward+backward first-order IIR over time
            (scipy semantics: y starts at the first/last sample — reference
            nonstationary.py:106-115)
    mask  = sigmoid(((mag - floor)/floor - thresh) * slope)
            (reference nonstationary.py:70-76)

The XLA composition of these ops makes ~6 HBM round-trips over the
spectrogram; this kernel reads |Z| once and writes the mask once (measured
+22% pipeline RTF on v5e). The IIR
uses the same blockwise linear-recurrence-as-matmul formulation as
ops/dsp.py `_ewma_forward` — (T_b × T_b) lower-triangular decay matrices on
the MXU with scalar-free carry propagation, so the sequential dependency
costs ~T/T_b small matmuls, not T vector ops.

Inputs are float32 (TPU production dtype). The jnp path in
models/spectral_gate.py remains the float64 / CPU / parity path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_nonstationary_mask",
    "fused_nonstationary_mask_tm",
    "max_frames_for_vmem",
]

_BT = 128       # time block (MXU contraction size)
_FT = 128       # frequency tile (sublane-major rows)

# Per-core VMEM on TPU v4/v5 generations; 5% margin for Mosaic's own
# bookkeeping. If a future part changes this, override via env.
_VMEM_BYTES = int(
    float(__import__("os").environ.get("NRTPU_VMEM_BYTES", 16 * 1024 * 1024))
)
_VMEM_SAFETY = 0.95


def max_frames_for_vmem() -> int:
    """Largest padded frame count whose kernel working set fits in VMEM.

    The time-major kernel keeps the whole frame axis resident per grid cell:
    three (t_pad, _FT) f32 tiles stream through the grid (re, im, mask) and
    two more are scratch (magnitude, forward-IIR result) — 5 planes of
    t_pad·128·4 bytes — plus four (_BT, _BT) constant operands. Solving
    5·512·t_pad + const ≤ 0.95·VMEM gives the bound (≈6.0k frames on a
    16 MiB-VMEM core, matching the empirically validated round-1 gate).
    """
    const = 4 * _BT * _BT * 4
    per_frame = 5 * _FT * 4
    t_max = int((_VMEM_BYTES * _VMEM_SAFETY - const) // per_frame)
    return (t_max // _BT) * _BT


@functools.lru_cache(maxsize=None)
def _consts_np(b: float, block: int):
    """L[i,j] = b*a^(i-j) (i>=j), decay_fwd[i] = a^(i+1),
    decay_bwd[i] = a^(block-i), a_block = a^block."""
    a = 1.0 - b
    L = np.zeros((block, block), dtype=np.float64)
    for d in range(block):
        L += np.diag(np.full(block - d, b * (a**d)), -d)
    i = np.arange(block, dtype=np.float64)
    return (
        L.astype(np.float32),
        (a ** (i + 1)).astype(np.float32),
        (a ** (block - i)).astype(np.float32),
        np.float32(a**block),
    )


def _mask_kernel(
    magin_ref, lt_ref, l_ref, dfwd_ref, dbwd_ref, mask_ref, mag_ref, y_ref,
    *, n_tb: int, t_real: int, b: float, a_block: float,
    thresh: float, slope: float,
):
    """One (1, F_TILE, T_PAD) tile: full fused mask computation in VMEM.

    Takes |Z| (not Re/Im) because ``jnp.real``/``jnp.imag`` on complex64
    inputs are unimplemented in some TPU runtime builds while
    ``jnp.abs(complex)`` lowers fine; the abs fuses into the producer
    anyway.
    """
    f_tile = mag_ref.shape[0]
    t_pad = mag_ref.shape[1]

    mag = magin_ref[0]
    # zero out the padded time columns so they don't feed the IIR
    col = jax.lax.broadcasted_iota(jnp.int32, (f_tile, t_pad), 1)
    mag = jnp.where(col < t_real, mag, 0.0)
    mag_ref[...] = mag

    d_fwd = dfwd_ref[...]  # (F_TILE, BT), row-replicated decay vectors
    d_bwd = dbwd_ref[...]

    # Loops are lax.fori_loop with pl.ds slices (NOT Python-unrolled: 2×~21
    # unrolled MXU iterations blow Mosaic compile time into minutes through
    # the remote-compile path).

    # ---- forward IIR: y[t] = b*mag[t] + (1-b)*y[t-1], y[0] = mag[0] ----
    def fwd_body(kb, carry):
        start = pl.multiple_of(kb * _BT, _BT)
        xb = mag_ref[:, pl.ds(start, _BT)]
        # uniform recurrence via first-element rescale x[0] /= b
        cidx = jax.lax.broadcasted_iota(jnp.int32, (f_tile, _BT), 1) + start
        xb = jnp.where(cidx == 0, xb * jnp.float32(1.0 / b), xb)
        p = jnp.dot(xb, lt_ref[...], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        yb = p + carry * d_fwd
        y_ref[:, pl.ds(start, _BT)] = yb
        return yb[:, _BT - 1 :]

    carry0 = jnp.zeros((f_tile, 1), jnp.float32)
    jax.lax.fori_loop(0, n_tb, fwd_body, carry0)

    # ---- backward IIR over y: w[t] = b*y[t] + (1-b)*w[t+1] --------------
    # The true last sample's init (w[T-1] = y[T-1]) needs y'[T-1] = y[T-1]/b
    # under the uniform recurrence; everything past T-1 must be zero.
    def bwd_body(k, carry):
        kb = n_tb - 1 - k
        start = pl.multiple_of(kb * _BT, _BT)
        yb = y_ref[:, pl.ds(start, _BT)]
        cidx = jax.lax.broadcasted_iota(jnp.int32, (f_tile, _BT), 1) + start
        yb = jnp.where(cidx == t_real - 1, yb * jnp.float32(1.0 / b), yb)
        yb = jnp.where(cidx > t_real - 1, 0.0, yb)
        p = jnp.dot(yb, l_ref[...], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        wb = p + carry * d_bwd
        # final mask for this block: sigmoid((ratio - thresh) * slope)
        mb = mag_ref[:, pl.ds(start, _BT)]
        safe_w = jnp.where(wb == 0.0, 1.0, wb)
        ratio = (mb - wb) / safe_w
        mask = jax.nn.sigmoid((ratio - jnp.float32(thresh)) * jnp.float32(slope))
        mask_ref[0, :, pl.ds(start, _BT)] = jnp.where(cidx < t_real, mask, 0.0)
        return wb[:, :1]

    jax.lax.fori_loop(0, n_tb, bwd_body, carry0)


def _jnp_mask_impl(Z, b, thresh_mult, slope):
    """Differentiable jnp twin of the kernel (used for VJP: pallas_call has
    no autodiff rule, and the gate should be grad-able with use_pallas on)."""
    from noisereduce_tpu.ops.dsp import ewma_filtfilt, sigmoid

    mag = jnp.abs(Z)
    floor = ewma_filtfilt(mag, b)
    return sigmoid((mag - floor) / floor, -thresh_mult, slope)


def fused_nonstationary_mask(
    Z: jax.Array,
    b: float,
    thresh_mult: float,
    slope: float,
    interpret: bool = False,
) -> jax.Array:
    """Fused |Z| → IIR floor → sigmoid mask, float32, shape-preserving.

    Z: complex64, (..., F, T). Returns float32 mask of the same shape.
    Matches sigmoid(((|Z|-floor)/floor) + (-thresh))*slope) with the jnp
    path (ewma_filtfilt) to float32 accumulation order.

    Differentiable: under grad/vjp the value and gradient come from the jnp
    composition (custom_vjp — Mosaic kernels have no autodiff rule); the
    fused kernel runs on the inference path.

    Intentional divergence on degenerate input: where the IIR floor is
    exactly 0 (an all-zero run of frames — silence), the kernel substitutes
    a safe divisor and yields a finite mask, while the jnp path and the
    reference produce NaN from the 0/0 ratio. Finite-on-silence is the
    better behavior; parity holds on any non-degenerate signal.
    """
    return _fused_mask_cvjp(Z, b, thresh_mult, slope, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _fused_mask_cvjp(Z, b, thresh_mult, slope, interpret):
    batch_shape = Z.shape[:-2]
    F, T = Z.shape[-2], Z.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1

    f_pad = -(-F // _FT) * _FT
    t_pad = -(-T // _BT) * _BT
    n_tb = t_pad // _BT

    # |Z| via jnp.abs (works for complex64 everywhere, unlike real/imag on
    # some TPU runtimes); also accepts a real magnitude array directly
    mag = jnp.abs(Z).reshape(B, F, T).astype(jnp.float32)
    pad = [(0, 0), (0, f_pad - F), (0, t_pad - T)]
    mag = jnp.pad(mag, pad)

    L, d_fwd, d_bwd, a_block = _consts_np(b, _BT)
    lt = jnp.asarray(L.T)
    l_ = jnp.asarray(L)

    kernel = functools.partial(
        _mask_kernel,
        n_tb=n_tb,
        t_real=T,
        b=b,
        a_block=float(a_block),
        thresh=thresh_mult,
        slope=slope,
    )

    tile_spec = pl.BlockSpec(
        (1, _FT, t_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        (_BT, _BT), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    # decay vectors row-replicated to a full (F_TILE, BT) tile: sub-(8,128)
    # slices and (1, BT) operands hit unimplemented TPU lowerings
    vec_spec = pl.BlockSpec(
        (_FT, _BT), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    mask = pl.pallas_call(
        kernel,
        grid=(B, f_pad // _FT),
        in_specs=[tile_spec, mat_spec, mat_spec, vec_spec, vec_spec],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((B, f_pad, t_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_FT, t_pad), jnp.float32),  # mag
            pltpu.VMEM((_FT, t_pad), jnp.float32),  # forward IIR result
        ],
        interpret=interpret,
    )(
        mag,
        lt,
        l_,
        # host-materialized row-replicated decay tiles (a lazy broadcast_to
        # operand feeding pallas hit an unimplemented TPU lowering)
        jnp.asarray(np.ascontiguousarray(np.broadcast_to(d_fwd[None, :], (_FT, _BT)))),
        jnp.asarray(np.ascontiguousarray(np.broadcast_to(d_bwd[None, :], (_FT, _BT)))),
    )
    return mask[:, :F, :T].reshape(batch_shape + (F, T))


def _mask_kernel_tm(
    re_ref, im_ref, l_ref, lt_ref, dfwd_ref, dbwd_ref, mask_ref, mag_ref, y_ref,
    *, n_tb: int, t_real: int, b: float, thresh: float, slope: float,
):
    """Time-major twin of ``_mask_kernel``: one (1, T_PAD, F_TILE) tile.

    The IIR runs along rows (frames) via L @ block matmuls; inputs are the
    split re/im planes (the |Z| fuses in here), so the surrounding pipeline
    never materializes complex64, the magnitude, or any transposes.
    """
    t_pad = mag_ref.shape[0]
    f_tile = mag_ref.shape[1]

    re = re_ref[0]
    im = im_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (t_pad, f_tile), 0)
    mag_ref[...] = jnp.where(row < t_real, jnp.sqrt(re * re + im * im), 0.0)

    d_fwd = dfwd_ref[...]  # (BT, F_TILE), column-replicated decay vectors
    d_bwd = dbwd_ref[...]

    def fwd_body(kb, carry):
        start = pl.multiple_of(kb * _BT, _BT)
        xb = mag_ref[pl.ds(start, _BT), :]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_BT, f_tile), 0) + start
        xb = jnp.where(ridx == 0, xb * jnp.float32(1.0 / b), xb)
        p = jnp.dot(l_ref[...], xb, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        yb = p + carry * d_fwd
        y_ref[pl.ds(start, _BT), :] = yb
        return yb[_BT - 1 :, :]

    carry0 = jnp.zeros((1, f_tile), jnp.float32)
    jax.lax.fori_loop(0, n_tb, fwd_body, carry0)

    def bwd_body(k, carry):
        kb = n_tb - 1 - k
        start = pl.multiple_of(kb * _BT, _BT)
        yb = y_ref[pl.ds(start, _BT), :]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_BT, f_tile), 0) + start
        yb = jnp.where(ridx == t_real - 1, yb * jnp.float32(1.0 / b), yb)
        yb = jnp.where(ridx > t_real - 1, 0.0, yb)
        p = jnp.dot(lt_ref[...], yb, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        wb = p + carry * d_bwd
        mb = mag_ref[pl.ds(start, _BT), :]
        safe_w = jnp.where(wb == 0.0, 1.0, wb)
        ratio = (mb - wb) / safe_w
        mask = jax.nn.sigmoid((ratio - jnp.float32(thresh)) * jnp.float32(slope))
        mask_ref[0, pl.ds(start, _BT), :] = jnp.where(ridx < t_real, mask, 0.0)
        return wb[:1, :]

    jax.lax.fori_loop(0, n_tb, bwd_body, carry0)


def _jnp_mask_impl_tm(re, im, b, thresh_mult, slope):
    from noisereduce_tpu.ops.dsp import ewma_filtfilt, sigmoid

    mag = jnp.sqrt(re * re + im * im)
    floor = ewma_filtfilt(mag, b, axis=-2)
    return sigmoid((mag - floor) / floor, -thresh_mult, slope)


def fused_nonstationary_mask_tm(
    re: jax.Array,
    im: jax.Array,
    b: float,
    thresh_mult: float,
    slope: float,
    interpret: bool = False,
) -> jax.Array:
    """Time-major split-complex fused mask: (re, im) (..., T, F) float32 →
    float32 mask (..., T, F). Same math as ``fused_nonstationary_mask`` with
    |Z| fused in and no layout changes around the kernel. Differentiable
    via custom_vjp (jnp twin under grad). Shares the safe-divide-on-silence
    divergence documented on ``fused_nonstationary_mask``."""
    return _fused_mask_tm_cvjp(re, im, b, thresh_mult, slope, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_mask_tm_cvjp(re, im, b, thresh_mult, slope, interpret):
    batch_shape = re.shape[:-2]
    T, F = re.shape[-2], re.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1

    f_pad = -(-F // _FT) * _FT
    t_pad = -(-T // _BT) * _BT
    n_tb = t_pad // _BT

    pad = [(0, 0), (0, t_pad - T), (0, f_pad - F)]
    re2 = jnp.pad(re.reshape(B, T, F).astype(jnp.float32), pad)
    im2 = jnp.pad(im.reshape(B, T, F).astype(jnp.float32), pad)

    L, d_fwd, d_bwd, _ = _consts_np(b, _BT)

    kernel = functools.partial(
        _mask_kernel_tm,
        n_tb=n_tb,
        t_real=T,
        b=b,
        thresh=thresh_mult,
        slope=slope,
    )
    tile_spec = pl.BlockSpec(
        (1, t_pad, _FT), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec(
        (_BT, _BT), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (_BT, _FT), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    mask = pl.pallas_call(
        kernel,
        grid=(B, f_pad // _FT),
        in_specs=[tile_spec, tile_spec, mat_spec, mat_spec, vec_spec, vec_spec],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_pad, _FT), jnp.float32),  # mag
            pltpu.VMEM((t_pad, _FT), jnp.float32),  # forward IIR result
        ],
        interpret=interpret,
    )(
        re2,
        im2,
        jnp.asarray(L),
        jnp.asarray(L.T),
        jnp.asarray(np.ascontiguousarray(np.broadcast_to(d_fwd[:, None], (_BT, _FT)))),
        jnp.asarray(np.ascontiguousarray(np.broadcast_to(d_bwd[:, None], (_BT, _FT)))),
    )
    return mask[:, :T, :F].reshape(batch_shape + (T, F))


def _fused_mask_tm_fwd(re, im, b, thresh_mult, slope, interpret):
    out, vjp_fn = jax.vjp(
        lambda r, i: _jnp_mask_impl_tm(r, i, b, thresh_mult, slope), re, im
    )
    return out, vjp_fn


def _fused_mask_tm_bwd(b, thresh_mult, slope, interpret, vjp_fn, g):
    return vjp_fn(g)


_fused_mask_tm_cvjp.defvjp(_fused_mask_tm_fwd, _fused_mask_tm_bwd)


def _fused_mask_fwd(Z, b, thresh_mult, slope, interpret):
    # fwd receives the args in their original order; bwd gets the
    # nondiff_argnums values first, then residuals and the cotangent.
    out, vjp_fn = jax.vjp(lambda z: _jnp_mask_impl(z, b, thresh_mult, slope), Z)
    return out, vjp_fn


def _fused_mask_bwd(b, thresh_mult, slope, interpret, vjp_fn, g):
    (dZ,) = vjp_fn(g)
    return (dZ,)


_fused_mask_cvjp.defvjp(_fused_mask_fwd, _fused_mask_bwd)

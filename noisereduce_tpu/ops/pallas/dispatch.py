"""Fused-gate dispatch: pallas_call builders, custom VJPs, entry points.

The scipy-convention engines (stationary / non-stationary reduce_noise)
as single merged Mosaic kernels per (chunk, F-tile) when the widened halo
and VMEM budget allow, else a split two-kernel + banded-matmul pipeline.
See the package docstring (``noisereduce_tpu.ops.pallas``) for the design;
torch-convention (TPUGate) dispatch lives in ``.torch_dispatch``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from noisereduce_tpu.config import Convention, GateConfig
from noisereduce_tpu.ops.pallas.geometry import (
    _CORE,
    _FT,
    _HALO,
    _HIGHEST,
    _MERGED_VMEM_LIMIT,
    _TB,
    _block_dft_consts_np,
    _block_idft_consts_np,
    _direct_dft_consts_np,
    _direct_idft_consts_np,
    _fast_consts_bf16,
    _freq_band_np,
    _geometry,
    _merged_compiler_params,
    _merged_halo,
    _merged_supported,
    _signal_to_blocks,
    _spectra_supported,
    _spectra_vmem_bytes,
    _split_vmem_ok,
    _thr_lane_layout,
    _tile_band_np,
    _tri_norm_np,
)
from noisereduce_tpu.ops.pallas.kernels import (
    _am_kernel,
    _apply_istft_kernel,
    _as_kernel,
    _freq_smooth_blend_phase,
    _spectra_kernel,
)
from noisereduce_tpu.ops.pallas_mask import _consts_np
from noisereduce_tpu.ops.stft import _analysis_window_np, _ola_norm_np

def _merged_gate_from_blocks(
    blocks, cfg, n_samples, interpret, noise_thresh, out_slice=None,
    fast=False, boundary=None,
):
    """Single-kernel twin of ``_fused_gate_from_blocks``: the spectra and
    mask planes live only in VMEM scratch, the frequency smoothing is an
    in-kernel per-tile banded dot (halo widened to n_grad_freq + 2), and the
    only HBM output is the OLA hop-block plane. Bit-compatible with the
    two-kernel path up to MXU summation-order rounding (~1 ulp: the in-tile
    banded dot contracts 128 lanes instead of f_pad)."""
    scfg = cfg.stft
    B = blocks.shape[0]
    smoothing = cfg.smoothing
    n_grad_freq = smoothing[0] if smoothing else 0
    n_grad_time = smoothing[1] if smoothing else 0
    halo = _merged_halo(n_grad_freq)
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = _geometry(
        scfg, n_samples, halo
    )
    f_pad = n_tiles * _FT
    n_tb = t_pad // _TB
    n_bins = scfg.n_bins

    scale = 1.0 / float(_analysis_window_np(scfg).sum())
    post = float(_analysis_window_np(scfg).sum())
    if fast:
        # bf16 fast mode runs the DIRECT windowed-DFT kernels: window,
        # scale/post, and per-shift phases folded into the matrices; the
        # factorized path's twiddle/Hann/Hermitian VPU phases disappear
        # and the r-fold MXU flops are cheap at single-pass bf16.
        c_np, s_np = _direct_dft_consts_np(scfg, n_tiles, halo, scale)
        ci_np, si_np = _direct_idft_consts_np(scfg, n_tiles, halo, post)
        if not interpret:
            c_np, s_np, ci_np, si_np = _fast_consts_bf16(
                c_np, s_np, ci_np, si_np
            )
    else:
        c_np, s_np = _block_dft_consts_np(scfg, n_tiles, halo)
        ci_np, si_np = _block_idft_consts_np(scfg, n_tiles, halo)
    col_dc = halo - 1
    bin0_base = -halo

    vt = tuple(_tri_norm_np(n_grad_time).tolist()) if n_grad_time >= 1 else None
    if n_grad_freq >= 1:
        band_np = _tile_band_np(
            tuple(_tri_norm_np(n_grad_freq).tolist()), n_bins, n_tiles, halo
        )
    else:
        band_np = None

    # fast (bfloat16) mode: every MXU dot runs one bf16 pass (Mosaic
    # DEFAULT) instead of six true-f32 passes; planes/accumulators stay f32
    prec = jax.lax.Precision.DEFAULT if fast else _HIGHEST

    bf16_blocks = blocks.dtype == jnp.bfloat16
    if bf16_blocks:
        # bf16 blocks rely on read-time boundary masking in the direct
        # kernel body; the mask must also cover the un-DMA'd scratch tail
        assert boundary is not None
        assert blocks.shape[1] * hop >= boundary[0] + boundary[1]
        assert blocks.shape[1] % 16 == 0 and blocks.shape[1] <= t_pad + 16
    # bf16 scratch reads use a 16-row lookahead (bf16 sublane tiling)
    extw = 16 if bf16_blocks else ext
    # IIR carry-block size. Widening it on the fast path (384/512-row
    # blocks, 3x fewer serial carry steps) measured NEUTRAL on v5e — the
    # carry chain is already hidden under the pipelined dots — so it stays
    # at _TB; the kernel remains parameterized for future chips.
    tb_iir = _TB
    common = dict(
        n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, ext=extw, t_real=n_frames,
        bin0_base=bin0_base, col_dc=col_dc, n_bins=n_bins, scale=scale,
        core=_FT - 2 * halo, prec=prec, boundary=boundary, direct=fast,
    )
    bk = functools.partial(
        _apply_istft_kernel,
        n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, bin0_base=bin0_base,
        col_dc=col_dc, n_bins=n_bins, post=post, core=_FT - 2 * halo,
        prec=prec, direct=fast,
    )
    # trace-time 1/OLA-envelope plane, applied in kernel B's epilogue
    full_len = win + (n_frames - 1) * hop
    norm_np = _ola_norm_np(scfg, n_frames)
    inv_np = np.ones(t_pad * hop, np.float32)
    inv_np[:full_len] = 1.0 / np.where(
        norm_np > 1e-10, norm_np, 1.0
    ).astype(np.float32)
    inv_np = inv_np.reshape(1, t_pad, hop)
    inv_spec = pl.BlockSpec(
        (1, t_pad, hop), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
    )

    blocks_spec = pl.BlockSpec(memory_space=pl.ANY)
    cmat_spec = pl.BlockSpec(
        (1, c_np.shape[1], _FT), lambda i, j: (j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    idft_spec = pl.BlockSpec(
        (1, ci_np.shape[1], hop), lambda i, j: (j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    band_spec = pl.BlockSpec(
        (1, _FT, _FT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    iirmat_spec = pl.BlockSpec(
        (tb_iir, tb_iir), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (tb_iir, _FT), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, t_pad, hop), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((1, t_pad, _FT), jnp.float32),  # re_w plane
        pltpu.VMEM((1, t_pad, _FT), jnp.float32),  # im_w plane
        pltpu.VMEM((1, t_pad, _FT), jnp.float32),  # mask plane
        pltpu.VMEM((extw, _FT), jnp.float32),      # FB tail, real
        pltpu.VMEM((extw, _FT), jnp.float32),      # FB tail, imag
        pltpu.VMEM((t_pad, _FT), jnp.float32),     # dB / IIR / raw mask
        pltpu.VMEM((t_pad + extw, hop), blocks.dtype),  # hop blocks (DMA'd)
        pltpu.SemaphoreType.DMA(()),
    ]
    if fast:
        # f32 OLA accumulator plane; the bf16 HBM output is written once,
        # in kernel B's last-tile epilogue
        scratch.append(pltpu.VMEM((1, t_pad, hop), jnp.float32))
    out_shape = jax.ShapeDtypeStruct(
        (B, t_pad, hop), jnp.bfloat16 if fast else jnp.float32
    )

    if noise_thresh is None:
        L, d_fwd, d_bwd, _ = _consts_np(cfg.iir_b, tb_iir)
        am = functools.partial(
            _am_kernel, **common,
            b=cfg.iir_b, thresh=cfg.thresh_n_mult_nonstationary,
            slope=cfg.sigmoid_slope_nonstationary, vt=vt, tb_iir=tb_iir,
        )
        fs = functools.partial(
            _freq_smooth_blend_phase, n_tb=n_tb, t_real=n_frames,
            prop=cfg.prop_decrease, prec=prec,
        )

        if band_np is None:
            def kernel(b_ref, c_ref, s_ref, l_ref, lt_ref, df_ref, db_ref,
                       ci_ref, si_ref, inv_ref, out_ref, re_s, im_s, mask_s,
                       tc, ts, y_s, bv, sem, *oacc):
                am(b_ref, c_ref[0], s_ref[0], re_s, im_s, mask_s, tc, ts,
                   y_s, bv, sem, l_ref, lt_ref, df_ref, db_ref)
                fs(mask_s, None)
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   inv=inv_ref, oacc_ref=oacc[0] if oacc else None)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, iirmat_spec,
                        iirmat_spec, vec_spec, vec_spec, idft_spec, idft_spec,
                        inv_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np),
                jnp.asarray(L), jnp.asarray(L.T),
                jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(d_fwd[:, None], (tb_iir, _FT)))),
                jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(d_bwd[:, None], (tb_iir, _FT)))),
                jnp.asarray(ci_np), jnp.asarray(si_np), jnp.asarray(inv_np),
            )
        else:
            def kernel(b_ref, c_ref, s_ref, l_ref, lt_ref, df_ref, db_ref,
                       band_ref, ci_ref, si_ref, inv_ref, out_ref, re_s, im_s,
                       mask_s, tc, ts, y_s, bv, sem, *oacc):
                am(b_ref, c_ref[0], s_ref[0], re_s, im_s, mask_s, tc, ts,
                   y_s, bv, sem, l_ref, lt_ref, df_ref, db_ref)
                fs(mask_s, band_ref[0])
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   inv=inv_ref, oacc_ref=oacc[0] if oacc else None)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, iirmat_spec,
                        iirmat_spec, vec_spec, vec_spec, band_spec,
                        idft_spec, idft_spec, inv_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np),
                jnp.asarray(L), jnp.asarray(L.T),
                jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(d_fwd[:, None], (tb_iir, _FT)))),
                jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(d_bwd[:, None], (tb_iir, _FT)))),
                jnp.asarray(band_np), jnp.asarray(ci_np), jnp.asarray(si_np),
                jnp.asarray(inv_np),
            )
    else:
        thr_tiles, thr_spec = _thr_tiles_and_spec(
            noise_thresh, n_bins, n_tiles, B, halo
        )
        ask = functools.partial(
            _as_kernel, **common,
            top_db=80.0, prop=cfg.prop_decrease, vt=vt,
        )
        fs = functools.partial(
            _freq_smooth_blend_phase, n_tb=n_tb, t_real=n_frames, prop=None,
            prec=prec,
        )

        if band_np is None:
            def kernel(b_ref, c_ref, s_ref, t_ref, ci_ref, si_ref, inv_ref,
                       out_ref, re_s, im_s, mask_s, tc, ts, y_s, bv, sem, *oacc):
                ask(b_ref, c_ref[0], s_ref[0], t_ref[0], re_s, im_s, mask_s,
                    tc, ts, y_s, bv, sem)
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   inv=inv_ref, oacc_ref=oacc[0] if oacc else None)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, thr_spec,
                        idft_spec, idft_spec, inv_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np), thr_tiles,
                jnp.asarray(ci_np), jnp.asarray(si_np), jnp.asarray(inv_np),
            )
        else:
            def kernel(b_ref, c_ref, s_ref, t_ref, band_ref, ci_ref, si_ref,
                       inv_ref, out_ref, re_s, im_s, mask_s, tc, ts, y_s, bv,
                       sem, *oacc):
                ask(b_ref, c_ref[0], s_ref[0], t_ref[0], re_s, im_s, mask_s,
                    tc, ts, y_s, bv, sem)
                fs(mask_s, band_ref[0])
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   inv=inv_ref, oacc_ref=oacc[0] if oacc else None)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, thr_spec,
                        band_spec, idft_spec, idft_spec, inv_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np), thr_tiles,
                jnp.asarray(band_np), jnp.asarray(ci_np), jnp.asarray(si_np),
                jnp.asarray(inv_np),
            )

    out_blocks = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_merged_compiler_params(t_pad, hop),
        interpret=interpret,
    )(*operands)

    return _scipy_istft_tail(
        out_blocks, scfg, n_frames, out_slice, norm_done=True
    )


def _thr_tiles_and_spec(noise_thresh, n_bins, n_tiles, B, halo=_HALO):
    """Threshold operand + BlockSpec for the stationary kernels.

    Shared ``(bins,)`` thresholds become (n_tiles, 8, _FT) tiles indexed by
    the F-tile grid axis alone. Per-row ``(B, bins)`` thresholds (batched
    serving: one set of noise statistics per signal) become
    (B·n_tiles, 8, _FT) with grid row i reading its own tile block — the
    per-cell kernel body is unchanged, so each row's output is bitwise
    what the single-row call produces."""
    thr_tiles = _thr_lane_layout(noise_thresh, n_bins, n_tiles, halo)
    if noise_thresh.ndim == 1:
        spec = pl.BlockSpec(
            (1, 8, _FT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
        )
        return thr_tiles, spec
    assert noise_thresh.ndim == 2 and noise_thresh.shape[0] == B, (
        noise_thresh.shape,
        B,
    )
    thr_tiles = thr_tiles.reshape(B * n_tiles, 8, _FT)
    spec = pl.BlockSpec(
        (1, 8, _FT),
        lambda i, j: (i * n_tiles + j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return thr_tiles, spec


def _scipy_istft_tail(out_blocks, scfg, n_frames, out_slice=None,
                      norm_done=False):
    """Envelope division + scipy edge trim on the OLA hop-block plane, with
    the caller's final sample window folded into the same pass.

    ``out_slice=(off, length)`` selects [off, off+length) of the trimmed
    istft output (position 0 = the chunk's first covered sample) directly
    from the (B, t_pad, hop) plane — one sliced read + fused divide instead
    of a full-length divide pass followed by a separate unaligned
    slice/reshape (measured ~7 ms/960 s on v5e). The slice is clamped to
    the real istft extent; callers zero-fill any shortfall."""
    B, t_pad, hop = out_blocks.shape
    win = scfg.frame_length
    full = win + (n_frames - 1) * hop
    trim = scfg.win_length // 2
    lo, hi = trim, full - trim
    if out_slice is not None:
        off, length = out_slice
        lo = trim + off
        hi = min(lo + length, full - trim)
    y = out_blocks.reshape(B, t_pad * hop)[:, lo:hi]
    if norm_done:  # kernel B's epilogue already divided by the envelope
        return y
    norm = _ola_norm_np(scfg, n_frames)[lo:hi]
    norm = np.where(norm > 1e-10, norm, 1.0)
    return y / jnp.asarray(norm, jnp.float32)





def fused_threshold_supported(cfg: GateConfig, n_samples: int) -> bool:
    """Static eligibility of the fused spectra kernel for the stationary
    noise-threshold statistics (fused_stationary_threshold): the gate's
    structural constraints plus the spectra kernel's OWN VMEM footprint —
    the gate predicate alone admits clip lengths whose threshold pass dies
    at Mosaic compile (round-2 review finding)."""
    scfg = cfg.stft
    if scfg.convention != Convention.SCIPY:
        return False
    win, hop = scfg.frame_length, scfg.hop_length
    if win != scfg.n_fft or win % hop or hop % 128 or win // hop not in (2, 4):
        return False
    n_frames = scfg.n_frames(n_samples)
    t_pad = -(-n_frames // _TB) * _TB
    return _spectra_supported(t_pad, hop)


def fused_gate_supported(cfg: GateConfig, n_samples: int, n_grad_time) -> bool:
    """Static eligibility of the fully fused kernels for this geometry."""
    scfg = cfg.stft
    if scfg.convention != Convention.SCIPY:
        return False
    win, hop = scfg.frame_length, scfg.hop_length
    if win != scfg.n_fft:
        return False  # Hann-in-frequency identity needs win == n_fft
    if win % hop or hop % 128:
        return False  # hop must be lane-aligned and divide the frame
    r = win // hop
    if r not in (2, 4):
        # twiddles must be in {±1, ±i}; r=1 (hop == win) violates COLA —
        # the OLA envelope touches zero and amplifies rounding differences
        return False
    n_frames = scfg.n_frames(n_samples)
    t_pad = -(-n_frames // _TB) * _TB
    ngf = cfg.smoothing[0] if cfg.smoothing else 0
    if not (
        _merged_supported(t_pad, hop, _merged_halo(ngf), scfg.n_bins)
        or _split_vmem_ok(t_pad, hop)
    ):
        return False
    # out-blocks live in (t_pad, hop): the r-1 trailing OLA blocks must fit.
    # (The blockwise time smoothing needs NO margin: its halos clamp inside
    # t_pad and rows past t_real are zero.)
    if t_pad - n_frames < r - 1:
        return False
    if (n_grad_time or 0) > 16:
        return False  # blockwise smoothing halo is 16 rows
    return True


# ---------------------------------------------------------------------------
# The fused gate (custom_vjp: fused kernels as the primal, staged jnp twin
# for the cotangent only — training forward == serving forward, bitwise)
# ---------------------------------------------------------------------------
def fused_gate_nonstationary(
    chunk: jax.Array, cfg: GateConfig, interpret: bool = False
) -> jax.Array:
    """Drop-in fast path for models.spectral_gate.gate_nonstationary on TPU:
    same math (scipy conventions, filtfilt IIR floor, triangular smoothing,
    prop_decrease-after-smoothing order), float32. More accurate than the
    staged TPU path (~1e-6 vs ~1e-3 of a float64 oracle: every kernel dot is
    Precision.HIGHEST, vs XLA HIGH 3xbf16). Caller guarantees
    ``fused_gate_supported``.
    """
    return _fused_gate_cvjp(chunk, cfg, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fused_gate_cvjp(chunk, cfg, interpret):
    return _fused_gate_impl(chunk, cfg, interpret)


def _fused_gate_fwd(chunk, cfg, interpret):
    # Fused-primal: the value under grad IS the inference value (the Mosaic
    # kernels, ~2e-7 of a float64 oracle) — no train/serve divergence. Only
    # the cotangent comes from the staged jnp twin, recomputed in the
    # backward pass (rematerialization: residuals are just the input, not
    # the staged pipeline's intermediates).
    return _fused_gate_impl(chunk, cfg, interpret), chunk


def _fused_gate_bwd(cfg, interpret, chunk, g):
    from noisereduce_tpu.models.spectral_gate import _gate_nonstationary_jnp
    from noisereduce_tpu.ops.precision import cotangent_vjp

    return cotangent_vjp(
        lambda c: _gate_nonstationary_jnp(c, cfg, "matmul"), (chunk,), g
    )


_fused_gate_cvjp.defvjp(_fused_gate_fwd, _fused_gate_bwd)


def fused_gate_stationary(
    chunk: jax.Array,
    noise_thresh: jax.Array,
    cfg: GateConfig,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fast path for models.spectral_gate.gate_stationary on TPU
    (reference stationary.py:83-126: binary dB-threshold mask, blend BEFORE
    smoothing). Caller guarantees ``fused_gate_supported``."""
    return _fused_stat_cvjp(chunk, noise_thresh, cfg, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_stat_cvjp(chunk, noise_thresh, cfg, interpret):
    return _fused_gate_impl(chunk, cfg, interpret, noise_thresh=noise_thresh)


def _fused_stat_fwd(chunk, noise_thresh, cfg, interpret):
    # fused-primal + staged-backward (see _fused_gate_fwd)
    out = _fused_gate_impl(chunk, cfg, interpret, noise_thresh=noise_thresh)
    return out, (chunk, noise_thresh)


def _fused_stat_bwd(cfg, interpret, res, g):
    from noisereduce_tpu.models.spectral_gate import _gate_stationary_jnp

    from noisereduce_tpu.ops.precision import cotangent_vjp

    chunk, noise_thresh = res
    return cotangent_vjp(
        lambda c, t: _gate_stationary_jnp(c, t, cfg, "matmul"),
        (chunk, noise_thresh), g,
    )


_fused_stat_cvjp.defvjp(_fused_stat_fwd, _fused_stat_bwd)


def fused_stationary_threshold(
    y_noise: jax.Array, cfg: GateConfig, interpret: bool = False
) -> jax.Array:
    """Per-frequency stationary dB threshold via the fused STFT kernel
    (mean + std*n_std over time of the noise dB spectrogram,
    stationary.py:67-81; ddof=0). The statistics themselves are tiny XLA
    reductions; the spectra come from the true-f32 kernel so borderline
    threshold compares match the float64 semantics far better than XLA's
    3xbf16 matmuls."""
    scfg = cfg.stft
    n_samples = y_noise.shape[-1]
    re_w, im_w, n_frames, n_tiles = _fused_stft_planes(
        y_noise, scfg, interpret
    )
    # gather the core copy of each bin out of the overlapped tile layout
    n_bins = scfg.n_bins
    g = np.arange(n_bins)
    cols = (g // _CORE) * _FT + (g % _CORE) + _HALO
    re = re_w[..., :n_frames, cols]
    im = im_w[..., :n_frames, cols]
    from noisereduce_tpu.ops.dsp import amp_to_db

    db = amp_to_db(jnp.sqrt(re * re + im * im), top_db=80.0, axis=-2)
    mean = jnp.mean(db, axis=-2)
    std = jnp.std(db, axis=-2)
    return (mean + std * cfg.n_std_thresh_stationary).astype(jnp.float32)


def _fused_stft_planes(x, scfg, interpret):
    """Windowed frame spectra in the overlapped tile layout:
    (..., n) -> re_w, im_w of shape (B, t_pad, f_pad), plus meta."""
    n_samples = x.shape[-1]
    batch_shape = x.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = _geometry(
        scfg, n_samples
    )
    f_pad = n_tiles * _FT
    n_tb = t_pad // _TB
    n_bins = scfg.n_bins

    x2 = x.reshape(B, n_samples).astype(jnp.float32)
    blocks = _signal_to_blocks(x2, scfg, n_blocks, nb_pad, hop)

    c_np, s_np = _block_dft_consts_np(scfg, n_tiles)
    col_dc = _HALO - 1
    scale = (
        1.0 / float(_analysis_window_np(scfg).sum())
        if scfg.convention == Convention.SCIPY
        else 1.0
    )
    sk = functools.partial(
        _spectra_kernel,
        n_tb=n_tb, n_tiles=n_tiles, r=r, ext=ext, bin0_base=-_HALO,
        col_dc=col_dc, n_bins=n_bins, scale=scale,
    )

    def spectra_kernel(b_ref, c_ref, s_ref, re_ref, im_ref, tc, ts, bv, sem, *oacc):
        sk(b_ref, c_ref[0], s_ref[0], re_ref, im_ref, tc, ts, bv, sem)

    plane_spec = pl.BlockSpec(
        (1, t_pad, _FT), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    re_w, im_w = pl.pallas_call(
        spectra_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, hop, _FT), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hop, _FT), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(plane_spec, plane_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ext, _FT), jnp.float32),
            pltpu.VMEM((ext, _FT), jnp.float32),
            pltpu.VMEM((nb_pad, hop), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _MERGED_VMEM_LIMIT,
                max(16 * 1024 * 1024, int(_spectra_vmem_bytes(t_pad, hop) * 1.4)),
            )
        ),
        interpret=interpret,
    )(blocks, jnp.asarray(c_np), jnp.asarray(s_np))
    re_w = re_w.reshape(batch_shape + (t_pad, f_pad))
    im_w = im_w.reshape(batch_shape + (t_pad, f_pad))
    return re_w, im_w, n_frames, n_tiles


def _fused_gate_impl(chunk, cfg, interpret, noise_thresh=None):
    scfg = cfg.stft
    fast = chunk.dtype == jnp.bfloat16  # opt-in bf16 fast mode
    n_samples = chunk.shape[-1]
    batch_shape = chunk.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1

    if noise_thresh is not None and noise_thresh.ndim > 1:
        # per-row thresholds: left-align their batch axes with the chunk's
        # (reduce_noise_batch), then flatten to one row per kernel grid row
        nb = noise_thresh.shape[-1]
        t = noise_thresh.reshape(
            noise_thresh.shape[:-1]
            + (1,) * (len(batch_shape) + 1 - noise_thresh.ndim)
            + (nb,)
        )
        noise_thresh = jnp.broadcast_to(t, batch_shape + (nb,)).reshape(B, nb)

    x = chunk.reshape(B, n_samples).astype(jnp.float32)
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = _geometry(
        scfg, n_samples
    )
    blocks = _signal_to_blocks(x, scfg, n_blocks, nb_pad, hop)

    y = _fused_gate_from_blocks(
        blocks, cfg, n_samples, interpret, noise_thresh,
        out_slice=(0, n_samples), fast=fast,
    )
    # zero-fill back to the chunk length (reference writes the shorter istft
    # into a zeros buffer, nonstationary.py:49,95)
    out_len = y.shape[-1]
    if out_len < n_samples:
        y = jnp.pad(y, [(0, 0), (0, n_samples - out_len)])
    return y.reshape(batch_shape + (n_samples,)).astype(chunk.dtype)


def _fused_gate_from_blocks(
    blocks, cfg, n_samples, interpret, noise_thresh, out_slice=None,
    fast=False, boundary=None,
):
    """Core of the fused scipy-convention gate: pre-built hop blocks
    (B, nb_pad, hop) -> gated signal (B, istft_len) — istft_len =
    (n_frames-1)*hop, the scipy istft's trimmed length whose position 0 is
    the chunk's first sample (``out_slice`` selects a sub-window of that,
    see ``_scipy_istft_tail``). Runs as ONE merged kernel when the widened
    halo and VMEM budget allow (the default geometries), else as the
    two-kernel + banded-matmul pipeline below."""
    scfg = cfg.stft
    B = blocks.shape[0]
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = _geometry(
        scfg, n_samples
    )
    _ngf = cfg.smoothing[0] if cfg.smoothing else 0
    if _merged_supported(t_pad, hop, _merged_halo(_ngf), scfg.n_bins):
        return _merged_gate_from_blocks(
            blocks, cfg, n_samples, interpret, noise_thresh, out_slice, fast,
            boundary,
        )
    f_pad = n_tiles * _FT
    n_tb = t_pad // _TB
    n_bins = scfg.n_bins

    c_np, s_np = _block_dft_consts_np(scfg, n_tiles)
    ci_np, si_np = _block_idft_consts_np(scfg, n_tiles)

    # lanes that hold bins -1 / n_bins (Hermitian-fix targets). bin -1 is
    # lane _HALO-1 of tile 0; bin n_bins sits in the last tile at
    # n_bins - bins(last tile)[0].
    col_dc = _HALO - 1
    bin0_base = -_HALO

    # a half-width of 1 still means a 3-tap kernel — only smoothing=None
    # disables an axis (reference base.py:124-127 / ops.dsp.smooth_mask)
    smoothing = cfg.smoothing
    n_grad_freq = smoothing[0] if smoothing else 0
    n_grad_time = smoothing[1] if smoothing else 0
    vt = tuple(_tri_norm_np(n_grad_time).tolist()) if n_grad_time >= 1 else None

    scale = (
        1.0 / float(_analysis_window_np(scfg).sum())
        if scfg.convention == Convention.SCIPY
        else 1.0
    )
    post = float(_analysis_window_np(scfg).sum()) if (
        scfg.convention == Convention.SCIPY
    ) else 1.0
    # fast (bfloat16) mode: one bf16 MXU pass per dot instead of six
    prec = jax.lax.Precision.DEFAULT if fast else _HIGHEST

    # ---- kernel AM ----------------------------------------------------------
    blocks_spec = pl.BlockSpec(memory_space=pl.ANY)
    cmat_spec = pl.BlockSpec(
        (1, hop, _FT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    plane_spec = pl.BlockSpec(
        (1, t_pad, _FT), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    iirmat_spec = pl.BlockSpec(
        (_TB, _TB), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (_TB, _FT), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )

    out_shapes3 = (
        jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
        jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
        jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
    )
    scratch = [
        pltpu.VMEM((ext, _FT), jnp.float32),    # FB tail, real
        pltpu.VMEM((ext, _FT), jnp.float32),    # FB tail, imag
        pltpu.VMEM((t_pad, _FT), jnp.float32),  # dB / IIR state / raw mask
        pltpu.VMEM((nb_pad, hop), jnp.float32),  # hop blocks (DMA'd per i)
        pltpu.SemaphoreType.DMA(()),
    ]

    if noise_thresh is None:
        L, d_fwd, d_bwd, _ = _consts_np(cfg.iir_b, _TB)
        am = functools.partial(
            _am_kernel,
            n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, ext=ext, t_real=n_frames,
            bin0_base=bin0_base, col_dc=col_dc, n_bins=n_bins, scale=scale,
            b=cfg.iir_b, thresh=cfg.thresh_n_mult_nonstationary,
            slope=cfg.sigmoid_slope_nonstationary, vt=vt, prec=prec,
            boundary=boundary,
        )

        def am_kernel(b_ref, c_ref, s_ref, l_ref, lt_ref, df_ref, db_ref,
                      re_ref, im_ref, mask_ref, tc, ts, y, bv, sem, *oacc):
            am(b_ref, c_ref[0], s_ref[0], re_ref, im_ref, mask_ref, tc, ts, y,
               bv, sem, l_ref, lt_ref, df_ref, db_ref)

        re_w, im_w, mask = pl.pallas_call(
            am_kernel,
            grid=(B, n_tiles),
            in_specs=[blocks_spec, cmat_spec, cmat_spec,
                      iirmat_spec, iirmat_spec, vec_spec, vec_spec],
            out_specs=(plane_spec, plane_spec, plane_spec),
            out_shape=out_shapes3,
            scratch_shapes=scratch,
            interpret=interpret,
        )(
            blocks, jnp.asarray(c_np), jnp.asarray(s_np),
            jnp.asarray(L), jnp.asarray(L.T),
            jnp.asarray(np.ascontiguousarray(np.broadcast_to(d_fwd[:, None], (_TB, _FT)))),
            jnp.asarray(np.ascontiguousarray(np.broadcast_to(d_bwd[:, None], (_TB, _FT)))),
        )
    else:
        # stationary: per-bin dB threshold, gathered into the overlapped
        # tile layout, row-replicated to a full (8, _FT) tile per tile
        # (per-row (B, bins) thresholds get a tile block per grid row)
        thr_tiles, thr_spec = _thr_tiles_and_spec(
            noise_thresh, n_bins, n_tiles, B
        )
        ask = functools.partial(
            _as_kernel,
            n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, ext=ext, t_real=n_frames,
            bin0_base=bin0_base, col_dc=col_dc, n_bins=n_bins, scale=scale,
            top_db=80.0, prop=cfg.prop_decrease, vt=vt, prec=prec,
            boundary=boundary,
        )

        def as_kernel(b_ref, c_ref, s_ref, t_ref, re_ref, im_ref, mask_ref,
                      tc, ts, y, bv, sem, *oacc):
            ask(b_ref, c_ref[0], s_ref[0], t_ref[0], re_ref, im_ref, mask_ref,
                tc, ts, y, bv, sem)

        re_w, im_w, mask = pl.pallas_call(
            as_kernel,
            grid=(B, n_tiles),
            in_specs=[blocks_spec, cmat_spec, cmat_spec, thr_spec],
            out_specs=(plane_spec, plane_spec, plane_spec),
            out_shape=out_shapes3,
            scratch_shapes=scratch,
            interpret=interpret,
        )(blocks, jnp.asarray(c_np), jnp.asarray(s_np), thr_tiles)

    # ---- XLA: frequency smoothing (banded matmul) + blend -------------------
    if n_grad_freq >= 1:
        w = jnp.asarray(_freq_band_np(n_grad_freq, n_bins, n_tiles))
        mask = jnp.matmul(
            mask, w, preferred_element_type=jnp.float32, precision=prec
        )
    if noise_thresh is None:
        # non-stationary blends AFTER smoothing (nonstationary.py:78-84);
        # the stationary blend already happened in-kernel BEFORE smoothing
        # (stationary.py:108-114)
        mask = mask * jnp.float32(cfg.prop_decrease) + jnp.float32(
            1.0 - cfg.prop_decrease
        )
        # the blend puts (1 - prop) into padded frame rows too; re-zero them
        # so garbage frames (real hop-blocks beyond the last frame) stay out
        # of the OLA (the reference has no frames there at all)
        if n_frames < t_pad:
            row = jnp.arange(t_pad, dtype=jnp.int32)[None, :, None]
            mask = jnp.where(row < n_frames, mask, 0.0)

    # ---- kernel B ------------------------------------------------------------
    idft_spec = pl.BlockSpec(
        (1, _FT, hop), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, t_pad, hop), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bk = functools.partial(
        _apply_istft_kernel,
        n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, bin0_base=bin0_base,
        col_dc=col_dc, n_bins=n_bins, post=post, prec=prec,
    )

    def istft_kernel(re_ref, im_ref, m_ref, ci_ref, si_ref, out_ref):
        bk(re_ref, im_ref, m_ref, ci_ref[0], si_ref[0], out_ref)

    out_blocks = pl.pallas_call(
        istft_kernel,
        grid=(B, n_tiles),
        in_specs=[plane_spec, plane_spec, plane_spec, idft_spec, idft_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, t_pad, hop), jnp.float32),
        interpret=interpret,
    )(re_w, im_w, mask, jnp.asarray(ci_np), jnp.asarray(si_np))

    # ---- XLA: envelope division + scipy edge trim ----------------------------
    return _scipy_istft_tail(out_blocks, scfg, n_frames, out_slice)


def fused_gate_chunked(
    y2d, cfg, chunk_size: int, padding: int, noise_thresh=None,
    interpret: bool = False, mesh=None, axis_name: str = "chunks",
    max_parallel_chunks: int = 0, flat_output: bool = True,
):
    """The whole chunked scipy-engine body — extract + gate + assemble
    (reference base.py:144-226 semantics) — with the hop blocks gathered
    straight from the padded signal: the (channels, n_chunks, view) chunk
    views are never materialized, and the assembled output slices the
    kernels' OLA result directly.

    Chunk i's block rows are exactly samples [i*chunk_size, i*chunk_size +
    n_blocks*hop) of the signal padded left by padding + win//2 (the halo
    zero-fill of base.py:130-142 composed with scipy stft's boundary
    extension), because n_blocks*hop <= view + 2*(win//2) always. The
    output's position 0 is the chunk view's first sample (scipy's istft
    trim equals the boundary pad), so the assembled core is rows
    [padding, padding + chunk_size).

    ``mesh`` shards the chunk axis over devices with ``jax.shard_map`` —
    each device runs the SAME fused kernels on its local chunks (halo
    recompute, zero collectives; the multi-chip twin of the reference's
    joblib pool, base.py:206-216). ``max_parallel_chunks`` bounds the
    simultaneously-resident chunk count (per device under a mesh) via an
    in-graph ``lax.map`` over chunk groups. Per-chunk numerics are
    identical either way — chunks are independent by construction.

    ``flat_output=False`` returns the raw (channels, k_pad, chunk_size)
    chunk cores instead of the flattened signal: the device-side flatten
    of 600000-sample rows is a tile-misaligned relayout XLA lowers as a
    per-chunk loop (~6.5 ms/960 s measured on v5e), while the same
    flatten of the host copy is a free view — callers that leave the
    device right after (the public API, bench) should take the cores.
    """
    return _fused_chunked_cvjp(
        y2d, noise_thresh, cfg, chunk_size, padding, interpret, mesh,
        axis_name, max_parallel_chunks, flat_output,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _fused_chunked_cvjp(
    y2d, noise_thresh, cfg, chunk_size, padding, interpret, mesh, axis_name,
    mpc, flat_output=True,
):
    return _fused_chunked_impl(
        y2d, noise_thresh, cfg, chunk_size, padding, interpret, mesh,
        axis_name, mpc, flat_output,
    )


def _fused_chunked_fwd(
    y2d, noise_thresh, cfg, chunk_size, padding, interpret, mesh, axis_name,
    mpc, flat_output=True,
):
    # fused-primal + staged-backward (see _fused_gate_fwd)
    out = _fused_chunked_impl(
        y2d, noise_thresh, cfg, chunk_size, padding, interpret, mesh,
        axis_name, mpc, flat_output,
    )
    return out, (y2d, noise_thresh)


def _fused_chunked_bwd(
    cfg, chunk_size, padding, interpret, mesh, axis_name, mpc, flat_output,
    res, g
):
    from noisereduce_tpu.models.spectral_gate import (
        _gate_nonstationary_jnp, _gate_stationary_jnp,
    )
    from noisereduce_tpu.parallel.chunking import process_chunked

    y2d, noise_thresh = res
    if not flat_output:
        # cotangent arrives in (ch, k_pad, chunk_size) core form; the staged
        # twin computes on the flat signal
        ch, n = y2d.shape
        g = g.reshape(ch, -1)[:, :n]
    from noisereduce_tpu.ops.precision import cotangent_vjp

    if noise_thresh is None:
        def run(y):
            return process_chunked(
                lambda c: _gate_nonstationary_jnp(c, cfg, "matmul"),
                y, chunk_size, padding, mesh=mesh, axis_name=axis_name,
                max_parallel_chunks=mpc,
            )

        return (cotangent_vjp(run, (y2d,), g)[0], None)

    def run(y, t):
        return process_chunked(
            lambda c, tt: _gate_stationary_jnp(c, tt, cfg, "matmul"),
            y, chunk_size, padding, mesh=mesh, axis_name=axis_name,
            extra=(t,), max_parallel_chunks=mpc,
        )

    return cotangent_vjp(run, (y2d, noise_thresh), g)


_fused_chunked_cvjp.defvjp(_fused_chunked_fwd, _fused_chunked_bwd)


def _fused_chunked_impl(
    y2d, noise_thresh, cfg, chunk_size, padding, interpret, mesh=None,
    axis_name: str = "chunks", mpc: int = 0, flat_output: bool = True,
):
    scfg = cfg.stft
    fast = y2d.dtype == jnp.bfloat16  # opt-in bf16 fast mode
    ch, n = y2d.shape
    k = (n - 1) // chunk_size + 1
    view = chunk_size + 2 * padding
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = _geometry(
        scfg, view
    )
    need = n_blocks * hop
    bpad = scfg.boundary_pad
    left = padding + bpad
    _ngf = cfg.smoothing[0] if cfg.smoothing else 0
    # bf16 fast mode on the merged kernel ships the hop blocks in bf16 —
    # HALF the XLA gather traffic — and the direct kernel body upcasts and
    # boundary-masks at read time (the boundary must fit the raw rows)
    bf16_blocks = (
        fast
        and bpad % hop == 0
        and need >= bpad + view
        and _merged_supported(t_pad, hop, _merged_halo(_ngf), scfg.n_bins)
    )
    # chunk counts pad up: to the mesh axis with all-zero chunks (sliced
    # away from the assembled output, like parallel.chunking), and per
    # device to a multiple of the max_parallel_chunks group size
    k_pad = k
    n_dev = 1
    if mesh is not None:
        n_dev = mesh.shape[axis_name]
        k_pad = -(-k // n_dev) * n_dev
    k_local = k_pad // n_dev
    if mpc and k_local > mpc:
        n_groups = -(-k_local // mpc)
        k_group = mpc
    else:
        n_groups = 1
        k_group = k_local
    k_local_pad = n_groups * k_group
    # the last device's last group may slice past the signal: zero-pad the
    # signal so every slice reads valid (zero) memory
    max_chunk = (n_dev - 1) * k_local + (k_local_pad - 1)
    right = max(0, max_chunk * chunk_size + need - n - left)
    ysrc = y2d if bf16_blocks else y2d.astype(jnp.float32)
    ypad = jnp.pad(ysrc, [(0, 0), (left, right)])
    # Phase-aligned gather: chunk i's slice offset is base + i*chunk_size,
    # and chunk_size % 128 == 64 for the reference default (600000), so odd
    # chunks are 64-lane misaligned — XLA lowers those per-chunk copies
    # ~13x off the HBM roofline (measured ~6.3 ms/960 s; one big misaligned
    # pass is near-roofline, many small ones are not). A SECOND padded copy
    # shifted 64 lanes left makes every odd chunk's slice 128-aligned.
    # Bit-identical: the slices read the same elements. Needs statically
    # known chunk parity: always true single-launch (base == 0); under
    # mesh/groups true when the per-device / per-group chunk counts are
    # even (base is then an even multiple of chunk_size).
    parity_static = (mesh is None or k_local % 2 == 0) and (
        n_groups == 1 or k_group % 2 == 0
    )
    two_phase = chunk_size % 128 == 64 and parity_static and left >= 64
    if two_phase:
        ypad_phases = (ypad, jnp.pad(ysrc, [(0, 0), (left - 64, right + 64)]))
    else:
        ypad_phases = (ypad,)

    def gate_segments(seg, thr):
        """Raw signal segments -> (ch, kk, chunk_size) gated cores — the
        per-chunk kernel body shared by the single-launch, grouped-scan,
        and mesh-sharded paths. ``seg`` arrives pre-split into hop blocks
        (ch, kk, n_blocks, hop) when the boundary pad is hop-aligned (see
        build_and_gate), else flat (ch, kk, need)."""
        cch, kk = seg.shape[0], seg.shape[1]
        if thr is not None and thr.ndim == 2:
            # per-row thresholds (batched serving): every chunk of signal
            # row c gates against row c's statistics
            thr = jnp.broadcast_to(
                thr[:, None, :], (cch, kk, thr.shape[-1])
            ).reshape(cch * kk, thr.shape[-1])
        if bpad % hop == 0:
            # scipy's per-chunk boundary zeros (positions outside
            # [bpad, bpad + view)) and the row padding are applied by the
            # kernel right after its DMA (f32: zeroing stores; bf16:
            # read-time masking) — XLA ships the raw rows, padded only to
            # the row alignment Mosaic's DMA requires (8 f32 / 16 bf16)
            boundary = (bpad, view)
            rmult = 16 if bf16_blocks else 8
            n8 = -(-n_blocks // rmult) * rmult
            blocks = jnp.pad(
                seg.reshape(cch * kk, n_blocks, hop),
                [(0, 0), (0, n8 - n_blocks), (0, 0)],
            )
        else:  # unreachable for supported geometries (r in {2, 4})
            boundary = None
            pos = jnp.arange(need, dtype=jnp.int32)
            seg = jnp.where((pos >= bpad) & (pos < bpad + view), seg, 0.0)
            blocks = seg.reshape(cch * kk, n_blocks, hop)
            blocks = jnp.pad(blocks, [(0, 0), (0, nb_pad - n_blocks), (0, 0)])

        core = _fused_gate_from_blocks(
            blocks, cfg, view, interpret, thr,
            out_slice=(padding, chunk_size), fast=fast, boundary=boundary,
        )
        if core.shape[-1] < chunk_size:  # tiny paddings: istft tail zero-fill
            core = jnp.pad(core, [(0, 0), (0, chunk_size - core.shape[-1])])
        return core.reshape(cch, kk, chunk_size)

    def build_and_gate(ypads, base, thr):
        # k_group overlapping dynamic-slices of the padded signal; ``base``
        # is the first chunk's sample offset (static 0 on the single-launch
        # path). Odd chunks slice the 64-shifted phase copy so every copy
        # is 128-lane aligned (see two_phase above). (A phase-aligned
        # whole-row jnp.take gather and a vmapped large-slice gather were
        # both tried and are bit-identical but SLOWER on v5e — XLA lowers
        # row gathers poorly; the strided slices fuse into the stack.)
        parts = [
            jax.lax.dynamic_slice_in_dim(
                ypads[i % 2 if two_phase else 0],
                base + i * chunk_size - (64 * (i % 2) if two_phase else 0),
                need,
                axis=-1,
            )
            for i in range(k_group)
        ]
        if bpad % hop == 0:
            # split each slice into its hop blocks BEFORE the stack: XLA
            # fuses this relayout into the per-chunk slice copies, while
            # reshaping the stacked (ch, kk, need) array is a separate
            # relayout pass at serving batch shapes (device-traced 1.14 ->
            # 0.80 ms on the 32 x 15 s row; headline shape unchanged).
            # Bit-identical: same elements, same order.
            parts = [p.reshape(p.shape[:-1] + (n_blocks, hop)) for p in parts]
        return gate_segments(jnp.stack(parts, axis=1), thr)

    def local_fn(ypads, thr, base0):
        # bound resident chunks (per device under a mesh): scan groups of
        # mpc chunks with one compiled body, gathering each group's
        # segments inside the scan — HBM holds the signal plus ONE group's
        # views (VERDICT r3 #3 composition)
        if n_groups == 1:
            out = build_and_gate(ypads, base0, thr)
        else:
            bases = base0 + jnp.arange(n_groups, dtype=jnp.int32) * (
                k_group * chunk_size
            )
            out = jax.lax.map(lambda b: build_and_gate(ypads, b, thr), bases)
            out = jnp.moveaxis(out, 0, 1).reshape(
                ch, n_groups * k_group, chunk_size
            )
        return out[:, :k_local]

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        # the signal is replicated; each device gathers and gates only its
        # own chunk range (halo recompute — zero collectives)
        out_spec = P(None, axis_name, None)
        stride = k_local * chunk_size
        n_ph = len(ypad_phases)

        def body(*args):
            ypads, thr = args[:n_ph], (args[n_ph] if len(args) > n_ph else None)
            base0 = jax.lax.axis_index(axis_name) * stride
            return local_fn(ypads, thr, base0)

        if noise_thresh is None:
            core = jax.shard_map(
                body, mesh=mesh, in_specs=(P(),) * n_ph,
                out_specs=out_spec, check_vma=False,
            )(*ypad_phases)
        else:
            core = jax.shard_map(
                body, mesh=mesh, in_specs=(P(),) * n_ph + (P(),),
                out_specs=out_spec, check_vma=False,
            )(*ypad_phases, noise_thresh)
    else:
        core = local_fn(ypad_phases, noise_thresh, 0)

    if flat_output:
        out = core.reshape(ch, k_pad * chunk_size)[:, :n]
        return out.astype(y2d.dtype)
    return core.astype(y2d.dtype)

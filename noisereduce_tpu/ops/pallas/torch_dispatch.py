"""Torch-convention (TPUGate) fused dispatch.

Same kernel set as the scipy dispatch (``.dispatch``) under torch
stft/istft conventions: f32-window spectra, the moving-average or
self/clip dB-stats mask, SVD rank-1 smoothing factors, and torch's
natural istft tail. See reference torchgate/torchgate.py:200-264.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from noisereduce_tpu.config import Convention
from noisereduce_tpu.ops.pallas.dispatch import _fused_stft_planes
from noisereduce_tpu.ops.pallas.geometry import (
    _CORE,
    _FT,
    _HALO,
    _HIGHEST,
    _TB,
    _band_from_taps_np,
    _block_dft_consts_np,
    _block_idft_consts_np,
    _direct_dft_consts_np,
    _direct_idft_consts_np,
    _fast_consts_bf16,
    _geometry,
    _merged_compiler_params,
    _merged_supported,
    _movemean_band_np,
    _signal_to_blocks,
    _spectra_supported,
    _split_vmem_ok,
    _thr_lane_layout,
    _tile_band_np,
    _torch_merged_halo,
)
from noisereduce_tpu.ops.pallas.kernels import (
    _apply_istft_kernel,
    _as_kernel,
    _freq_smooth_blend_phase,
    _mt_kernel,
)
from noisereduce_tpu.ops.pallas_mask import max_frames_for_vmem
from noisereduce_tpu.ops.stft import _ola_norm_np

# ---------------------------------------------------------------------------
# Torch-convention (TPUGate) fused path
# ---------------------------------------------------------------------------
def fused_tpugate_supported(gate, n_samples: int, xn_samples=None) -> bool:
    """Static eligibility of the fused kernels for a TPUGate call.

    Same structural constraints as the scipy path, plus: TorchGate's window
    must span the FFT (win == n_fft — the centered zero-padded window would
    break the Hann-in-frequency identity), and the moving-average floor must
    fit one block (n_movemean <= 128).

    Note on the window: the reference builds its Hann in float32
    (torch.hann_window default); the kernels use the exact periodic Hann as
    a frequency stencil. The difference is <= 1 ulp of the window (~6e-8 of
    the spectra) — far below the torch path's own f32 mask-pipeline noise
    (tests/test_reduce_noise_parity.py).
    """
    scfg = gate.stft_config
    if scfg.convention != Convention.TORCH:
        return False
    if scfg.win_length != scfg.n_fft:
        return False
    win, hop = scfg.frame_length, scfg.hop_length
    if win % hop or hop % 128:
        return False
    r = win // hop
    if r not in (2, 4):
        return False
    smoothing = gate.smoothing
    if (smoothing[1] if smoothing else 0) > 16:
        return False
    if gate.nonstationary and not (
        1 <= gate.n_movemean_nonstationary <= 4 * _TB
    ):
        return False  # moving-average window: <= 2 halo blocks per side
    if smoothing is not None:
        from noisereduce_tpu.ops.dsp import _torchgate_kernel_svd_np

        rows_np, _ = _torchgate_kernel_svd_np(*smoothing)
        freq_taps = tuple(np.asarray(rows_np[0], np.float64).tolist())
    else:
        freq_taps = None
    lengths = [n_samples] + ([xn_samples] if xn_samples else [])
    for pos, ns in enumerate(lengths):
        nf = scfg.n_frames(ns)
        tp = -(-nf // _TB) * _TB
        if nf > max_frames_for_vmem() or tp - nf < r - 1:
            return False
        # some kernel variant must actually fit VMEM, else _fused_torch_impl
        # dies at Mosaic compile instead of taking the jnp fallback. The
        # signal runs the merged/split gate; the noise clip runs only the
        # spectra kernel (_torch_threshold_stats), which has its own
        # (smaller) footprint and raised scoped limit.
        if pos == 0 and not (
            _merged_supported(tp, hop, _torch_merged_halo(freq_taps), scfg.n_bins)
            or _split_vmem_ok(tp, hop)
        ):
            return False
        if pos == 1 and not _spectra_supported(tp, hop):
            return False
    return True


def fused_tpugate(x, xn, gate, interpret: bool = False):
    """Drop-in fast path for TPUGate.__call__ on TPU (reference
    torchgate/torchgate.py:200-264): torch stft/istft conventions, the
    moving-average or dB-stats mask, and the SVD rank-1 factorization of
    the f32-rounded smoothing kernel (residual ~1e-8, orders below the
    reference's own oneDNN f32 conv noise). Returns torch.istft's natural
    (n_frames-1)*hop length. Caller guarantees ``fused_tpugate_supported``.
    """
    if xn is None:
        return _fused_tpugate_cvjp1(x, gate, interpret)
    return _fused_tpugate_cvjp2(x, xn, gate, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fused_tpugate_cvjp1(x, gate, interpret):
    return _fused_torch_impl(x, None, gate, interpret)


def _fused_tpugate1_fwd(x, gate, interpret):
    # fused-primal + staged-backward (see dispatch._fused_gate_fwd)
    return _fused_torch_impl(x, None, gate, interpret), x


def _fused_tpugate1_bwd(gate, interpret, x, g):
    from noisereduce_tpu.ops.precision import cotangent_vjp

    return cotangent_vjp(lambda a: gate._call_jnp(a, None, "matmul"), (x,), g)


_fused_tpugate_cvjp1.defvjp(_fused_tpugate1_fwd, _fused_tpugate1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_tpugate_cvjp2(x, xn, gate, interpret):
    return _fused_torch_impl(x, xn, gate, interpret)


def _fused_tpugate2_fwd(x, xn, gate, interpret):
    # fused-primal + staged-backward (see dispatch._fused_gate_fwd)
    return _fused_torch_impl(x, xn, gate, interpret), (x, xn)


def _fused_tpugate2_bwd(gate, interpret, res, g):
    from noisereduce_tpu.ops.precision import cotangent_vjp

    x, xn = res
    return cotangent_vjp(
        lambda a, b: gate._call_jnp(a, b, "matmul"), (x, xn), g
    )


_fused_tpugate_cvjp2.defvjp(_fused_tpugate2_fwd, _fused_tpugate2_bwd)


def _torch_threshold_stats(xn2, gate, interpret):
    """(batch_n, n_bins) stationary threshold from a noise clip's fused
    spectra: amp_to_db(top_db=40) then mean + std(ddof=1)*n_std over frames
    (torchgate.py:126-165)."""
    scfg = gate.stft_config
    re_w, im_w, n_frames, n_tiles = _fused_stft_planes(xn2, scfg, interpret)
    n_bins = scfg.n_bins
    g = np.arange(n_bins)
    cols = (g // _CORE) * _FT + (g % _CORE) + _HALO
    re = re_w[..., :n_frames, cols]
    im = im_w[..., :n_frames, cols]
    from noisereduce_tpu.ops.dsp import amp_to_db

    db = amp_to_db(jnp.sqrt(re * re + im * im), top_db=40.0, axis=-2)
    mean = jnp.mean(db, axis=-2)
    n = db.shape[-2]
    var = jnp.var(db, axis=-2) * (n / max(n - 1, 1))
    return (mean + jnp.sqrt(var) * gate.n_std_thresh_stationary).astype(
        jnp.float32
    )





def _merged_torch_impl(x, xn, gate, interpret, freq_taps, vt):
    """Single-kernel twin of the split torch path (mt/as kernel + XLA banded
    matmul + kernel B): spectra and mask planes stay in VMEM scratch, the
    frequency smoothing is an in-tile banded dot over a widened halo, and
    the only HBM output is the OLA hop-block plane. Same math and quirk
    order as the split path (in-kernel blend BEFORE smoothing,
    torchgate.py:241-249; torch istft tail)."""
    scfg = gate.stft_config
    fast = x.dtype == jnp.bfloat16
    prec = jax.lax.Precision.DEFAULT if fast else _HIGHEST
    n_samples = x.shape[-1]
    B = x.shape[0]
    halo = _torch_merged_halo(freq_taps)
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = _geometry(
        scfg, n_samples, halo
    )
    n_tb = t_pad // _TB
    n_bins = scfg.n_bins

    x2 = x.reshape(B, n_samples).astype(jnp.float32)
    blocks = _signal_to_blocks(x2, scfg, n_blocks, nb_pad, hop)

    if fast:
        # bf16 fast mode: direct windowed-DFT kernels (see dispatch) — and
        # the torch f32-quantized Hann is baked EXACTLY into the matrices
        # (_analysis_window_np honors quantize_window_f32), closing the
        # factorized path's <=1-ulp window approximation too.
        c_np, s_np = _direct_dft_consts_np(scfg, n_tiles, halo, 1.0)
        ci_np, si_np = _direct_idft_consts_np(scfg, n_tiles, halo, 1.0)
        if not interpret:
            c_np, s_np, ci_np, si_np = _fast_consts_bf16(
                c_np, s_np, ci_np, si_np
            )
    else:
        c_np, s_np = _block_dft_consts_np(scfg, n_tiles, halo)
        ci_np, si_np = _block_idft_consts_np(scfg, n_tiles, halo)
    col_dc = halo - 1
    bin0_base = -halo
    band_np = (
        None if freq_taps is None
        else _tile_band_np(freq_taps, n_bins, n_tiles, halo)
    )

    common = dict(
        n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, ext=ext, t_real=n_frames,
        bin0_base=bin0_base, col_dc=col_dc, n_bins=n_bins, scale=1.0,
        core=_FT - 2 * halo, prec=prec, direct=fast,
    )
    bk = functools.partial(
        _apply_istft_kernel,
        n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, bin0_base=bin0_base,
        col_dc=col_dc, n_bins=n_bins, post=1.0, core=_FT - 2 * halo,
        prec=prec, direct=fast,
    )
    fs = functools.partial(
        _freq_smooth_blend_phase, n_tb=n_tb, t_real=n_frames, prop=None,
        prec=prec,
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
    out_spec = pl.BlockSpec(
        (1, t_pad, hop), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((1, t_pad, _FT), jnp.float32),  # re_w plane
        pltpu.VMEM((1, t_pad, _FT), jnp.float32),  # im_w plane
        pltpu.VMEM((1, t_pad, _FT), jnp.float32),  # mask plane
        pltpu.VMEM((ext, _FT), jnp.float32),       # FB tail, real
        pltpu.VMEM((ext, _FT), jnp.float32),       # FB tail, imag
        pltpu.VMEM((t_pad, _FT), jnp.float32),     # mag / dB / staging
        pltpu.VMEM((nb_pad, hop), jnp.float32),    # hop blocks (DMA'd per i)
        pltpu.SemaphoreType.DMA(()),
    ]
    if fast:
        # f32 OLA accumulator plane; the bf16 HBM output is written once,
        # in kernel B's last-tile epilogue
        scratch.append(pltpu.VMEM((1, t_pad, hop), jnp.float32))
    out_shape = jax.ShapeDtypeStruct(
        (B, t_pad, hop), jnp.bfloat16 if fast else jnp.float32
    )

    if gate.nonstationary:
        ma_np = _movemean_band_np(gate.n_movemean_nonstationary)
        ma_spec = pl.BlockSpec(
            ma_np.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
        )
        mt = functools.partial(
            _mt_kernel, **common,
            n_thresh=gate.n_thresh_nonstationary,
            temp=gate.temp_coeff_nonstationary,
            prop=gate.prop_decrease, vt=vt,
        )

        if band_np is None:
            def kernel(b_ref, c_ref, s_ref, ma_ref, ci_ref, si_ref, out_ref,
                       re_s, im_s, mask_s, tc, ts, y_s, bv, sem, *oacc):
                mt(b_ref, c_ref[0], s_ref[0], ma_ref, re_s, im_s, mask_s,
                   tc, ts, y_s, bv, sem)
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   oacc_ref=oacc[0] if oacc else None)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, ma_spec,
                        idft_spec, idft_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np),
                jnp.asarray(ma_np), jnp.asarray(ci_np), jnp.asarray(si_np),
            )
        else:
            def kernel(b_ref, c_ref, s_ref, ma_ref, band_ref, ci_ref, si_ref,
                       out_ref, re_s, im_s, mask_s, tc, ts, y_s, bv, sem, *oacc):
                mt(b_ref, c_ref[0], s_ref[0], ma_ref, re_s, im_s, mask_s,
                   tc, ts, y_s, bv, sem)
                fs(mask_s, band_ref[0])
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   oacc_ref=oacc[0] if oacc else None)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, ma_spec, band_spec,
                        idft_spec, idft_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np),
                jnp.asarray(ma_np), jnp.asarray(band_np),
                jnp.asarray(ci_np), jnp.asarray(si_np),
            )
    else:
        self_stats = xn is None
        if self_stats:
            thr_tiles = jnp.zeros((1, n_tiles, 8, _FT), jnp.float32)
            reps = B
        else:
            xn2 = xn if xn.ndim == 2 else xn[None]
            bn = xn2.shape[0]
            reps = B // bn
            thr = _torch_threshold_stats(
                xn2.astype(jnp.float32), gate, interpret
            )  # (bn, n_bins)
            thr_tiles = _thr_lane_layout(thr, n_bins, n_tiles, halo)
        thr_spec = pl.BlockSpec(
            (1, 1, 8, _FT),
            lambda i, j: (i // reps, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        ask = functools.partial(
            _as_kernel, **common,
            top_db=40.0, prop=gate.prop_decrease, vt=vt,
            self_stats=self_stats, n_std=gate.n_std_thresh_stationary,
        )

        if band_np is None:
            def kernel(b_ref, c_ref, s_ref, t_ref, ci_ref, si_ref, out_ref,
                       re_s, im_s, mask_s, tc, ts, y_s, bv, sem, *oacc):
                ask(b_ref, c_ref[0], s_ref[0], t_ref[0, 0], re_s, im_s,
                    mask_s, tc, ts, y_s, bv, sem)
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   oacc_ref=oacc[0] if oacc else None)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, thr_spec,
                        idft_spec, idft_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np), thr_tiles,
                jnp.asarray(ci_np), jnp.asarray(si_np),
            )
        else:
            def kernel(b_ref, c_ref, s_ref, t_ref, band_ref, ci_ref, si_ref,
                       out_ref, re_s, im_s, mask_s, tc, ts, y_s, bv, sem, *oacc):
                ask(b_ref, c_ref[0], s_ref[0], t_ref[0, 0], re_s, im_s,
                    mask_s, tc, ts, y_s, bv, sem)
                fs(mask_s, band_ref[0])
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   oacc_ref=oacc[0] if oacc else None)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, thr_spec,
                        band_spec, idft_spec, idft_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np), thr_tiles,
                jnp.asarray(band_np), jnp.asarray(ci_np), jnp.asarray(si_np),
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

    # ---- XLA: torch istft tail: trim n_fft//2, natural length, envelope ------
    full = win + (n_frames - 1) * hop
    y = out_blocks.reshape(B, t_pad * hop)[:, :full]
    trim = scfg.n_fft // 2
    out_len = (n_frames - 1) * hop
    y = y[:, trim : trim + out_len]
    norm = _ola_norm_np(scfg, n_frames)[trim : trim + out_len]
    norm = np.where(norm > 1e-11, norm, 1.0)
    y = y / jnp.asarray(norm, jnp.float32)
    return y.astype(x.dtype)


def _fused_torch_impl(x, xn, gate, interpret):
    scfg = gate.stft_config
    fast = x.dtype == jnp.bfloat16  # opt-in bf16 fast mode
    prec = jax.lax.Precision.DEFAULT if fast else _HIGHEST
    n_samples = x.shape[-1]
    B = x.shape[0]  # TPUGate contract: (batch, signal_length)
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = _geometry(
        scfg, n_samples
    )
    f_pad = n_tiles * _FT
    n_tb = t_pad // _TB
    n_bins = scfg.n_bins

    # SVD rank-1 factors of the reference's f32-rounded smoothing kernel
    # (ops/dsp._torchgate_kernel_svd_np; trailing ranks are ~1e-8 rounding
    # noise). rows[0] = sigma0*u0 (freq taps), cols[0] = v0 (time taps).
    smoothing = gate.smoothing
    if smoothing is not None:
        from noisereduce_tpu.ops.dsp import _torchgate_kernel_svd_np

        rows_np, cols_np = _torchgate_kernel_svd_np(*smoothing)
        freq_taps = tuple(np.asarray(rows_np[0], np.float64).tolist())
        vt = tuple(np.asarray(cols_np[0], np.float64).tolist())
    else:
        freq_taps = None
        vt = None

    if _merged_supported(t_pad, hop, _torch_merged_halo(freq_taps), scfg.n_bins):
        return _merged_torch_impl(x, xn, gate, interpret, freq_taps, vt)

    x2 = x.reshape(B, n_samples).astype(jnp.float32)
    blocks = _signal_to_blocks(x2, scfg, n_blocks, nb_pad, hop)

    c_np, s_np = _block_dft_consts_np(scfg, n_tiles)
    ci_np, si_np = _block_idft_consts_np(scfg, n_tiles)
    col_dc = _HALO - 1
    bin0_base = -_HALO

    blocks_spec = pl.BlockSpec(memory_space=pl.ANY)
    cmat_spec = pl.BlockSpec(
        (1, hop, _FT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    plane_spec = pl.BlockSpec(
        (1, t_pad, _FT), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    out_shapes3 = (
        jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
        jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
        jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
    )
    scratch = [
        pltpu.VMEM((ext, _FT), jnp.float32),
        pltpu.VMEM((ext, _FT), jnp.float32),
        pltpu.VMEM((t_pad, _FT), jnp.float32),
        pltpu.VMEM((nb_pad, hop), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    common = dict(
        n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, ext=ext, t_real=n_frames,
        bin0_base=bin0_base, col_dc=col_dc, n_bins=n_bins, scale=1.0,
        prec=prec,
    )

    if gate.nonstationary:
        band_np = _movemean_band_np(gate.n_movemean_nonstationary)
        band_spec = pl.BlockSpec(
            band_np.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
        )
        mt = functools.partial(
            _mt_kernel, **common,
            n_thresh=gate.n_thresh_nonstationary,
            temp=gate.temp_coeff_nonstationary,
            prop=gate.prop_decrease, vt=vt,
        )

        def mt_kernel(b_ref, c_ref, s_ref, band_ref,
                      re_ref, im_ref, mask_ref, tc, ts, y, bv, sem, *oacc):
            mt(b_ref, c_ref[0], s_ref[0], band_ref, re_ref, im_ref, mask_ref,
               tc, ts, y, bv, sem)

        re_w, im_w, mask = pl.pallas_call(
            mt_kernel,
            grid=(B, n_tiles),
            in_specs=[blocks_spec, cmat_spec, cmat_spec, band_spec],
            out_specs=(plane_spec, plane_spec, plane_spec),
            out_shape=out_shapes3,
            scratch_shapes=scratch,
            interpret=interpret,
        )(blocks, jnp.asarray(c_np), jnp.asarray(s_np), jnp.asarray(band_np))
    else:
        self_stats = xn is None
        if self_stats:
            thr_tiles = jnp.zeros((1, n_tiles, 8, _FT), jnp.float32)
            reps = B
        else:
            xn2 = xn if xn.ndim == 2 else xn[None]
            bn = xn2.shape[0]
            # torch broadcast semantics: xn batch 1 broadcasts; otherwise
            # batch rows map channel-major onto xn rows (callers flattening
            # a (channels, chunks) axis guarantee B % bn == 0)
            reps = B // bn
            thr = _torch_threshold_stats(
                xn2.astype(jnp.float32), gate, interpret
            )  # (bn, n_bins)
            thr_tiles = _thr_lane_layout(thr, n_bins, n_tiles)
        thr_spec = pl.BlockSpec(
            (1, 1, 8, _FT),
            lambda i, j: (i // reps, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        ask = functools.partial(
            _as_kernel, **common,
            top_db=40.0, prop=gate.prop_decrease, vt=vt,
            self_stats=self_stats, n_std=gate.n_std_thresh_stationary,
        )

        def as_kernel(b_ref, c_ref, s_ref, t_ref,
                      re_ref, im_ref, mask_ref, tc, ts, y, bv, sem, *oacc):
            ask(b_ref, c_ref[0], s_ref[0], t_ref[0, 0], re_ref, im_ref,
                mask_ref, tc, ts, y, bv, sem)

        re_w, im_w, mask = pl.pallas_call(
            as_kernel,
            grid=(B, n_tiles),
            in_specs=[blocks_spec, cmat_spec, cmat_spec, thr_spec],
            out_specs=(plane_spec, plane_spec, plane_spec),
            out_shape=out_shapes3,
            scratch_shapes=scratch,
            interpret=interpret,
        )(blocks, jnp.asarray(c_np), jnp.asarray(s_np), thr_tiles)

    # ---- XLA: frequency smoothing (rank-1 taps, banded matmul) ---------------
    if freq_taps is not None:
        w = jnp.asarray(_band_from_taps_np(freq_taps, n_bins, n_tiles))
        mask = jnp.matmul(
            mask, w, preferred_element_type=jnp.float32, precision=prec
        )
    # (the prop_decrease blend already happened in-kernel BEFORE smoothing —
    # the torch-path order, torchgate.py:241-249)

    # ---- kernel B (post=1: torch applies no win_sum rescale) -----------------
    idft_spec = pl.BlockSpec(
        (1, _FT, hop), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, t_pad, hop), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bk = functools.partial(
        _apply_istft_kernel,
        n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, bin0_base=bin0_base,
        col_dc=col_dc, n_bins=n_bins, post=1.0, prec=prec,
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

    # ---- XLA: torch istft tail: trim n_fft//2, natural length, envelope ------
    full = win + (n_frames - 1) * hop
    y = out_blocks.reshape(B, t_pad * hop)[:, :full]
    trim = scfg.n_fft // 2
    out_len = (n_frames - 1) * hop
    y = y[:, trim : trim + out_len]
    norm = _ola_norm_np(scfg, n_frames)[trim : trim + out_len]
    norm = np.where(norm > 1e-11, norm, 1.0)
    y = y / jnp.asarray(norm, jnp.float32)
    return y.astype(x.dtype)

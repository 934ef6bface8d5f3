"""Fully fused non-stationary gate: two Pallas TPU kernels + a banded matmul.

The staged XLA pipeline (ops/stft.py + ops/pallas_mask.py + ops/dsp.py)
materializes the framed signal (4x the input at hop = win/4), the magnitude,
the IIR floor, and R pad+add OLA intermediates — ~6 HBM round-trips over
arrays that are 4-8x the audio. Here the whole gate is two kernels and one
matmul inside one jit graph, each kernel keeping a chunk's full time axis
resident in VMEM per frequency tile:

  kernel AM: hop-blocks -> windowed frame spectra (re_w, im_w) -> |Z| ->
             filtfilt IIR floor -> sigmoid -> time-axis triangular
             smoothing -> unsmoothed-in-frequency mask
  XLA:       frequency-axis triangular smoothing as one banded matmul
             (a 1-channel lane conv costs ~40 ms/chunk on v5e) +
             prop_decrease blend (nonstationary.py:78-84)
  kernel B:  mask apply -> synthesis window -> inverse DFT -> aligned
             overlap-add into hop-blocks
  XLA:       OLA window-envelope division (trace-time constant) + edge trim

Three structural tricks make this ~4x cheaper in MXU flops than a literal
matmul-DFT, at *better* accuracy than the staged path (every kernel dot is
Precision.HIGHEST — true f32, vs XLA HIGH 3xbf16 matmuls):

1. **Hop-block DFT factorization.** With win == n_fft and hop = win/r, the
   unwindowed frame DFT is X_j[f] = sum_k FB[j+k][f] · e^{-2πi·k·f/r} where
   FB[m] is the (hop -> n_bins) DFT of hop-block m. The matmuls contract
   over hop (not win) samples and are shared by all r frames overlapping a
   block — r-fold fewer flops. For r in {2, 4} the twiddles are exactly
   {±1, ±i}: pure sign/swap lane patterns on the VPU. On the synthesis
   side, OLA linearity gives out_block[m] = iDFT_hop(sum_k tw'_k·Y[m-k]) —
   one (bins -> hop) matmul per block, and sublane-ALIGNED output writes.
2. **Hann in the frequency domain.** The periodic Hann window is
   0.5 - 0.25·e^{i2πt/N} - 0.25·e^{-i2πt/N}, so windowing is the exact
   3-tap bin stencil 0.5·X[f] - 0.25·X[f-1] - 0.25·X[f+1] (Hermitian
   extension at the edges). Both the analysis and synthesis windows run as
   lane rolls inside the kernels.
3. **Overlapped frequency tiles.** Each 128-lane tile carries a 124-bin
   core plus 2 halo bins per side (recomputed, bit-identical), so both
   Hann stencils stay tile-local; the halo bins are zeroed out of the
   inverse-DFT constants so every bin contributes exactly once.

Reference semantics: scipy stft/istft as called by the NumPy engine
(nonstationary.py:51-57,90-95), filtfilt IIR floor (nonstationary.py:106-115),
smooth-then-blend order (nonstationary.py:78-84). Under grad/vjp the value
and gradient come from the staged jnp twin (custom_vjp — Mosaic kernels have
no autodiff rule).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from noisereduce_tpu.config import Convention, GateConfig, StftConfig
from noisereduce_tpu.ops.stft import _analysis_window_np, _ola_norm_np
from noisereduce_tpu.ops.pallas_mask import (
    _consts_np,
    max_frames_for_vmem,
)

__all__ = [
    "fused_gate_nonstationary",
    "fused_gate_stationary",
    "fused_stationary_threshold",
    "fused_gate_supported",
]

_TB = 128    # time block (frames per MXU step)
_FT = 128    # frequency tile width (lanes)
_HALO = 2    # default halo bins per side (two Hann stencil levels); the
#              merged kernel widens it to n_grad_freq + 2 so the frequency
#              smoothing support is tile-local too
_CORE = _FT - 2 * _HALO  # bins owned per tile at the default halo
_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Host-side constants (trace-time, cached per static geometry)
# ---------------------------------------------------------------------------
def _tile_bins(j: int, halo: int = _HALO):
    """Global bin index of each lane of tile j (may be out of range)."""
    core = _FT - 2 * halo
    return j * core - halo + np.arange(_FT, dtype=np.int64)


@functools.lru_cache(maxsize=None)
def _block_dft_consts_np(cfg: StftConfig, n_tiles: int, halo: int = _HALO):
    """Unwindowed hop-block DFT matrices per overlapped tile.

    C/S (n_tiles, hop, _FT): block (hop,) @ C[j] -> Re of FB for tile j's
    (overlapped) bins; out-of-range bins give zero columns."""
    hop = cfg.hop_length
    n_bins = cfg.n_bins
    p = np.arange(hop, dtype=np.float64)[:, None]
    c = np.zeros((n_tiles, hop, _FT), np.float64)
    s = np.zeros((n_tiles, hop, _FT), np.float64)
    for j in range(n_tiles):
        k = _tile_bins(j, halo)[None, :].astype(np.float64)
        ang = -2.0 * np.pi * p * k / cfg.n_fft
        valid = ((k >= 0) & (k < n_bins)).astype(np.float64)
        c[j] = np.cos(ang) * valid
        s[j] = np.sin(ang) * valid
    return c.astype(np.float32), s.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _block_idft_consts_np(cfg: StftConfig, n_tiles: int, halo: int = _HALO):
    """Inverse hop-block DFT matrices per tile: Ci/Si (n_tiles, _FT, hop),
    with the irfft Hermitian bin weights (2 except DC/Nyquist) and 1/n_fft
    folded. Rows for halo lanes or out-of-range bins are zero so every
    global bin contributes to the OLA exactly once."""
    hop = cfg.hop_length
    n_bins = cfg.n_bins
    t = np.arange(hop, dtype=np.float64)[None, :]
    ci = np.zeros((n_tiles, _FT, hop), np.float64)
    si = np.zeros((n_tiles, _FT, hop), np.float64)
    lane = np.arange(_FT)
    for j in range(n_tiles):
        k = _tile_bins(j, halo)[:, None].astype(np.float64)
        ang = 2.0 * np.pi * k * t / cfg.n_fft
        wk = np.where((k > 0) & ((k < cfg.n_fft / 2) | (cfg.n_fft % 2 == 1)), 2.0, 1.0)
        core = ((lane >= halo) & (lane < _FT - halo))[:, None]
        valid = ((k >= 0) & (k < n_bins)) & core
        ci[j] = (wk * np.cos(ang) / cfg.n_fft) * valid
        si[j] = (-wk * np.sin(ang) / cfg.n_fft) * valid
    return ci.astype(np.float32), si.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _tri_norm_np(n_grad: int) -> np.ndarray:
    """Normalized triangular taps (len 2n+1), matching ops.dsp."""
    from noisereduce_tpu.ops.dsp import triangular_vector

    v = triangular_vector(n_grad)
    return (v / v.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _tile_band_np(
    taps: tuple, n_bins: int, n_tiles: int, halo: int
) -> np.ndarray:
    """(n_tiles, _FT, _FT) per-tile banded matrices realizing the 'same'
    cross-correlation along bins INSIDE one overlapped tile:
    (mask_tile @ W[j])[t, l] = sum_d taps[n+d]·mask_tile[t, l+d] for lanes
    with full in-tile support (requires halo >= n + 2; out-of-support lanes
    produce garbage that the kernel layout never consumes). A tile's lanes
    map to strictly consecutive bins, so the in-tile neighbor IS the bin
    neighbor; out-of-range bins contribute zero (the reference's zero
    padding)."""
    taps_np = np.asarray(taps, np.float32)
    n = (len(taps_np) - 1) // 2
    w = np.zeros((n_tiles, _FT, _FT), np.float32)
    for j in range(n_tiles):
        bins = _tile_bins(j, halo)
        for out in range(_FT):
            for d in range(-n, n + 1):
                src = out + d
                if 0 <= src < _FT and 0 <= bins[src] < n_bins:
                    w[j, src, out] = taps_np[n + d]
    return w


@functools.lru_cache(maxsize=None)
def _band_from_taps_np(taps: tuple, n_bins: int, n_tiles: int) -> np.ndarray:
    """Banded (f_pad, f_pad) matrix realizing a 'same' cross-correlation
    along bins in the overlapped-tile layout: (mask @ W)[.., c] =
    sum_d taps[n+d]·mask[.., bin(c)+d].

    Rows: only core lanes with in-range bins (each global bin read exactly
    once). Columns: every lane whose bin is in range — halo copies of a bin
    receive the same smoothed value as its core copy, so the downstream
    synthesis stencil sees consistent neighbors."""
    taps = np.asarray(taps, np.float32)
    n = (len(taps) - 1) // 2
    f_pad = n_tiles * _FT
    w = np.zeros((f_pad, f_pad), np.float32)
    bins = np.concatenate([_tile_bins(j) for j in range(n_tiles)])
    lanes = np.tile(np.arange(_FT), n_tiles)
    core = (lanes >= _HALO) & (lanes < _FT - _HALO)
    for rr in range(f_pad):
        if not core[rr] or not (0 <= bins[rr] < n_bins):
            continue
        for cc in range(f_pad):
            d = bins[rr] - bins[cc]
            if 0 <= bins[cc] < n_bins and abs(d) <= n:
                w[rr, cc] = taps[n + d]
    return w


def _freq_band_np(n_grad_freq: int, n_bins: int, n_tiles: int) -> np.ndarray:
    """Triangular-taps banded matrix (the NumPy engines' smoother)."""
    return _band_from_taps_np(
        tuple(_tri_norm_np(n_grad_freq).tolist()), n_bins, n_tiles
    )


def _movemean_halo_blocks(n_move: int) -> int:
    """Halo blocks per side needed by the moving-average window."""
    left = (n_move - 1) // 2
    right = (n_move - 1) - left
    return -(-max(left, right) // _TB)


@functools.lru_cache(maxsize=None)
def _movemean_band_np(n_move: int) -> np.ndarray:
    """(_TB, (2K+1)*_TB) ones/n band for the torch moving-average noise
    floor: ma = band @ (K prev | cur | K next block window): ma[t] = mean of
    window rows [K*_TB+t-left, K*_TB+t+right] (torch conv1d 'same' zero
    padding, torchgate.py:179-190)."""
    left = (n_move - 1) // 2
    right = (n_move - 1) - left
    K = _movemean_halo_blocks(n_move)
    w = np.zeros((_TB, (2 * K + 1) * _TB), np.float32)
    for t in range(_TB):
        w[t, K * _TB + t - left : K * _TB + t + right + 1] = 1.0 / n_move
    return w


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------
def _twiddle_rows(r: int, inverse: bool, bin0: int):
    """Per-shift constant twiddle rows (built once per grid cell, outside
    the block loops): for shift k, (alpha, beta, gamma, delta) (1, _FT) rows
    with re_k = a·alpha + b·beta, im_k = a·gamma + b·delta, where (a, b) is
    the k-th block-DFT shift. The twiddle e^{∓2πi·k·f/r} for r in {2, 4}
    takes values in {±1, ∓i, ±i} by (k·f) mod r, i.e. the rows hold only
    {0, ±1} — two broadcast FMAs per plane replace the old nested
    jnp.where selection chains. ``bin0`` is the global bin of lane 0."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _FT), 1) + bin0
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    rows = []
    for k in range(1, r):
        kf = (k * lane) % r  # jnp % is non-negative for negative bins
        if r == 2:
            sign = jnp.where(kf == 0, one, -one)
            rows.append((sign, None, None, sign))
        else:  # r == 4 (guarded by fused_gate_supported)
            # forward: (-i)^kf in {1, -i, -1, i}; inverse: (+i)^kf
            # X*(-i) = (im, -re); X*(+i) = (-im, re); X*(-1) = (-re, -im)
            s_im = one if not inverse else -one
            alpha = jnp.where(kf == 0, one, jnp.where(kf == 2, -one, zero))
            beta = jnp.where(
                kf == 1, s_im, jnp.where(kf == 3, -s_im, zero)
            )
            rows.append((alpha, beta, -beta, alpha))
    return rows


def _twiddle_combine(parts_re, parts_im, r: int, tw_rows):
    """Combine r (rows, _FT) block-DFT shifts into a frame spectrum using
    precomputed ``_twiddle_rows``. parts_{re,im}[k] is FB[j+k] (forward)
    or Y[m-k] (inverse)."""
    acc_re = parts_re[0]
    acc_im = parts_im[0]
    for k in range(1, r):
        a, b = parts_re[k], parts_im[k]
        alpha, beta, gamma, delta = tw_rows[k - 1]
        if beta is None:  # r == 2: pure sign
            acc_re = acc_re + a * alpha
            acc_im = acc_im + b * delta
        else:
            acc_re = acc_re + a * alpha + b * beta
            acc_im = acc_im + a * gamma + b * delta
    return acc_re, acc_im


def _hermitian_fix(re, im, j, col_dc: int, nyq_lane):
    """Overwrite the lanes holding bins -1 / n_bins with the Hermitian
    extension conj(X[1]) / conj(X[n_bins-2]) — the values the reference's
    real-signal DFT implies there. The source lane is 2 away, so a +2 lane
    roll aligns it. Bin -1 lives only in tile 0 (at lane col_dc = halo-1),
    but with wide halos bin n_bins can appear in MORE than one trailing
    tile (any tile whose lane range reaches it needs the fix — a non-last
    tile's Nyquist-adjacent raw mask feeds the in-tile frequency smoothing
    of consumed bins); ``nyq_lane`` is this tile's lane of bin n_bins
    (n_bins - bin0, traced), self-gating when out of [0, lanes). The rolls
    run under a cond so tiles carrying neither lane skip them entirely."""

    def fix(re, im):
        lanes = re.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, re.shape, 1)
        # bin -1 copies from bin +1 (2 lanes to the RIGHT: x[c+2]);
        # bin n_bins copies from bin n_bins-2 (2 lanes to the LEFT: x[c-2])
        right_re = pltpu.roll(re, lanes - 2, axis=1)
        right_im = pltpu.roll(im, lanes - 2, axis=1)
        left_re = pltpu.roll(re, 2, axis=1)
        left_im = pltpu.roll(im, 2, axis=1)
        fix_dc = (j == 0) & (lane == col_dc)
        fix_ny = lane == nyq_lane
        re_f = jnp.where(fix_dc, right_re, jnp.where(fix_ny, left_re, re))
        im_f = jnp.where(fix_dc, -right_im, jnp.where(fix_ny, -left_im, im))
        return re_f, im_f

    lanes = re.shape[-1]
    return jax.lax.cond(
        (j == 0) | ((nyq_lane >= 0) & (nyq_lane < lanes)),
        fix,
        lambda re, im: (re, im),
        re, im,
    )


def _hann_stencil_lanes(re, im, scale):
    """0.5·X[c] - 0.25·(X[c-1] + X[c+1]) over lanes, times ``scale``.
    Valid on lanes [1, _FT-1); edge lanes come out as garbage (the caller's
    layout guarantees they are never consumed)."""
    lanes = re.shape[-1]
    re_m = pltpu.roll(re, 1, axis=1)       # X[c-1]
    re_p = pltpu.roll(re, lanes - 1, axis=1)  # X[c+1]
    im_m = pltpu.roll(im, 1, axis=1)
    im_p = pltpu.roll(im, lanes - 1, axis=1)
    sc = jnp.float32(scale)
    return (
        (0.5 * re - 0.25 * (re_m + re_p)) * sc,
        (0.5 * im - 0.25 * (im_m + im_p)) * sc,
    )


# ---------------------------------------------------------------------------
# Kernel AM: hop-blocks -> windowed spectra + time-smoothed mask
# ---------------------------------------------------------------------------
def _spectra_phases(
    blocks_hbm, blocks_ref, dma_sem, c_ref, s_ref, re_ref, im_ref,
    tc_ref, ts_ref, *, n_tb, n_tiles, r, ext, bin0, j, col_dc, n_bins, scale,
    prec=_HIGHEST, boundary=None,
):
    """Hop-blocks -> windowed frame spectra, written into re_ref/im_ref.

    The hop-block input stays in HBM and is DMA'd into a persistent VMEM
    scratch once per chunk (at the first F-tile) — a pipelined VMEM input
    would be double-buffered and blow the 16 MiB budget. FB is staged in
    the output refs (phase 2 consumes each row window before overwriting)
    plus an ext-row tail scratch.

    ``boundary=(bpad, view)``: the HBM input then carries only the raw
    n_blocks rows (no trailing zero rows, no zeroed chunk boundary) and the
    scipy per-chunk boundary semantics — zeros outside
    [bpad, bpad + view) of the extended chunk — are applied here right
    after the DMA, saving XLA a full where+pad pass over the blocks
    (~2-3 ms/960 s). All offsets are static: bpad is a whole number of hop
    rows for the supported r in {2, 4}.
    """
    i = pl.program_id(0)
    nb_pad, hop = blocks_ref.shape

    @pl.when(j == 0)
    def _():
        if boundary is None:
            dma = pltpu.make_async_copy(blocks_hbm.at[i], blocks_ref, dma_sem)
            dma.start()
            dma.wait()
        else:
            bpad, view = boundary
            n_src = blocks_hbm.shape[1]
            dma = pltpu.make_async_copy(
                blocks_hbm.at[i], blocks_ref.at[pl.ds(0, n_src)], dma_sem
            )
            dma.start()
            dma.wait()
            zero = jnp.float32(0.0)
            # rows the DMA did not fill
            if n_src < nb_pad:
                blocks_ref[pl.ds(n_src, nb_pad - n_src), :] = jnp.full(
                    (nb_pad - n_src, hop), zero
                )
            # leading boundary: positions < bpad are whole rows
            head = bpad // hop
            if head:
                blocks_ref[pl.ds(0, head), :] = jnp.full((head, hop), zero)
            # trailing boundary: positions >= bpad + view
            er, ec = divmod(bpad + view, hop)
            if er < n_src and ec:
                col = jax.lax.broadcasted_iota(jnp.int32, (8, hop), 1)
                blk = blocks_ref[pl.ds(er - er % 8, 8), :]
                row = jax.lax.broadcasted_iota(jnp.int32, (8, hop), 0)
                keep = (row != er % 8) | (col < ec)
                blocks_ref[pl.ds(er - er % 8, 8), :] = jnp.where(
                    keep, blk, zero
                )
            full_from = er + (1 if ec else 0)
            if full_from < n_src:
                blocks_ref[pl.ds(full_from, n_src - full_from), :] = jnp.full(
                    (n_src - full_from, hop), zero
                )

    # ---- phases 1+2, software-pipelined: the FB dot for block tb+1 issues
    # in the same loop body as the (VPU-only) twiddle/Hann combine for
    # block tb, so the MXU and VPU overlap (measured: Mosaic co-issues
    # within a body but not across separate fori loops). The FB dot is
    # idempotent (reads blocks, writes raw FB rows the combine has not yet
    # consumed), so the last iteration recomputes block n_tb-1 instead of
    # branching. One (TB, hop) @ (hop, 256) dot per block — the cos and sin
    # matrices ride side by side, doubling the MXU output width.
    cs = jnp.concatenate([c_ref[...], s_ref[...]], axis=1)  # (hop, 2*_FT)

    def fb_dot(s):
        xb = blocks_ref[pl.ds(s, _TB), :]
        fb = jnp.dot(
            xb, cs, preferred_element_type=jnp.float32, precision=prec
        )
        re_ref[0, pl.ds(s, _TB), :] = jax.lax.slice_in_dim(fb, 0, _FT, axis=1)
        im_ref[0, pl.ds(s, _TB), :] = jax.lax.slice_in_dim(
            fb, _FT, 2 * _FT, axis=1
        )

    # prologue: FB for block 0 and the ext-row tail (consumed only by the
    # last combine)
    fb_dot(pl.multiple_of(0, _TB))
    tail = pl.multiple_of(n_tb * _TB, _TB)
    xb = blocks_ref[pl.ds(tail, ext), :]
    fb = jnp.dot(xb, cs, preferred_element_type=jnp.float32, precision=prec)
    tc_ref[...] = jax.lax.slice_in_dim(fb, 0, _FT, axis=1)
    ts_ref[...] = jax.lax.slice_in_dim(fb, _FT, 2 * _FT, axis=1)

    tw_rows = _twiddle_rows(r, False, bin0)

    def body(tb, _):
        # FB one block ahead (clamped: recomputing the last block is a no-op)
        s_next = pl.multiple_of(
            jnp.minimum(tb + 1, n_tb - 1) * _TB, _TB
        )
        fb_dot(s_next)

        s = pl.multiple_of(tb * _TB, _TB)
        nxt = pl.multiple_of(jnp.minimum(s + _TB, n_tb * _TB - ext), 8)
        nc = jnp.where(tb == n_tb - 1, tc_ref[...], re_ref[0, pl.ds(nxt, ext), :])
        ns = jnp.where(tb == n_tb - 1, ts_ref[...], im_ref[0, pl.ds(nxt, ext), :])
        wc = jnp.concatenate([re_ref[0, pl.ds(s, _TB), :], nc], axis=0)
        ws = jnp.concatenate([im_ref[0, pl.ds(s, _TB), :], ns], axis=0)
        parts_re = [
            jax.lax.slice_in_dim(wc, k, k + _TB, axis=0) for k in range(r)
        ]
        parts_im = [
            jax.lax.slice_in_dim(ws, k, k + _TB, axis=0) for k in range(r)
        ]
        xre, xim = _twiddle_combine(parts_re, parts_im, r, tw_rows)
        xre, xim = _hermitian_fix(xre, xim, j, col_dc, n_bins - bin0)
        xre, xim = _hann_stencil_lanes(xre, xim, scale)
        re_ref[0, pl.ds(s, _TB), :] = xre
        im_ref[0, pl.ds(s, _TB), :] = xim
        return 0

    jax.lax.fori_loop(0, n_tb, body, 0)


def _time_smooth_phase(src_ref, mask_ref, *, n_tb, t_real, vt):
    """Blockwise time-axis 'same' triangular conv from src_ref (unsmoothed
    mask) into the mask output ref, with 16-row aligned halo reads
    (full-plane rolls blow the VMEM temp budget). The tap loop runs on the
    VPU on purpose: a banded-matmul variant measured ~2 ms/960s SLOWER on
    v5e — the kernel is MXU-throughput-bound on its 6-pass HIGHEST dots, so
    work must not migrate VPU -> MXU. Rows past t_real are re-zeroed
    (smoothing spreads into them; downstream must see no frames there)."""
    t_pad = src_ref.shape[0]
    nt = (len(vt) - 1) // 2
    H = 16  # halo rows (requires nt <= 16, see fused_gate_supported)

    def smooth_body(tb, _):
        s = pl.multiple_of(tb * _TB, _TB)
        blk = src_ref[pl.ds(s, _TB), :]
        prev_start = pl.multiple_of(jnp.maximum(s - H, 0), H)
        prev = src_ref[pl.ds(prev_start, H), :]
        prev = jnp.where(tb == 0, 0.0, prev)
        next_start = pl.multiple_of(jnp.minimum(s + _TB, t_pad - H), H)
        nxt = src_ref[pl.ds(next_start, H), :]
        nxt = jnp.where(tb == n_tb - 1, 0.0, nxt)
        window = jnp.concatenate([prev, blk, nxt], axis=0)
        acc = jnp.zeros((_TB, _FT), jnp.float32)
        for d in range(2 * nt + 1):
            sl = jax.lax.slice_in_dim(
                window, H - nt + d, H - nt + d + _TB, axis=0
            )
            acc = acc + sl * jnp.float32(vt[d])
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + s
        mask_ref[0, pl.ds(s, _TB), :] = jnp.where(ridx < t_real, acc, 0.0)
        return 0

    jax.lax.fori_loop(0, n_tb, smooth_body, 0)


def _am_kernel(
    blocks_hbm, c_ref, s_ref, re_ref, im_ref, mask_ref, tc_ref, ts_ref, y_ref,
    blocks_ref, dma_sem, l_ref, lt_ref, dfwd_ref, dbwd_ref,
    *, n_tb, n_tiles, r, hop, ext, t_real, bin0_base, col_dc, n_bins,
    scale, b, thresh, slope, vt, core=_CORE, prec=_HIGHEST, boundary=None,
):
    """One (chunk, F-tile) cell: everything from hop-blocks to the
    (time-smoothed) non-stationary mask, with the windowed spectra as side
    outputs."""
    j = pl.program_id(1)
    t_pad = y_ref.shape[0]
    bin0 = bin0_base + j * core

    _spectra_phases(
        blocks_hbm, blocks_ref, dma_sem, c_ref, s_ref, re_ref, im_ref,
        tc_ref, ts_ref, n_tb=n_tb, n_tiles=n_tiles, r=r, ext=ext, bin0=bin0,
        j=j, col_dc=col_dc, n_bins=n_bins, scale=scale, prec=prec,
        boundary=boundary,
    )

    # ---- phase 3: IIR floor + sigmoid mask (magnitude recomputed from the
    # spectra refs per block) ----------------------------------------------
    # Each direction is software-pipelined: the block-local L@x dot for
    # block k+1 (independent of the carry) issues in the same loop body as
    # the VPU carry injection for block k, so the MXU and VPU overlap. The
    # dots are idempotent (they read the spectra / forward planes and write
    # rows the carry has not yet consumed), so the boundary iterations
    # recompute a block instead of branching. The backward dots stage their
    # partials in the mask plane (overwritten by the final mask afterwards)
    # to stay out of the forward result they read.
    d_fwd = dfwd_ref[...]
    d_bwd = dbwd_ref[...]

    def mag_at(start):
        rr = re_ref[0, pl.ds(start, _TB), :]
        ii = im_ref[0, pl.ds(start, _TB), :]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + start
        return jnp.where(ridx < t_real, jnp.sqrt(rr * rr + ii * ii), 0.0)

    def fwd_dot(start):
        xb = mag_at(start)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + start
        xb = jnp.where(ridx == 0, xb * jnp.float32(1.0 / b), xb)
        y_ref[pl.ds(start, _TB), :] = jnp.dot(
            l_ref[...], xb, preferred_element_type=jnp.float32,
            precision=prec,
        )

    fwd_dot(pl.multiple_of(0, _TB))

    # carry chain: y_k = P_k + c_{k-1}·d_fwd; c_k = y_k[last] (d_fwd's last
    # entry is a^TB, so reading the updated block row gives the next carry)
    def fwd_body(kb, carry):
        fwd_dot(pl.multiple_of(jnp.minimum(kb + 1, n_tb - 1) * _TB, _TB))
        start = pl.multiple_of(kb * _TB, _TB)
        yb = y_ref[pl.ds(start, _TB), :] + carry * d_fwd
        y_ref[pl.ds(start, _TB), :] = yb
        return jax.lax.slice_in_dim(yb, _TB - 1, _TB, axis=0)

    carry0 = jnp.zeros((1, _FT), jnp.float32)
    jax.lax.fori_loop(0, n_tb, fwd_body, carry0)

    def bwd_dot(start):
        yb = y_ref[pl.ds(start, _TB), :]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + start
        yb = jnp.where(ridx == t_real - 1, yb * jnp.float32(1.0 / b), yb)
        yb = jnp.where(ridx > t_real - 1, 0.0, yb)
        mask_ref[0, pl.ds(start, _TB), :] = jnp.dot(
            lt_ref[...], yb, preferred_element_type=jnp.float32,
            precision=prec,
        )

    bwd_dot(pl.multiple_of((n_tb - 1) * _TB, _TB))

    def bwd_body(k, carry):
        kb = n_tb - 1 - k
        bwd_dot(pl.multiple_of(jnp.maximum(kb - 1, 0) * _TB, _TB))
        start = pl.multiple_of(kb * _TB, _TB)
        wb = mask_ref[0, pl.ds(start, _TB), :] + carry * d_bwd
        nxt = jax.lax.slice_in_dim(wb, 0, 1, axis=0)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + start
        mb = mag_at(start)
        safe_w = jnp.where(wb == 0.0, 1.0, wb)
        ratio = (mb - wb) / safe_w
        mask = jax.nn.sigmoid((ratio - jnp.float32(thresh)) * jnp.float32(slope))
        mask = jnp.where(ridx < t_real, mask, 0.0)
        if vt is None:
            mask_ref[0, pl.ds(start, _TB), :] = mask
        else:
            y_ref[pl.ds(start, _TB), :] = mask
        return nxt

    jax.lax.fori_loop(0, n_tb, bwd_body, carry0)

    # ---- phase 4: blockwise time-axis triangular smoothing ---------------
    if vt is not None:
        _time_smooth_phase(y_ref, mask_ref, n_tb=n_tb, t_real=t_real, vt=vt)


def _as_kernel(
    blocks_hbm, c_ref, s_ref, thresh_ref, re_ref, im_ref, mask_ref,
    tc_ref, ts_ref, y_ref, blocks_ref, dma_sem,
    *, n_tb, n_tiles, r, hop, ext, t_real, bin0_base, col_dc, n_bins,
    scale, top_db, prop, vt, self_stats=False, n_std=0.0, core=_CORE,
    prec=_HIGHEST, boundary=None,
):
    """Stationary twin of ``_am_kernel``: hop-blocks -> windowed spectra +
    stationary mask (reference stationary.py:83-126).

    mask = 1[amp_to_db(|Z_w|) > noise_thresh], with amp_to_db's per-bin
    dynamic-range floor (max over time - top_db); the prop_decrease blend
    happens BEFORE smoothing (the stationary-path quirk order,
    stationary.py:108-114) so it lives here rather than after the banded
    frequency conv.

    Accuracy note: the binary compare is a discontinuity — a bin whose dB
    margin to the threshold is below float32 resolution (~1e-5 dB) can flip
    relative to a float64 run regardless of implementation (on fish.wav one
    such borderline top_db-floor column bounds f32-vs-f64 agreement at
    ~1.5e-3 of peak). Within float32 the kernel matches the staged jnp path
    to ~5e-7."""
    j = pl.program_id(1)
    bin0 = bin0_base + j * core

    _spectra_phases(
        blocks_hbm, blocks_ref, dma_sem, c_ref, s_ref, re_ref, im_ref,
        tc_ref, ts_ref, n_tb=n_tb, n_tiles=n_tiles, r=r, ext=ext, bin0=bin0,
        j=j, col_dc=col_dc, n_bins=n_bins, scale=scale, prec=prec,
        boundary=boundary,
    )

    # ---- pass A: dB spectrogram (into y_ref) + running per-bin max -------
    eps = jnp.float32(float(np.finfo(np.float64).eps))
    log10e20 = jnp.float32(20.0 / np.log(10.0))

    def db_body(tb, carry):
        s = pl.multiple_of(tb * _TB, _TB)
        rr = re_ref[0, pl.ds(s, _TB), :]
        ii = im_ref[0, pl.ds(s, _TB), :]
        db = jnp.log(jnp.sqrt(rr * rr + ii * ii) + eps) * log10e20
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + s
        db = jnp.where(ridx < t_real, db, jnp.float32(-1e30))
        y_ref[pl.ds(s, _TB), :] = db
        return jnp.maximum(carry, jnp.max(db, axis=0, keepdims=True))

    maxdb = jax.lax.fori_loop(
        0, n_tb, db_body, jnp.full((1, _FT), -1e30, jnp.float32)
    )

    floor = maxdb - jnp.float32(top_db)

    if self_stats:
        # torch stationary with xn=None: threshold from the signal's own
        # CLAMPED dB statistics, ddof=1 (torchgate.py:126-165; torch.std
        # default). Clamp in place (pass B reads the clamped plane) and
        # accumulate per-bin moments.
        def mom_body(tb, carry):
            sm, sq = carry
            s = pl.multiple_of(tb * _TB, _TB)
            db = jnp.maximum(y_ref[pl.ds(s, _TB), :], floor)
            y_ref[pl.ds(s, _TB), :] = db
            ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + s
            valid = ridx < t_real
            dbv = jnp.where(valid, db, 0.0)
            sm = sm + jnp.sum(dbv, axis=0, keepdims=True)
            sq = sq + jnp.sum(jnp.where(valid, db * db, 0.0), axis=0,
                              keepdims=True)
            return sm, sq

        z = jnp.zeros((1, _FT), jnp.float32)
        sm, sq = jax.lax.fori_loop(0, n_tb, mom_body, (z, z))
        nfr = jnp.float32(t_real)
        mean = sm / nfr
        var = jnp.maximum(sq - nfr * mean * mean, 0.0) / jnp.float32(
            max(t_real - 1, 1)
        )
        thr = mean + jnp.sqrt(var) * jnp.float32(n_std)
    else:
        thr = thresh_ref[...][:1, :]  # row-replicated (8, _FT) tile

    # ---- pass B: threshold compare + blend (into y_ref, in place) --------
    def mask_body(tb, _):
        s = pl.multiple_of(tb * _TB, _TB)
        db = y_ref[pl.ds(s, _TB), :]
        if not self_stats:  # self-stats pass already clamped in place
            db = jnp.maximum(db, floor)
        m = (db > thr).astype(jnp.float32)
        m = m * jnp.float32(prop) + jnp.float32(1.0 - prop)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + s
        m = jnp.where(ridx < t_real, m, 0.0)
        if vt is None:
            mask_ref[0, pl.ds(s, _TB), :] = m
        else:
            y_ref[pl.ds(s, _TB), :] = m
        return 0

    jax.lax.fori_loop(0, n_tb, mask_body, 0)

    if vt is not None:
        _time_smooth_phase(y_ref, mask_ref, n_tb=n_tb, t_real=t_real, vt=vt)


def _mt_kernel(
    blocks_hbm, c_ref, s_ref, band_ref, re_ref, im_ref, mask_ref,
    tc_ref, ts_ref, y_ref, blocks_ref, dma_sem,
    *, n_tb, n_tiles, r, hop, ext, t_real, bin0_base, col_dc, n_bins,
    scale, n_thresh, temp, prop, vt, core=_CORE, prec=_HIGHEST,
):
    """Torch-convention non-stationary mask (TorchGate, torchgate.py:167-198):
    moving-average noise floor + temperature sigmoid + pre-smoothing
    prop_decrease blend (torch-path order, torchgate.py:241-249).

    The 'same' moving average runs as one (_TB, (2K+1)*_TB) ones/n band
    matmul per time block over an aligned K-blocks-per-side window — zero
    padding at the plane edges matches torch conv1d's. Like the fused
    kernels' IIR floor, an exactly-zero floor takes a safe divisor instead
    of the reference's 0/0 NaN.
    """
    j = pl.program_id(1)
    t_pad = y_ref.shape[0]
    bin0 = bin0_base + j * core

    _spectra_phases(
        blocks_hbm, blocks_ref, dma_sem, c_ref, s_ref, re_ref, im_ref,
        tc_ref, ts_ref, n_tb=n_tb, n_tiles=n_tiles, r=r, ext=ext, bin0=bin0,
        j=j, col_dc=col_dc, n_bins=n_bins, scale=scale, prec=prec,
    )

    # ---- pass 1: |Z| into y_ref ------------------------------------------
    def mag_body(tb, _):
        s = pl.multiple_of(tb * _TB, _TB)
        rr = re_ref[0, pl.ds(s, _TB), :]
        ii = im_ref[0, pl.ds(s, _TB), :]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + s
        y_ref[pl.ds(s, _TB), :] = jnp.where(
            ridx < t_real, jnp.sqrt(rr * rr + ii * ii), 0.0
        )
        return 0

    jax.lax.fori_loop(0, n_tb, mag_body, 0)

    # ---- pass 2: moving average + temperature sigmoid + blend -------------
    K = (band_ref.shape[-1] // _TB - 1) // 2

    def ma_body(tb, _):
        s = pl.multiple_of(tb * _TB, _TB)
        parts = []
        for o in range(-K, K + 1):
            start = pl.multiple_of(
                jnp.clip(s + o * _TB, 0, t_pad - _TB), _TB
            )
            blk = y_ref[pl.ds(start, _TB), :]
            oob = (tb + o < 0) | (tb + o > n_tb - 1)
            parts.append(jnp.where(oob, 0.0, blk))
        cur = parts[K]
        window = jnp.concatenate(parts, axis=0)
        ma = jnp.dot(band_ref[...], window, preferred_element_type=jnp.float32,
                     precision=prec)
        safe = jnp.where(ma == 0.0, 1.0, ma)
        ratio = (cur - ma) / safe
        m = jax.nn.sigmoid((ratio - jnp.float32(n_thresh)) / jnp.float32(temp))
        m = m * jnp.float32(prop) + jnp.float32(1.0 - prop)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + s
        m = jnp.where(ridx < t_real, m, 0.0)
        mask_ref[0, pl.ds(s, _TB), :] = m
        return 0

    jax.lax.fori_loop(0, n_tb, ma_body, 0)

    # ---- pass 3: time-axis smoothing (SVD rank-1 of the torch kernel) ----
    if vt is not None:
        # stage the unsmoothed mask in y_ref (mag is dead), then smooth back
        def copy_body(tb, _):
            s = pl.multiple_of(tb * _TB, _TB)
            y_ref[pl.ds(s, _TB), :] = mask_ref[0, pl.ds(s, _TB), :]
            return 0

        jax.lax.fori_loop(0, n_tb, copy_body, 0)
        _time_smooth_phase(y_ref, mask_ref, n_tb=n_tb, t_real=t_real, vt=vt)


def _spectra_kernel(
    blocks_hbm, c_ref, s_ref, re_ref, im_ref, tc_ref, ts_ref,
    blocks_ref, dma_sem,
    *, n_tb, n_tiles, r, ext, bin0_base, col_dc, n_bins, scale, core=_CORE,
):
    """Spectra only (windowed STFT planes) — used for the stationary noise
    threshold statistics."""
    j = pl.program_id(1)
    _spectra_phases(
        blocks_hbm, blocks_ref, dma_sem, c_ref, s_ref, re_ref, im_ref,
        tc_ref, ts_ref, n_tb=n_tb, n_tiles=n_tiles, r=r, ext=ext,
        bin0=bin0_base + j * core, j=j, col_dc=col_dc, n_bins=n_bins,
        scale=scale,
    )


# ---------------------------------------------------------------------------
# Kernel B: mask apply + synthesis Hann + inverse block DFT + aligned OLA
# ---------------------------------------------------------------------------
def _apply_istft_kernel(
    re_ref, im_ref, mask_ref, ci_ref, si_ref, out_ref,
    *, n_tb, n_tiles, r, hop, bin0_base, col_dc, n_bins, post, core=_CORE,
    prec=_HIGHEST, inv=None,
):
    """One (chunk, F-tile) cell: out_block[m] = iDFT_hop(sum_k tw'_k·Y[m-k])
    with Y = HannStencil(Z_w·mask)·win_sum computed on the fly per (_TB+8)-row
    window — aligned reads with an 8-row lookback, aligned accumulating
    writes, revisited across tiles."""
    j = pl.program_id(1)
    bin0 = bin0_base + j * core

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    H = 8  # lookback rows (covers k <= r-1 <= 7)
    # loop-invariant: real/imag inverse matrices stacked along contraction
    cisi = jnp.concatenate([ci_ref[...], si_ref[...]], axis=0)
    tw_rows = _twiddle_rows(r, True, bin0)

    def y_window(start):
        rr = re_ref[0, pl.ds(start, _TB), :]
        ii = im_ref[0, pl.ds(start, _TB), :]
        mm = mask_ref[0, pl.ds(start, _TB), :]
        rr, ii = rr * mm, ii * mm
        rr, ii = _hermitian_fix(rr, ii, j, col_dc, n_bins - bin0)
        return _hann_stencil_lanes(rr, ii, post)

    # the H-row lookback is carried from the previous iteration's processed
    # block (bit-identical: every step is row-local) instead of recomputed
    def body(tb, carry):
        pre_re, pre_im = carry
        s = pl.multiple_of(tb * _TB, _TB)
        cur_re, cur_im = y_window(s)
        wre = jnp.concatenate([pre_re, cur_re], axis=0)
        wim = jnp.concatenate([pre_im, cur_im], axis=0)
        # rows of w* are Y[s-H .. s+_TB); Y[m-k] = w*[H - k + (m - s)]
        parts_re = [
            jax.lax.slice_in_dim(wre, H - k, H - k + _TB, axis=0)
            for k in range(r)
        ]
        parts_im = [
            jax.lax.slice_in_dim(wim, H - k, H - k + _TB, axis=0)
            for k in range(r)
        ]
        ure, uim = _twiddle_combine(parts_re, parts_im, r, tw_rows)
        # one (TB, 256) @ (256, hop) dot: real/imag operands stacked along
        # the contraction — doubles the MXU K depth vs two 128-K dots
        u = jnp.concatenate([ure, uim], axis=1)
        pk = jnp.dot(
            u, cisi, preferred_element_type=jnp.float32, precision=prec
        )
        out_ref[0, pl.ds(s, _TB), :] = out_ref[0, pl.ds(s, _TB), :] + pk
        return (
            jax.lax.slice_in_dim(cur_re, _TB - H, _TB, axis=0),
            jax.lax.slice_in_dim(cur_im, _TB - H, _TB, axis=0),
        )

    carry0 = (
        jnp.zeros((H, _FT), jnp.float32),
        jnp.zeros((H, _FT), jnp.float32),
    )
    jax.lax.fori_loop(0, n_tb, body, carry0)

    if inv is not None:
        # OLA-envelope division folded into the kernel: after the LAST
        # tile's contributions land, scale the accumulated hop-block rows
        # by the trace-time 1/norm plane (saves XLA a full read+write pass
        # over the output). The grid iterates j innermost, so j ==
        # n_tiles-1 sees the completed accumulation for this chunk.
        @pl.when(pl.program_id(1) == n_tiles - 1)
        def _():
            def scale_body(tb, _):
                s = pl.multiple_of(tb * _TB, _TB)
                out_ref[0, pl.ds(s, _TB), :] = (
                    out_ref[0, pl.ds(s, _TB), :] * inv[0, pl.ds(s, _TB), :]
                )
                return 0

            t_pad = out_ref.shape[1]
            jax.lax.fori_loop(0, t_pad // _TB, scale_body, 0)


# ---------------------------------------------------------------------------
# Merged single-kernel gate (spectra + mask + smoothing + iSTFT in one cell)
# ---------------------------------------------------------------------------
def _freq_smooth_blend_phase(
    mask_ref, band_ref, *, n_tb, t_real, prop, prec=_HIGHEST
):
    """In-kernel frequency smoothing and/or post-smoothing blend, in place.

    The banded 'same' conv along bins is one (_TB, _FT) @ (_FT, _FT) MXU dot
    per time block (row-local, so in-place per block is safe). ``prop`` is
    the non-stationary path's AFTER-smoothing prop_decrease blend
    (nonstationary.py:78-84); the blend writes (1-prop) into padded rows,
    so rows past t_real are re-zeroed (they hold real hop-block samples the
    reference never sees)."""

    def body(tb, _):
        s = pl.multiple_of(tb * _TB, _TB)
        m = mask_ref[0, pl.ds(s, _TB), :]
        if band_ref is not None:
            m = jnp.dot(
                m, band_ref[...], preferred_element_type=jnp.float32,
                precision=prec,
            )
        if prop is not None:
            m = m * jnp.float32(prop) + jnp.float32(1.0 - prop)
            ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + s
            m = jnp.where(ridx < t_real, m, 0.0)
        mask_ref[0, pl.ds(s, _TB), :] = m
        return 0

    jax.lax.fori_loop(0, n_tb, body, 0)


def _merged_halo(n_grad_freq: int) -> int:
    """Tile halo for the merged kernel: the Hann stencils need 2 levels and
    the in-tile frequency smoothing needs its half-width on top (raw-mask
    validity ends one lane inside the spectra validity, hence n+2)."""
    return _HALO if n_grad_freq < 1 else n_grad_freq + 2


def _merged_vmem_bytes(t_pad: int, hop: int) -> int:
    """Working-set estimate of the merged kernel (see scratch list below):
    4 (t_pad, 128) f32 planes (re, im, mask, IIR/dB state), the (t_pad+8,
    hop) hop-block scratch, a double-buffered (t_pad, hop) output, plus
    double-buffered per-tile constants."""
    planes = 4 * t_pad * _FT * 4
    blocks = (t_pad + 8) * hop * 4
    out = 2 * t_pad * hop * 4
    inv = 2 * t_pad * hop * 4  # 1/OLA-envelope plane (kernel B epilogue)
    consts = 2 * (4 * hop * _FT * 4 + 3 * _FT * _FT * 4) + 4 * _TB * _TB * 4
    return planes + blocks + out + inv + consts


# The Mosaic scoped-VMEM default is 16 MiB, but v5e-class chips carry
# 128 MiB of physical VMEM; the merged kernel raises the scoped limit via
# CompilerParams and gates itself on this budget instead. The default
# ceiling is the CHIP-PROVEN envelope (56 MiB scoped limit / ~40 MiB
# estimate on v5e — 30 s unchunked @48 kHz). NRTPU_MERGED_VMEM_BYTES can
# raise it per deployment, but note: eligibility here commits dispatch
# BEFORE compile, the 1.4x estimate margin is only validated inside the
# proven envelope, and an admitted-but-unproven geometry fails at Mosaic
# compile time with no jnp fallback — raising the ceiling is opt-in
# extrapolation.
_MERGED_VMEM_LIMIT = int(
    float(os.environ.get("NRTPU_MERGED_VMEM_BYTES", 56 * 1024 * 1024))
)


def _merged_compiler_params(t_pad: int, hop: int):
    est = _merged_vmem_bytes(t_pad, hop)
    limit = min(_MERGED_VMEM_LIMIT, max(16 * 1024 * 1024, int(est * 1.4)))
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _merged_supported(t_pad: int, hop: int, halo: int, n_bins: int) -> bool:
    if halo > (_FT - 16) // 2:  # keep >= 16 owned bins per tile
        return False
    if halo > _HALO and n_bins % (_FT - 2 * halo) == 1:
        # With frequency smoothing on and the last tile owning a single
        # core bin, the Nyquist-extension lane sits at halo+1 and kernel
        # B's Hermitian fix would source the smoothed mask at lane halo-1,
        # whose in-tile banded support reaches lane 1 — one tap past the
        # circular Hann stencil's validity. The split path smooths over
        # the full plane and has no such lane; route there.
        return False
    # 1.4x headroom for Mosaic stack/alignment overhead (measured ~1.1x
    # at the chip-proven sizes; treated as validated only within the
    # proven envelope — see _MERGED_VMEM_LIMIT)
    return _merged_vmem_bytes(t_pad, hop) * 1.4 <= _MERGED_VMEM_LIMIT


def _spectra_vmem_bytes(t_pad: int, hop: int) -> int:
    """Working set of the spectra-only kernel (_fused_stft_planes): two
    double-buffered (t_pad, _FT) output planes, the hop-block scratch, the
    FB tail scratch, and double-buffered per-tile DFT constants."""
    planes = 2 * 2 * t_pad * _FT * 4
    blocks = (t_pad + 8) * hop * 4
    consts = 2 * (2 * hop * _FT * 4) + 2 * 8 * _FT * 4
    return planes + blocks + consts


def _spectra_supported(t_pad: int, hop: int) -> bool:
    return _spectra_vmem_bytes(t_pad, hop) * 1.4 <= _MERGED_VMEM_LIMIT


def _split_vmem_ok(t_pad: int, hop: int) -> bool:
    """VMEM fit of the two-kernel pipeline: kernel AM streams three
    double-buffered (t_pad, _FT) output planes plus the state plane and the
    hop-block scratch; kernel B streams the three planes in and a
    double-buffered (t_pad, hop) output."""
    from noisereduce_tpu.ops.pallas_mask import _VMEM_BYTES, _VMEM_SAFETY

    am = (
        2 * 3 * t_pad * _FT * 4
        + t_pad * _FT * 4
        + (t_pad + 8) * hop * 4
        + 2 * (2 * hop * _FT * 4)
        + 4 * _TB * _TB * 4
    )
    b = (
        2 * 3 * t_pad * _FT * 4
        + 2 * t_pad * hop * 4
        + 2 * (2 * _FT * hop * 4)
    )
    return max(am, b) <= _VMEM_BYTES * _VMEM_SAFETY


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

    scale = 1.0 / float(_analysis_window_np(scfg).sum())
    post = float(_analysis_window_np(scfg).sum())
    # fast (bfloat16) mode: every MXU dot runs one bf16 pass (Mosaic
    # DEFAULT) instead of six true-f32 passes; planes/accumulators stay f32
    prec = jax.lax.Precision.DEFAULT if fast else _HIGHEST

    common = dict(
        n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, ext=ext, t_real=n_frames,
        bin0_base=bin0_base, col_dc=col_dc, n_bins=n_bins, scale=scale,
        core=_FT - 2 * halo, prec=prec, boundary=boundary,
    )
    bk = functools.partial(
        _apply_istft_kernel,
        n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, bin0_base=bin0_base,
        col_dc=col_dc, n_bins=n_bins, post=post, core=_FT - 2 * halo,
        prec=prec,
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

    blocks_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    cmat_spec = pl.BlockSpec(
        (1, hop, _FT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    idft_spec = pl.BlockSpec(
        (1, _FT, hop), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    band_spec = pl.BlockSpec(
        (1, _FT, _FT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    iirmat_spec = pl.BlockSpec(
        (_TB, _TB), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (_TB, _FT), lambda i, j: (0, 0), memory_space=pltpu.VMEM
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
        pltpu.VMEM((t_pad, _FT), jnp.float32),     # dB / IIR / raw mask
        pltpu.VMEM((nb_pad, hop), jnp.float32),    # hop blocks (DMA'd per i)
        pltpu.SemaphoreType.DMA(()),
    ]
    out_shape = jax.ShapeDtypeStruct((B, t_pad, hop), jnp.float32)

    if noise_thresh is None:
        L, d_fwd, d_bwd, _ = _consts_np(cfg.iir_b, _TB)
        am = functools.partial(
            _am_kernel, **common,
            b=cfg.iir_b, thresh=cfg.thresh_n_mult_nonstationary,
            slope=cfg.sigmoid_slope_nonstationary, vt=vt,
        )
        fs = functools.partial(
            _freq_smooth_blend_phase, n_tb=n_tb, t_real=n_frames,
            prop=cfg.prop_decrease, prec=prec,
        )

        if band_np is None:
            def kernel(b_ref, c_ref, s_ref, l_ref, lt_ref, df_ref, db_ref,
                       ci_ref, si_ref, inv_ref, out_ref, re_s, im_s, mask_s,
                       tc, ts, y_s, bv, sem):
                am(b_ref, c_ref[0], s_ref[0], re_s, im_s, mask_s, tc, ts,
                   y_s, bv, sem, l_ref, lt_ref, df_ref, db_ref)
                fs(mask_s, None)
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   inv=inv_ref)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, iirmat_spec,
                        iirmat_spec, vec_spec, vec_spec, idft_spec, idft_spec,
                        inv_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np),
                jnp.asarray(L), jnp.asarray(L.T),
                jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(d_fwd[:, None], (_TB, _FT)))),
                jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(d_bwd[:, None], (_TB, _FT)))),
                jnp.asarray(ci_np), jnp.asarray(si_np), jnp.asarray(inv_np),
            )
        else:
            def kernel(b_ref, c_ref, s_ref, l_ref, lt_ref, df_ref, db_ref,
                       band_ref, ci_ref, si_ref, inv_ref, out_ref, re_s, im_s,
                       mask_s, tc, ts, y_s, bv, sem):
                am(b_ref, c_ref[0], s_ref[0], re_s, im_s, mask_s, tc, ts,
                   y_s, bv, sem, l_ref, lt_ref, df_ref, db_ref)
                fs(mask_s, band_ref[0])
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   inv=inv_ref)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, iirmat_spec,
                        iirmat_spec, vec_spec, vec_spec, band_spec,
                        idft_spec, idft_spec, inv_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np),
                jnp.asarray(L), jnp.asarray(L.T),
                jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(d_fwd[:, None], (_TB, _FT)))),
                jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(d_bwd[:, None], (_TB, _FT)))),
                jnp.asarray(band_np), jnp.asarray(ci_np), jnp.asarray(si_np),
                jnp.asarray(inv_np),
            )
    else:
        thr_tiles = _thr_lane_layout(noise_thresh, n_bins, n_tiles, halo)
        thr_spec = pl.BlockSpec(
            (1, 8, _FT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
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
                       out_ref, re_s, im_s, mask_s, tc, ts, y_s, bv, sem):
                ask(b_ref, c_ref[0], s_ref[0], t_ref[0], re_s, im_s, mask_s,
                    tc, ts, y_s, bv, sem)
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   inv=inv_ref)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, thr_spec,
                        idft_spec, idft_spec, inv_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np), thr_tiles,
                jnp.asarray(ci_np), jnp.asarray(si_np), jnp.asarray(inv_np),
            )
        else:
            def kernel(b_ref, c_ref, s_ref, t_ref, band_ref, ci_ref, si_ref,
                       inv_ref, out_ref, re_s, im_s, mask_s, tc, ts, y_s, bv,
                       sem):
                ask(b_ref, c_ref[0], s_ref[0], t_ref[0], re_s, im_s, mask_s,
                    tc, ts, y_s, bv, sem)
                fs(mask_s, band_ref[0])
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref,
                   inv=inv_ref)

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


# ---------------------------------------------------------------------------
# Geometry + eligibility
# ---------------------------------------------------------------------------
def _geometry(scfg: StftConfig, n_samples: int, halo: int = _HALO):
    win = scfg.frame_length
    hop = scfg.hop_length
    r = win // hop
    n_frames = scfg.n_frames(n_samples)
    n_blocks = n_frames + r - 1
    t_pad = -(-n_frames // _TB) * _TB
    ext = 8  # FB lookahead rows (covers k <= r-1 <= 7)
    nb_pad = t_pad + ext
    n_tiles = -(-scfg.n_bins // (_FT - 2 * halo))
    return win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles


def _signal_to_blocks(x2, scfg, n_blocks, nb_pad, hop):
    """scipy boundary extension + hop-block reshape: (B, n) signal ->
    (B, nb_pad, hop) zero-extended hop blocks (win//2 zeros each side,
    truncated/padded to n_blocks*hop — ops/stft.frame_signal semantics)."""
    pad = scfg.boundary_pad
    need = n_blocks * hop
    right = max(pad, need - x2.shape[-1] - pad)
    x2 = jnp.pad(x2, [(0, 0), (pad, right)])[:, :need]
    return jnp.pad(
        x2.reshape(x2.shape[0], n_blocks, hop),
        [(0, 0), (0, nb_pad - n_blocks), (0, 0)],
    )


def _thr_lane_layout(noise_thresh, n_bins, n_tiles, halo=_HALO):
    """Gather per-bin thresholds (..., n_bins) into the overlapped tile
    lane layout (..., n_tiles, 8, _FT), row-replicated to a full sublane
    tile; lanes holding out-of-range bins get 1e30 (never above
    threshold)."""
    bins = np.concatenate([_tile_bins(j, halo) for j in range(n_tiles)])
    valid = (bins >= 0) & (bins < n_bins)
    idx = np.clip(bins, 0, n_bins - 1)
    thr_flat = jnp.where(
        jnp.asarray(valid),
        noise_thresh.astype(jnp.float32)[..., jnp.asarray(idx)],
        jnp.float32(1e30),
    )
    shape = thr_flat.shape[:-1] + (n_tiles, 1, _FT)
    reps = (1,) * (thr_flat.ndim - 1) + (1, 8, 1)
    return jnp.tile(thr_flat.reshape(shape), reps)


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
# The fused gate (custom_vjp: jnp twin under grad)
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
    from noisereduce_tpu.models.spectral_gate import _gate_nonstationary_jnp

    out, vjp_fn = jax.vjp(
        lambda c: _gate_nonstationary_jnp(c, cfg, "matmul"), chunk
    )
    return out, vjp_fn


def _fused_gate_bwd(cfg, interpret, vjp_fn, g):
    return vjp_fn(g)


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
    from noisereduce_tpu.models.spectral_gate import _gate_stationary_jnp

    out, vjp_fn = jax.vjp(
        lambda c, t: _gate_stationary_jnp(c, t, cfg, "matmul"),
        chunk, noise_thresh,
    )
    return out, vjp_fn


def _fused_stat_bwd(cfg, interpret, vjp_fn, g):
    return vjp_fn(g)


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

    def spectra_kernel(b_ref, c_ref, s_ref, re_ref, im_ref, tc, ts, bv, sem):
        sk(b_ref, c_ref[0], s_ref[0], re_ref, im_ref, tc, ts, bv, sem)

    plane_spec = pl.BlockSpec(
        (1, t_pad, _FT), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    re_w, im_w = pl.pallas_call(
        spectra_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
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
    blocks_spec = pl.BlockSpec(memory_space=pltpu.ANY)
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
                      re_ref, im_ref, mask_ref, tc, ts, y, bv, sem):
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
        thr_tiles = _thr_lane_layout(noise_thresh, n_bins, n_tiles)
        thr_spec = pl.BlockSpec(
            (1, 8, _FT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
        )
        ask = functools.partial(
            _as_kernel,
            n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, ext=ext, t_real=n_frames,
            bin0_base=bin0_base, col_dc=col_dc, n_bins=n_bins, scale=scale,
            top_db=80.0, prop=cfg.prop_decrease, vt=vt, prec=prec,
            boundary=boundary,
        )

        def as_kernel(b_ref, c_ref, s_ref, t_ref, re_ref, im_ref, mask_ref,
                      tc, ts, y, bv, sem):
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
    interpret: bool = False,
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
    """
    return _fused_chunked_cvjp(
        y2d, noise_thresh, cfg, chunk_size, padding, interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_chunked_cvjp(y2d, noise_thresh, cfg, chunk_size, padding, interpret):
    return _fused_chunked_impl(
        y2d, noise_thresh, cfg, chunk_size, padding, interpret
    )


def _fused_chunked_fwd(y2d, noise_thresh, cfg, chunk_size, padding, interpret):
    from noisereduce_tpu.models.spectral_gate import (
        _gate_nonstationary_jnp, _gate_stationary_jnp,
    )
    from noisereduce_tpu.parallel.chunking import process_chunked

    if noise_thresh is None:
        def run(y):
            return process_chunked(
                lambda c: _gate_nonstationary_jnp(c, cfg, "matmul"),
                y, chunk_size, padding,
            )

        out, vjp_fn = jax.vjp(run, y2d)
        return out, (vjp_fn, False)

    def run(y, t):
        return process_chunked(
            lambda c, tt: _gate_stationary_jnp(c, tt, cfg, "matmul"),
            y, chunk_size, padding, extra=(t,),
        )

    out, vjp_fn = jax.vjp(run, y2d, noise_thresh)
    return out, (vjp_fn, True)


def _fused_chunked_bwd(cfg, chunk_size, padding, interpret, res, g):
    vjp_fn, has_thresh = res
    grads = vjp_fn(g)
    return grads if has_thresh else (grads[0], None)


_fused_chunked_cvjp.defvjp(_fused_chunked_fwd, _fused_chunked_bwd)


def _fused_chunked_impl(y2d, noise_thresh, cfg, chunk_size, padding, interpret):
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
    # k overlapping dynamic-slices of the padded signal. (A phase-aligned
    # whole-row jnp.take gather and a vmapped large-slice gather were both
    # tried and are bit-identical but SLOWER on v5e — XLA lowers row
    # gathers poorly; the strided slices fuse into the stack.)
    right = max(0, (k - 1) * chunk_size + need - n - left)
    ypad = jnp.pad(y2d.astype(jnp.float32), [(0, 0), (left, right)])
    parts = [
        jax.lax.dynamic_slice_in_dim(ypad, i * chunk_size, need, axis=-1)
        for i in range(k)
    ]
    ext_sig = jnp.stack(parts, axis=1)  # (ch, k, need)
    if bpad % hop == 0:
        # scipy's per-chunk boundary zeros (positions outside
        # [bpad, bpad + view)) and the nb_pad row padding are applied by
        # the kernel right after its DMA — XLA ships the raw rows, padded
        # only to the 8-row DMA alignment Mosaic requires
        boundary = (bpad, view)
        n8 = -(-n_blocks // 8) * 8
        blocks = jnp.pad(
            ext_sig.reshape(ch * k, n_blocks, hop),
            [(0, 0), (0, n8 - n_blocks), (0, 0)],
        )
    else:  # unreachable for supported geometries (r in {2, 4})
        boundary = None
        pos = jnp.arange(need, dtype=jnp.int32)
        ext_sig = jnp.where((pos >= bpad) & (pos < bpad + view), ext_sig, 0.0)
        blocks = ext_sig.reshape(ch * k, n_blocks, hop)
        blocks = jnp.pad(blocks, [(0, 0), (0, nb_pad - n_blocks), (0, 0)])

    core = _fused_gate_from_blocks(
        blocks, cfg, view, interpret, noise_thresh,
        out_slice=(padding, chunk_size), fast=fast, boundary=boundary,
    )
    if core.shape[-1] < chunk_size:  # tiny paddings: istft tail zero-fill
        core = jnp.pad(core, [(0, 0), (0, chunk_size - core.shape[-1])])
    out = core.reshape(ch, k * chunk_size)[:, :n]
    return out.astype(y2d.dtype)


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
    out, vjp_fn = jax.vjp(lambda a: gate._call_jnp(a, None, "matmul"), x)
    return out, vjp_fn


def _fused_tpugate1_bwd(gate, interpret, vjp_fn, g):
    return vjp_fn(g)


_fused_tpugate_cvjp1.defvjp(_fused_tpugate1_fwd, _fused_tpugate1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_tpugate_cvjp2(x, xn, gate, interpret):
    return _fused_torch_impl(x, xn, gate, interpret)


def _fused_tpugate2_fwd(x, xn, gate, interpret):
    out, vjp_fn = jax.vjp(
        lambda a, b: gate._call_jnp(a, b, "matmul"), x, xn
    )
    return out, vjp_fn


def _fused_tpugate2_bwd(gate, interpret, vjp_fn, g):
    return vjp_fn(g)


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



def _torch_merged_halo(freq_taps) -> int:
    """Tile halo for the merged torch kernel: 2 Hann-stencil levels plus
    the (SVD rank-1) frequency-smoothing half-width when smoothing is on."""
    if freq_taps is None:
        return _HALO
    return (len(freq_taps) - 1) // 2 + 2


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
        core=_FT - 2 * halo, prec=prec,
    )
    bk = functools.partial(
        _apply_istft_kernel,
        n_tb=n_tb, n_tiles=n_tiles, r=r, hop=hop, bin0_base=bin0_base,
        col_dc=col_dc, n_bins=n_bins, post=1.0, core=_FT - 2 * halo,
        prec=prec,
    )
    fs = functools.partial(
        _freq_smooth_blend_phase, n_tb=n_tb, t_real=n_frames, prop=None,
        prec=prec,
    )

    blocks_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    cmat_spec = pl.BlockSpec(
        (1, hop, _FT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    idft_spec = pl.BlockSpec(
        (1, _FT, hop), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
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
    out_shape = jax.ShapeDtypeStruct((B, t_pad, hop), jnp.float32)

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
                       re_s, im_s, mask_s, tc, ts, y_s, bv, sem):
                mt(b_ref, c_ref[0], s_ref[0], ma_ref, re_s, im_s, mask_s,
                   tc, ts, y_s, bv, sem)
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, ma_spec,
                        idft_spec, idft_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np),
                jnp.asarray(ma_np), jnp.asarray(ci_np), jnp.asarray(si_np),
            )
        else:
            def kernel(b_ref, c_ref, s_ref, ma_ref, band_ref, ci_ref, si_ref,
                       out_ref, re_s, im_s, mask_s, tc, ts, y_s, bv, sem):
                mt(b_ref, c_ref[0], s_ref[0], ma_ref, re_s, im_s, mask_s,
                   tc, ts, y_s, bv, sem)
                fs(mask_s, band_ref[0])
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref)

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
                       re_s, im_s, mask_s, tc, ts, y_s, bv, sem):
                ask(b_ref, c_ref[0], s_ref[0], t_ref[0, 0], re_s, im_s,
                    mask_s, tc, ts, y_s, bv, sem)
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref)

            in_specs = [blocks_spec, cmat_spec, cmat_spec, thr_spec,
                        idft_spec, idft_spec]
            operands = (
                blocks, jnp.asarray(c_np), jnp.asarray(s_np), thr_tiles,
                jnp.asarray(ci_np), jnp.asarray(si_np),
            )
        else:
            def kernel(b_ref, c_ref, s_ref, t_ref, band_ref, ci_ref, si_ref,
                       out_ref, re_s, im_s, mask_s, tc, ts, y_s, bv, sem):
                ask(b_ref, c_ref[0], s_ref[0], t_ref[0, 0], re_s, im_s,
                    mask_s, tc, ts, y_s, bv, sem)
                fs(mask_s, band_ref[0])
                bk(re_s, im_s, mask_s, ci_ref[0], si_ref[0], out_ref)

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

    blocks_spec = pl.BlockSpec(memory_space=pltpu.ANY)
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
                      re_ref, im_ref, mask_ref, tc, ts, y, bv, sem):
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
                      re_ref, im_ref, mask_ref, tc, ts, y, bv, sem):
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

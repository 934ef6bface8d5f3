"""In-kernel bodies of the fused Pallas gate (Mosaic TPU).

The per-(chunk, F-tile) kernel phases: hop-block DFT spectra with the
periodic-Hann frequency stencil, the filtfilt IIR / dB-threshold /
moving-average mask variants, blockwise time smoothing, in-tile banded
frequency smoothing, and the mask-apply + inverse-DFT + aligned-OLA
synthesis kernel. Pure kernel code — geometry and constant tables come
from ``.geometry``; the pallas_call builders live in ``.dispatch``.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from noisereduce_tpu.ops.pallas.geometry import (
    _CORE,
    _FT,
    _HALO,
    _HIGHEST,
    _TB,
)

# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------
# Block-loop strategy: the per-cell phase loops iterate over n_tb (or nti)
# time blocks with VMEM reads/writes at tb-dependent offsets. A traced
# fori_loop makes every slice a DYNAMIC address (scalar-core address setup
# serializes against the vector pipeline); a Python loop makes every offset
# a compile-time constant. NRTPU_KERNEL_UNROLL=0 restores the rolled loops
# (smaller Mosaic programs, slower steady state).
_UNROLL = os.environ.get("NRTPU_KERNEL_UNROLL", "1") != "0"


def _floop(n, body, init=0):
    """fori_loop(0, n, body, init) with optional full unroll (static n)."""
    if _UNROLL and isinstance(n, (int, np.integer)):
        carry = init
        for tb in range(int(n)):
            carry = body(tb, carry)
        return carry
    return jax.lax.fori_loop(0, n, body, init)


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
    prec=_HIGHEST, boundary=None, direct=False,
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
    bf16_blocks = blocks_ref.dtype == jnp.bfloat16

    @pl.when(j == 0)
    def _():
        if boundary is None:
            dma = pltpu.make_async_copy(blocks_hbm.at[i], blocks_ref, dma_sem)
            dma.start()
            dma.wait()
        elif bf16_blocks:
            # bf16 blocks (the fast chunked path): copy the raw rows and
            # apply the boundary + tail zeros at READ time in the direct
            # body (value masking) — bf16 sublane tiling makes partial-row
            # stores awkward, and the masking is a cheap VPU compare.
            n_src = blocks_hbm.shape[1]
            dma = pltpu.make_async_copy(
                blocks_hbm.at[i], blocks_ref.at[pl.ds(0, n_src)], dma_sem
            )
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

    if direct:
        # ---- direct windowed-DFT variant (bf16 fast path): r accumulating
        # dots per block against _direct_dft_consts_np matrices (window,
        # scale, and per-shift phases all folded). No FB staging, twiddle
        # combine, Hann stencil, or Hermitian fix — the whole VPU phase of
        # the factorized path disappears; the r-fold MXU flops are cheap at
        # single-pass bf16 (prec == DEFAULT).
        cs_d = jnp.concatenate([c_ref[...], s_ref[...]], axis=1)

        def direct_body(tb, masked):
            sblk = pl.multiple_of(tb * _TB, _TB)
            # match the consts' dtype (bf16): a bf16 x bf16 DEFAULT dot is
            # bit-identical to the f32 x f32 DEFAULT dot it replaces (both
            # feed the MXU bf16-truncated operands)
            window = blocks_ref[pl.ds(sblk, _TB + ext), :].astype(cs_d.dtype)
            if masked:
                # read-time boundary masking (see the DMA prologue): zeros
                # outside [bpad, bpad + view), which also covers the
                # un-DMA'd scratch tail (the caller asserts
                # n_src * hop >= bpad + view)
                bpad, view = boundary
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (_TB + ext, hop), 0
                ) + sblk
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (_TB + ext, hop), 1
                )
                pos = rows * hop + cols
                window = jnp.where(
                    (pos >= bpad) & (pos < bpad + view), window, 0.0
                )
            acc = jnp.zeros((_TB, 2 * _FT), jnp.float32)
            for k in range(r):
                a = jax.lax.slice_in_dim(window, k, k + _TB, axis=0)
                ck = jax.lax.slice_in_dim(cs_d, k * hop, (k + 1) * hop, axis=0)
                acc = acc + jnp.dot(
                    a, ck, preferred_element_type=jnp.float32, precision=prec
                )
            re_ref[0, pl.ds(sblk, _TB), :] = jax.lax.slice_in_dim(
                acc, 0, _FT, axis=1
            )
            im_ref[0, pl.ds(sblk, _TB), :] = jax.lax.slice_in_dim(
                acc, _FT, 2 * _FT, axis=1
            )

        if bf16_blocks and boundary is not None:
            # Only blocks whose (_TB + ext)-row read window can touch a
            # position outside [bpad, bpad + view) need the mask — the
            # first block (head zeros) and the last block(s) (tail zeros +
            # the un-DMA'd scratch rows). Interior blocks skip the two
            # iotas + compares + select entirely (statically unrolled head/
            # tail, one un-masked fori over the interior).
            bpad, view = boundary
            head_blocks = 0 if bpad == 0 else -(-bpad // (_TB * hop))
            tail_from = n_tb
            for tb in range(n_tb):
                if (tb * _TB + _TB + ext) * hop > bpad + view:
                    tail_from = tb
                    break
            head_blocks = min(head_blocks, n_tb)
            tail_from = max(tail_from, head_blocks)
            for tb in range(head_blocks):
                direct_body(tb, True)
            _floop(
                tail_from - head_blocks,
                lambda t, c: (direct_body(t + head_blocks, False), 0)[1], 0,
            )
            for tb in range(tail_from, n_tb):
                direct_body(tb, True)
        else:
            _floop(n_tb, lambda tb, c: (direct_body(tb, False), 0)[1], 0)
        return

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

    _floop(n_tb, body, 0)


def _time_band_rows(vt, H):
    """(TB, 2H+TB) banded matrix of the time-smoothing taps, built at trace
    time from iota selects (loop-invariant, hoisted): row t of the output
    block is sum_d vt[d] * window[H - nt + d + t]."""
    nt = (len(vt) - 1) // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (_TB, 2 * H + _TB), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (_TB, 2 * H + _TB), 1)
    off = cols - rows - H + nt
    w = jnp.zeros((_TB, 2 * H + _TB), jnp.float32)
    for d in range(len(vt)):
        w = jnp.where(off == d, jnp.float32(vt[d]), w)
    return w


def _time_smooth_phase(src_ref, mask_ref, *, n_tb, t_real, vt, mm=False,
                       prec=_HIGHEST):
    """Blockwise time-axis 'same' triangular conv from src_ref (unsmoothed
    mask) into the mask output ref, with 16-row aligned halo reads
    (full-plane rolls blow the VMEM temp budget).

    Two engines: on the f32 HIGHEST path the tap loop runs on the VPU on
    purpose — a banded-matmul variant measured ~2 ms/960s SLOWER on v5e
    because that kernel is MXU-throughput-bound on its 6-pass dots. On the
    bf16 direct path (``mm=True``) the MXU has slack, so the same stencil
    runs as ONE (TB, 2H+TB) banded dot per block instead of ~2nt+1 VPU
    passes. Rows past t_real are re-zeroed (smoothing spreads into them;
    downstream must see no frames there)."""
    t_pad = src_ref.shape[0]
    nt = (len(vt) - 1) // 2
    H = 16  # halo rows (requires nt <= 16, see fused_gate_supported)
    band = _time_band_rows(vt, H) if mm else None

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
        if mm:
            acc = jnp.dot(
                band, window, preferred_element_type=jnp.float32,
                precision=prec,
            )
        else:
            acc = jnp.zeros((_TB, _FT), jnp.float32)
            for d in range(2 * nt + 1):
                sl = jax.lax.slice_in_dim(
                    window, H - nt + d, H - nt + d + _TB, axis=0
                )
                acc = acc + sl * jnp.float32(vt[d])
        ridx = jax.lax.broadcasted_iota(jnp.int32, (_TB, _FT), 0) + s
        mask_ref[0, pl.ds(s, _TB), :] = jnp.where(ridx < t_real, acc, 0.0)
        return 0

    _floop(n_tb, smooth_body, 0)


def _am_kernel(
    blocks_hbm, c_ref, s_ref, re_ref, im_ref, mask_ref, tc_ref, ts_ref, y_ref,
    blocks_ref, dma_sem, l_ref, lt_ref, dfwd_ref, dbwd_ref,
    *, n_tb, n_tiles, r, hop, ext, t_real, bin0_base, col_dc, n_bins,
    scale, b, thresh, slope, vt, core=_CORE, prec=_HIGHEST, boundary=None,
    direct=False, tb_iir=_TB,
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
        boundary=boundary, direct=direct,
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
    #
    # ``tb_iir`` is the carry-block size: the serial carry chain has
    # t_pad/tb_iir steps, while the L-dot MACs GROW with tb_iir (lower-
    # triangular (tb_iir, tb_iir) operand). The f32 HIGHEST path keeps
    # tb_iir == _TB (MXU-bound); the bf16 fast path widens it (dispatch
    # picks the largest divisor of t_pad up to 512) — single-pass dots are
    # nearly free there and the chain's serial latency dominates.
    ti = tb_iir
    nti = t_pad // ti
    d_fwd = dfwd_ref[...]
    d_bwd = dbwd_ref[...]

    def mag_at(start):
        rr = re_ref[0, pl.ds(start, ti), :]
        ii = im_ref[0, pl.ds(start, ti), :]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (ti, _FT), 0) + start
        return jnp.where(ridx < t_real, jnp.sqrt(rr * rr + ii * ii), 0.0)

    def fwd_dot(start):
        xb = mag_at(start)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (ti, _FT), 0) + start
        xb = jnp.where(ridx == 0, xb * jnp.float32(1.0 / b), xb)
        y_ref[pl.ds(start, ti), :] = jnp.dot(
            l_ref[...], xb, preferred_element_type=jnp.float32,
            precision=prec,
        )

    fwd_dot(pl.multiple_of(0, ti))

    # carry chain: y_k = P_k + c_{k-1}·d_fwd; c_k = y_k[last] (d_fwd's last
    # entry is a^tb_iir, so reading the updated block row gives the next
    # carry)
    def fwd_body(kb, carry):
        fwd_dot(pl.multiple_of(jnp.minimum(kb + 1, nti - 1) * ti, ti))
        start = pl.multiple_of(kb * ti, ti)
        yb = y_ref[pl.ds(start, ti), :] + carry * d_fwd
        y_ref[pl.ds(start, ti), :] = yb
        return jax.lax.slice_in_dim(yb, ti - 1, ti, axis=0)

    carry0 = jnp.zeros((1, _FT), jnp.float32)
    _floop(nti, fwd_body, carry0)

    def bwd_dot(start):
        yb = y_ref[pl.ds(start, ti), :]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (ti, _FT), 0) + start
        yb = jnp.where(ridx == t_real - 1, yb * jnp.float32(1.0 / b), yb)
        yb = jnp.where(ridx > t_real - 1, 0.0, yb)
        mask_ref[0, pl.ds(start, ti), :] = jnp.dot(
            lt_ref[...], yb, preferred_element_type=jnp.float32,
            precision=prec,
        )

    bwd_dot(pl.multiple_of((nti - 1) * ti, ti))

    def bwd_body(k, carry):
        kb = nti - 1 - k
        bwd_dot(pl.multiple_of(jnp.maximum(kb - 1, 0) * ti, ti))
        start = pl.multiple_of(kb * ti, ti)
        wb = mask_ref[0, pl.ds(start, ti), :] + carry * d_bwd
        nxt = jax.lax.slice_in_dim(wb, 0, 1, axis=0)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (ti, _FT), 0) + start
        mb = mag_at(start)
        safe_w = jnp.where(wb == 0.0, 1.0, wb)
        ratio = (mb - wb) / safe_w
        mask = jax.nn.sigmoid((ratio - jnp.float32(thresh)) * jnp.float32(slope))
        mask = jnp.where(ridx < t_real, mask, 0.0)
        if vt is None:
            mask_ref[0, pl.ds(start, ti), :] = mask
        else:
            y_ref[pl.ds(start, ti), :] = mask
        return nxt

    _floop(nti, bwd_body, carry0)

    # ---- phase 4: blockwise time-axis triangular smoothing ---------------
    if vt is not None:
        _time_smooth_phase(y_ref, mask_ref, n_tb=n_tb, t_real=t_real, vt=vt,
                           mm=direct, prec=prec)


def _as_kernel(
    blocks_hbm, c_ref, s_ref, thresh_ref, re_ref, im_ref, mask_ref,
    tc_ref, ts_ref, y_ref, blocks_ref, dma_sem,
    *, n_tb, n_tiles, r, hop, ext, t_real, bin0_base, col_dc, n_bins,
    scale, top_db, prop, vt, self_stats=False, n_std=0.0, core=_CORE,
    prec=_HIGHEST, boundary=None, direct=False,
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
        boundary=boundary, direct=direct,
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

    maxdb = _floop(n_tb, db_body, jnp.full((1, _FT), -1e30, jnp.float32))

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
        sm, sq = _floop(n_tb, mom_body, (z, z))
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

    _floop(n_tb, mask_body, 0)

    if vt is not None:
        _time_smooth_phase(y_ref, mask_ref, n_tb=n_tb, t_real=t_real, vt=vt,
                           mm=direct, prec=prec)


def _mt_kernel(
    blocks_hbm, c_ref, s_ref, band_ref, re_ref, im_ref, mask_ref,
    tc_ref, ts_ref, y_ref, blocks_ref, dma_sem,
    *, n_tb, n_tiles, r, hop, ext, t_real, bin0_base, col_dc, n_bins,
    scale, n_thresh, temp, prop, vt, core=_CORE, prec=_HIGHEST,
    direct=False,
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
        direct=direct,
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

    _floop(n_tb, mag_body, 0)

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

    _floop(n_tb, ma_body, 0)

    # ---- pass 3: time-axis smoothing (SVD rank-1 of the torch kernel) ----
    if vt is not None:
        # stage the unsmoothed mask in y_ref (mag is dead), then smooth back
        def copy_body(tb, _):
            s = pl.multiple_of(tb * _TB, _TB)
            y_ref[pl.ds(s, _TB), :] = mask_ref[0, pl.ds(s, _TB), :]
            return 0

        _floop(n_tb, copy_body, 0)
        _time_smooth_phase(y_ref, mask_ref, n_tb=n_tb, t_real=t_real, vt=vt,
                           mm=direct, prec=prec)


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
    prec=_HIGHEST, inv=None, direct=False, oacc_ref=None,
):
    """One (chunk, F-tile) cell: out_block[m] = iDFT_hop(sum_k tw'_k·Y[m-k])
    with Y = HannStencil(Z_w·mask)·win_sum computed on the fly per (_TB+8)-row
    window — aligned reads with an 8-row lookback, aligned accumulating
    writes, revisited across tiles."""
    j = pl.program_id(1)
    bin0 = bin0_base + j * core

    H = 8  # lookback rows (covers k <= r-1 <= 7)
    # fast path: accumulate the OLA in a dedicated f32 VMEM plane and write
    # the (bf16) HBM output once, in the last tile's epilogue — halves the
    # OLA plane's HBM write and the tail read
    acc_ref = oacc_ref if oacc_ref is not None else out_ref

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if direct:
        # ---- direct synthesis variant (bf16 fast path): per shift k, the
        # MASKED spectra (un-rewindowed) hit _direct_idft_consts_np matrices
        # with the synthesis window applied in time — no Hermitian fix or
        # Hann stencil (halo rows of the matrices are zero).
        dcs = [
            jnp.concatenate(
                [
                    jax.lax.slice_in_dim(
                        ci_ref[...], k * _FT, (k + 1) * _FT, axis=0
                    ),
                    jax.lax.slice_in_dim(
                        si_ref[...], k * _FT, (k + 1) * _FT, axis=0
                    ),
                ],
                axis=0,
            )
            for k in range(r)
        ]

        def direct_body(tb, carry):
            pre_re, pre_im = carry
            s = pl.multiple_of(tb * _TB, _TB)
            mm = mask_ref[0, pl.ds(s, _TB), :]
            cur_re = re_ref[0, pl.ds(s, _TB), :] * mm
            cur_im = im_ref[0, pl.ds(s, _TB), :] * mm
            wre = jnp.concatenate([pre_re, cur_re], axis=0)
            wim = jnp.concatenate([pre_im, cur_im], axis=0)
            acc = jnp.zeros((_TB, hop), jnp.float32)
            for k in range(r):
                u = jnp.concatenate(
                    [
                        jax.lax.slice_in_dim(wre, H - k, H - k + _TB, axis=0),
                        jax.lax.slice_in_dim(wim, H - k, H - k + _TB, axis=0),
                    ],
                    axis=1,
                )
                # bf16 consts: pre-truncating u matches what the DEFAULT
                # dot would do to an f32 operand anyway (bit-identical)
                acc = acc + jnp.dot(
                    u.astype(dcs[k].dtype), dcs[k],
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
            acc_ref[0, pl.ds(s, _TB), :] = acc_ref[0, pl.ds(s, _TB), :] + acc
            return (
                jax.lax.slice_in_dim(cur_re, _TB - H, _TB, axis=0),
                jax.lax.slice_in_dim(cur_im, _TB - H, _TB, axis=0),
            )

        carry0 = (
            jnp.zeros((H, _FT), jnp.float32),
            jnp.zeros((H, _FT), jnp.float32),
        )
        _floop(n_tb, direct_body, carry0)
    else:
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

        def u_for(pre_re, pre_im, cur_re, cur_im):
            """Synthesis operand for one block from its H-row lookback +
            current rows: rows of w* are Y[s-H .. s+_TB);
            Y[m-k] = w*[H - k + (m - s)]."""
            wre = jnp.concatenate([pre_re, cur_re], axis=0)
            wim = jnp.concatenate([pre_im, cur_im], axis=0)
            parts_re = [
                jax.lax.slice_in_dim(wre, H - k, H - k + _TB, axis=0)
                for k in range(r)
            ]
            parts_im = [
                jax.lax.slice_in_dim(wim, H - k, H - k + _TB, axis=0)
                for k in range(r)
            ]
            ure, uim = _twiddle_combine(parts_re, parts_im, r, tw_rows)
            return jnp.concatenate([ure, uim], axis=1)

        # Software-pipelined one block ahead, like the spectra phase: the
        # whole VPU chain (mask multiply, Hermitian fix, Hann stencil,
        # twiddle combine) for block tb+1 is computed in the same loop body
        # as block tb's synthesis dot — the two are independent, so Mosaic
        # co-issues the VPU chain under the MXU passes (measured round 5:
        # the serial body ran dots+VPU back to back, ~5 ms/960 s of VPU
        # fully exposed). The operand u and the H-row lookback ride the
        # carry; every step is row-local, so results are bit-identical.
        def y_clamped(tb):
            s = pl.multiple_of(
                jnp.minimum(tb, n_tb - 1) * _TB, _TB
            )
            return y_window(s)

        def body(tb, carry):
            u_cur, cur_re, cur_im = carry
            # prefetch block tb+1's operand (VPU; clamped at the tail — the
            # last iteration recomputes block n_tb-1's operand and drops it)
            nxt_re, nxt_im = y_clamped(tb + 1)
            u_next = u_for(
                jax.lax.slice_in_dim(cur_re, _TB - H, _TB, axis=0),
                jax.lax.slice_in_dim(cur_im, _TB - H, _TB, axis=0),
                nxt_re, nxt_im,
            )
            # one (TB, 256) @ (256, hop) dot: real/imag operands stacked
            # along the contraction — doubles the MXU K depth vs two 128-K
            # dots
            s = pl.multiple_of(tb * _TB, _TB)
            pk = jnp.dot(
                u_cur, cisi, preferred_element_type=jnp.float32,
                precision=prec,
            )
            out_ref[0, pl.ds(s, _TB), :] = out_ref[0, pl.ds(s, _TB), :] + pk
            return (u_next, nxt_re, nxt_im)

        zH = jnp.zeros((H, _FT), jnp.float32)
        cur0_re, cur0_im = y_clamped(0)
        carry0 = (u_for(zH, zH, cur0_re, cur0_im), cur0_re, cur0_im)
        _floop(n_tb, body, carry0)

    if inv is not None or oacc_ref is not None:
        # OLA-envelope division (and, on the fast path, the single cast
        # from the f32 accumulator into the bf16 HBM output) folded into
        # the kernel: runs after the LAST tile's contributions land (saves
        # XLA a full read+write pass over the output). The grid iterates j
        # innermost, so j == n_tiles-1 sees the completed accumulation.
        @pl.when(pl.program_id(1) == n_tiles - 1)
        def _():
            def scale_body(tb, _):
                s = pl.multiple_of(tb * _TB, _TB)
                rowsv = acc_ref[0, pl.ds(s, _TB), :]
                if inv is not None:
                    rowsv = rowsv * inv[0, pl.ds(s, _TB), :]
                out_ref[0, pl.ds(s, _TB), :] = rowsv.astype(out_ref.dtype)
                return 0

            t_pad = out_ref.shape[1]
            _floop(t_pad // _TB, scale_body, 0)


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

    _floop(n_tb, body, 0)

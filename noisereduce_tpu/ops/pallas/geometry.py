"""Host-side geometry for the fused Pallas gate pipeline.

Trace-time constant tables (hop-block DFT matrices, banded smoothing
matrices, threshold lane layouts), chunk/tile geometry, VMEM budgets and
the merged/split eligibility predicates. Everything here runs on the host
at trace time; the kernel bodies live in ``.kernels`` and the pallas_call
builders in ``.dispatch`` / ``.torch_dispatch``.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from noisereduce_tpu.config import StftConfig

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
def _direct_dft_consts_np(
    cfg: StftConfig, n_tiles: int, halo: int, scale: float
):
    """Direct windowed-DFT analysis matrices (the bf16 fast path).

    C/S (n_tiles, r*hop, _FT): with frame m spanning hop-blocks m..m+r-1
    consecutively, row p of the contraction is frame-local sample p, so
    X_w[m] = sum_k blocks[m+k] @ C[j][k*hop:(k+1)*hop]. The analysis
    window and the convention's ``scale`` are folded in, and each lane is
    evaluated directly at its own bin — the factorized path's twiddle
    combine, Hann stencil, and Hermitian fix all disappear (their VPU cost
    is the point of this variant). Out-of-range bins give zero columns.

    Requires win == n_fft (already gated): the frame IS the DFT span.
    """
    from noisereduce_tpu.ops.stft import _analysis_window_np

    win = cfg.frame_length
    hop = cfg.hop_length
    n_bins = cfg.n_bins
    w = _analysis_window_np(cfg).astype(np.float64)
    u = np.arange(win, dtype=np.float64)[:, None]
    c = np.zeros((n_tiles, win, _FT), np.float64)
    s = np.zeros((n_tiles, win, _FT), np.float64)
    for j in range(n_tiles):
        k = _tile_bins(j, halo)[None, :].astype(np.float64)
        ang = -2.0 * np.pi * u * k / cfg.n_fft
        valid = ((k >= 0) & (k < n_bins)).astype(np.float64)
        c[j] = np.cos(ang) * w[:, None] * scale * valid
        s[j] = np.sin(ang) * w[:, None] * scale * valid
    return c.astype(np.float32), s.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _direct_idft_consts_np(
    cfg: StftConfig, n_tiles: int, halo: int, post: float
):
    """Direct synthesis matrices (the bf16 fast path).

    DC/DS (n_tiles, r*_FT, hop): out_block[m] = sum_k ( ReY[m-k] @
    DC[j][k*_FT:(k+1)*_FT] + ImY[m-k] @ DS[j][...] ) where Y is the MASKED
    spectra plane (un-rewindowed — the synthesis window is applied in the
    TIME domain here, w[k*hop+q], which is exactly the factorized path's
    frequency-domain Hann stencil by the convolution theorem). The irfft
    Hermitian bin weights, 1/n_fft, and the convention's ``post`` scale are
    folded. Rows for halo lanes / out-of-range bins are zero so every bin
    contributes to the OLA exactly once.
    """
    from noisereduce_tpu.ops.stft import _analysis_window_np

    win = cfg.frame_length
    hop = cfg.hop_length
    r = win // hop
    n_bins = cfg.n_bins
    w = _analysis_window_np(cfg).astype(np.float64)
    lane = np.arange(_FT)
    dc = np.zeros((n_tiles, r * _FT, hop), np.float64)
    ds = np.zeros((n_tiles, r * _FT, hop), np.float64)
    q = np.arange(hop, dtype=np.float64)[None, :]
    for j in range(n_tiles):
        k = _tile_bins(j, halo)[:, None].astype(np.float64)
        wk = np.where(
            (k > 0) & ((k < cfg.n_fft / 2) | (cfg.n_fft % 2 == 1)), 2.0, 1.0
        )
        core = ((lane >= halo) & (lane < _FT - halo))[:, None]
        valid = ((k >= 0) & (k < n_bins)) & core
        for kk in range(r):
            u = kk * hop + q  # frame-local sample of block-row q at shift kk
            ang = 2.0 * np.pi * k * u / cfg.n_fft
            wsyn = w[kk * hop : (kk + 1) * hop][None, :]
            dc[j, kk * _FT : (kk + 1) * _FT] = (
                wk * np.cos(ang) * wsyn * post / cfg.n_fft
            ) * valid
            ds[j, kk * _FT : (kk + 1) * _FT] = (
                -wk * np.sin(ang) * wsyn * post / cfg.n_fft
            ) * valid
    return dc.astype(np.float32), ds.astype(np.float32)


def _fast_consts_bf16(*arrs):
    """bf16-truncate direct-kernel const matrices for COMPILED fast-mode
    dispatch. The fast mode's dots are single-pass Mosaic DEFAULT, which
    reduces f32 operands to bf16 on the way into the MXU anyway —
    pre-truncating (RNE) is designed to be a device no-op
    (benchmarks/check_bf16_consts.py verifies on-chip) and HALVES the
    matrices' per-grid-cell DMA traffic (they are re-fetched on every
    (chunk, F-tile) cell). NOT applied in interpret mode, where DEFAULT
    precision is true f32 and the tests use it as an f32 oracle of the
    direct transform."""
    bf16 = np.dtype(ml_dtypes.bfloat16)
    return tuple(a.astype(bf16) for a in arrs)


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
    # constants bound covers the LARGER (direct bf16 fast path) variant:
    # double-buffered (r*hop, _FT) c/s analysis + (r*_FT, hop) dc/ds
    # synthesis matrices at r = 4, plus band/IIR tiles
    consts = (
        8 * 4 * hop * _FT * 4
        + 2 * (3 * _FT * _FT * 4)
        + 4 * _TB * _TB * 4
    )
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


def _torch_merged_halo(freq_taps) -> int:
    """Tile halo for the merged torch kernel: 2 Hann-stencil levels plus
    the (SVD rank-1) frequency-smoothing half-width when smoothing is on."""
    if freq_taps is None:
        return _HALO
    return (len(freq_taps) - 1) // 2 + 2

"""Fully fused Pallas TPU gate: one merged Mosaic kernel per (chunk, F-tile).

The staged XLA pipeline (ops/stft.py + ops/pallas_mask.py + ops/dsp.py)
materializes the framed signal (4x the input at hop = win/4), the magnitude,
the IIR floor, and R pad+add OLA intermediates — ~6 HBM round-trips over
arrays that are 4-8x the audio. Here the whole gate runs inside Pallas
kernels, each keeping a chunk's full time axis resident in VMEM per
frequency tile, with the spectra/mask planes never touching HBM on the
merged path.

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
3. **Overlapped frequency tiles.** Each 128-lane tile carries a core plus
   halo bins per side (recomputed, bit-identical), so the Hann stencils and
   the in-tile banded frequency smoothing stay tile-local; halo bins are
   zeroed out of the inverse-DFT constants so every bin contributes exactly
   once.

Reference semantics: scipy stft/istft as called by the NumPy engines
(nonstationary.py:51-57,90-95; stationary.py:83-126) and torch's
conventions for TPUGate (torchgate.py:200-264).

Modules: ``geometry`` (host-side tables, budgets, predicates), ``kernels``
(Mosaic kernel bodies), ``dispatch`` (scipy-convention builders + custom
VJPs), ``torch_dispatch`` (TPUGate builders). The public surface is also
re-exported at ``noisereduce_tpu.ops.pallas_pipeline``.
"""
from noisereduce_tpu.ops.pallas.dispatch import (  # noqa: F401
    fused_gate_chunked,
    fused_gate_nonstationary,
    fused_gate_stationary,
    fused_gate_supported,
    fused_stationary_threshold,
    fused_threshold_supported,
)
from noisereduce_tpu.ops.pallas.torch_dispatch import (  # noqa: F401
    fused_tpugate,
    fused_tpugate_supported,
)

__all__ = [
    "fused_gate_chunked",
    "fused_gate_nonstationary",
    "fused_gate_stationary",
    "fused_gate_supported",
    "fused_stationary_threshold",
    "fused_threshold_supported",
    "fused_tpugate",
    "fused_tpugate_supported",
]

"""Compatibility surface for the fused Pallas gate (split into modules).

The implementation lives in ``noisereduce_tpu.ops.pallas``:

  - ``pallas.geometry``        host-side tables, VMEM budgets, predicates
  - ``pallas.kernels``         Mosaic kernel bodies
  - ``pallas.dispatch``        scipy-convention builders + custom VJPs
  - ``pallas.torch_dispatch``  TPUGate (torch-convention) builders

This module re-exports the public entry points (plus the private names the
test-suite and profiling tools historically reached through it) so existing
imports keep working. New code should import from the package modules.
"""
from noisereduce_tpu.ops.pallas.dispatch import (  # noqa: F401
    _fused_chunked_impl,
    _fused_gate_impl,
    _fused_stft_planes,
    fused_gate_chunked,
    fused_gate_nonstationary,
    fused_gate_stationary,
    fused_gate_supported,
    fused_stationary_threshold,
    fused_threshold_supported,
)
from noisereduce_tpu.ops.pallas.geometry import (  # noqa: F401
    _CORE,
    _FT,
    _HALO,
    _MERGED_VMEM_LIMIT,
    _TB,
    _geometry,
    _merged_halo,
    _merged_supported,
    _merged_vmem_bytes,
    _torch_merged_halo,
)
from noisereduce_tpu.ops.pallas.torch_dispatch import (  # noqa: F401
    _fused_torch_impl,
    fused_tpugate,
    fused_tpugate_supported,
)

__all__ = [
    "fused_gate_nonstationary",
    "fused_gate_stationary",
    "fused_stationary_threshold",
    "fused_gate_supported",
    "fused_threshold_supported",
    "fused_gate_chunked",
    "fused_tpugate",
    "fused_tpugate_supported",
]

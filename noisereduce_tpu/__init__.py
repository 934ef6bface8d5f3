"""noisereduce_tpu — TPU-native spectral-gating noise reduction.

A ground-up JAX/XLA rebuild of the capabilities of timsainb/noisereduce
(v3.0.3): stationary and non-stationary spectral gating, chunked long-audio
processing (vmap/shard_map instead of joblib+memmap), and a differentiable
TorchGate-equivalent module (TPUGate).

Public surface:
    reduce_noise(y, sr, ...)   — drop-in reference-compatible entry point
    TPUGate                    — differentiable gate module (torch conventions)
    band_limited_noise, fftnoise, int16_to_float32, float32_to_int16
"""
from noisereduce_tpu.api import reduce_noise, reduce_noise_batch
from noisereduce_tpu.config import GateConfig, StftConfig, Convention
from noisereduce_tpu.models.tpu_gate import TPUGate
from noisereduce_tpu.streaming import StreamingGate, reduce_noise_file
from noisereduce_tpu.utils.audio import int16_to_float32, float32_to_int16
from noisereduce_tpu.utils.noise import (
    band_limited_noise,
    band_limited_noise_jax,
    fftnoise,
)

# Single-sourced from the installed distribution metadata (pyproject.toml,
# the reference's setup.py:9 counterpart). The literal fallback covers
# uninstalled source checkouts and is pinned == pyproject.toml by
# tests/test_utils.py::test_version_single_source.
try:
    from importlib.metadata import PackageNotFoundError as _PkgNotFound
    from importlib.metadata import version as _dist_version

    __version__ = _dist_version("noisereduce-tpu")
except _PkgNotFound:  # running from a source checkout
    __version__ = "0.5.0"

__all__ = [
    "reduce_noise",
    "reduce_noise_batch",
    "reduce_noise_file",
    "StreamingGate",
    "TPUGate",
    "GateConfig",
    "StftConfig",
    "Convention",
    "band_limited_noise",
    "band_limited_noise_jax",
    "fftnoise",
    "int16_to_float32",
    "float32_to_int16",
    "__version__",
]

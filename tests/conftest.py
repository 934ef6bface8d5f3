"""Test configuration: run on CPU with 8 virtual devices and float64 enabled.

Parity tests compare against the float64 reference semantics; multi-device
tests exercise shard_map on a fake 8-device mesh
(``--xla_force_host_platform_device_count=8``).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402
import subprocess  # noqa: E402

# Build the native IO runtime if absent (it is a build artifact, not
# committed); tests that need it skip gracefully if the build fails.
_root = pathlib.Path(__file__).resolve().parent.parent
if not (_root / "noisereduce_tpu" / "_native" / "libnrio.so").exists():
    try:
        subprocess.run(
            ["make", "-C", str(_root / "native")], check=False, capture_output=True
        )
    except Exception:
        pass

import jax  # noqa: E402

# The environment's sitecustomize may pre-register an accelerator platform
# (e.g. 'axon' TPU tunnel) before conftest runs; force CPU via the live
# config, not just the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

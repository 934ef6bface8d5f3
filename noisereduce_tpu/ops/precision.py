"""Trace-time matmul-precision plumbing for the staged (jnp) engines.

The staged paths pin ``Precision.HIGH`` (3-pass bf16) on their DFT / IIR
matmuls — the accuracy floor for a PRIMAL value (see BASELINE.md round 1:
TPU-default bf16-grade dots cost ~2e-3 relative on audio; HIGH lands at
~3e-4 for half of HIGHEST's cost).

The fused custom-VJPs (ops.pallas.dispatch / torch_dispatch) reuse the
staged twin only as the COTANGENT source: the value under ``jax.grad`` is
the fused HIGHEST kernel output, and the staged twin is differentiated
purely to produce gradients. Gradients are descent directions — bf16-grade
matmuls there are the standard mixed-precision training trade, and the
transposed (backward) matmuls inherit the forward ops' precision. Those
VJPs wrap the twin in :func:`cotangent_precision`, which lowers the staged
matmuls to DEFAULT (one bf16 MXU pass) unless ``NRTPU_COTANGENT_PRECISION``
(``default`` | ``high`` | ``highest``) says otherwise. On CPU the setting
is a no-op (XLA:CPU computes f32 exactly regardless), so float64 parity
tests are unaffected.
"""
from __future__ import annotations

import contextlib
import contextvars
import os

import jax

_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "nrtpu_staged_matmul_precision", default=None
)

_NAMES = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def staged_precision():
    """Precision for the staged engines' DFT/IIR matmuls (trace-time)."""
    override = _OVERRIDE.get()
    return jax.lax.Precision.HIGH if override is None else override


@contextlib.contextmanager
def cotangent_precision():
    """Scope the staged twin's matmuls to the cotangent-grade precision."""
    name = os.environ.get("NRTPU_COTANGENT_PRECISION", "default").lower()
    if name not in _NAMES:
        raise ValueError(
            f"NRTPU_COTANGENT_PRECISION={name!r}: use default|high|highest"
        )
    token = _OVERRIDE.set(_NAMES[name])
    try:
        yield
    finally:
        _OVERRIDE.reset(token)

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
    "bf16": jax.lax.Precision.DEFAULT,
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def staged_precision():
    """Precision for the staged engines' DFT/IIR matmuls (trace-time)."""
    override = _OVERRIDE.get()
    return jax.lax.Precision.HIGH if override is None else override


def _cotangent_mode() -> str:
    name = os.environ.get("NRTPU_COTANGENT_PRECISION", "bf16").lower()
    if name not in _NAMES:
        raise ValueError(
            f"NRTPU_COTANGENT_PRECISION={name!r}: use bf16|default|high|highest"
        )
    return name


@contextlib.contextmanager
def cotangent_precision():
    """Scope the staged twin's matmuls to the cotangent-grade precision."""
    token = _OVERRIDE.set(_NAMES[_cotangent_mode()])
    try:
        yield
    finally:
        _OVERRIDE.reset(token)


def cotangent_vjp(fn, primals, g):
    """``jax.vjp(fn, *primals)`` cotangent application at the configured
    precision.

    Mode ``bf16`` (the default) additionally casts float32 primals and the
    incoming cotangent to bfloat16 ON TPU — the staged twin is HBM-bound at
    training batch sizes, so halving its array bytes is worth more than the
    dot passes; the decision math inside the twin still upcasts to f32
    in-register (models.spectral_gate._mask_dtype) and the returned grads
    are cast back to the primal dtypes. On CPU (parity tests, float64 runs)
    the cast is skipped entirely, so cotangents there are bit-identical to
    differentiating the staged twin directly.
    """
    from noisereduce_tpu.models.spectral_gate import _tpu_available

    cast = (
        _cotangent_mode() == "bf16"
        and _tpu_available()
        and all(p is None or p.dtype == jax.numpy.float32 for p in primals)
    )

    def prep(p):
        if p is None:
            return None
        return p.astype(jax.numpy.bfloat16) if cast else p

    args = tuple(prep(p) for p in primals)
    with cotangent_precision():
        _, vjp_fn = jax.vjp(fn, *args)
        grads = vjp_fn(g.astype(args[0].dtype) if cast else g)
    if cast:
        grads = tuple(
            None if (gr is None or p is None) else gr.astype(p.dtype)
            for gr, p in zip(grads, primals)
        )
    return grads

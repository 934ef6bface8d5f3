"""Gradient contract of the training default (VERDICT r4 item 1).

The fused custom-VJPs compute their cotangents by differentiating the
staged jnp twin through ``ops.precision.cotangent_vjp`` under
``NRTPU_COTANGENT_PRECISION``. The default mode ``bf16`` casts f32 primals
+ cotangent to bfloat16 ON TPU (mixed-precision training trade; measured
envelope ~2e-2 max-rel vs the HIGH cotangent, re-asserted on device by
bench.py every round as ``grad_bf16_vs_high_rel_dev``). These tests pin
the mode plumbing itself:

  - on CPU, ``cotangent_vjp`` is bit-exact to differentiating the staged
    twin directly, in EVERY mode (the cast is TPU-gated and XLA:CPU
    ignores matmul precision) — the float64 parity suite's guarantee,
  - the bf16 cast path actually engages when a TPU backend is reported
    (and changes the grads), while ``high`` restores the uncast twin,
  - invalid modes fail loudly, and the precision scope maps modes to the
    documented jax.lax.Precision levels.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noisereduce_tpu.config import GateConfig
from noisereduce_tpu.models.spectral_gate import _gate_nonstationary_jnp
from noisereduce_tpu.ops import precision

RNG = np.random.default_rng(17)
CFG = GateConfig(sr=8000, stationary=False)
X = jnp.asarray(RNG.standard_normal(9000), jnp.float32)
# a fixed incoming cotangent, same shape as the twin's output
G = jnp.asarray(RNG.standard_normal(9000), jnp.float32)


def _twin(a):
    return _gate_nonstationary_jnp(a, CFG, "matmul")


def _direct_vjp():
    _, vjp_fn = jax.vjp(_twin, X)
    (g,) = vjp_fn(G)
    return np.asarray(g)


def test_default_mode_is_bf16(monkeypatch):
    monkeypatch.delenv("NRTPU_COTANGENT_PRECISION", raising=False)
    assert precision._cotangent_mode() == "bf16"


def test_invalid_mode_raises(monkeypatch):
    monkeypatch.setenv("NRTPU_COTANGENT_PRECISION", "fp8")
    with pytest.raises(ValueError, match="NRTPU_COTANGENT_PRECISION"):
        precision._cotangent_mode()


@pytest.mark.parametrize("mode", ["bf16", "high", "highest"])
def test_cpu_cotangent_bit_exact_across_modes(monkeypatch, mode):
    monkeypatch.setenv("NRTPU_COTANGENT_PRECISION", mode)
    (got,) = precision.cotangent_vjp(_twin, (X,), G)
    np.testing.assert_array_equal(np.asarray(got), _direct_vjp())


def test_bf16_cast_engages_on_tpu(monkeypatch):
    """With a TPU backend reported, the default mode casts primal +
    cotangent to bf16: grads keep the primal dtype but change value; the
    ``high`` override restores the uncast twin bit-for-bit (on CPU compute,
    precision is a TPU-lowering hint)."""
    from noisereduce_tpu.models import spectral_gate

    monkeypatch.setattr(spectral_gate, "_tpu_available", lambda: True)
    # the twin itself is backend-sensitive (banded-mm smoothing on TPU), so
    # the uncast reference must come from the same patched code path
    ref = _direct_vjp()

    monkeypatch.setenv("NRTPU_COTANGENT_PRECISION", "bf16")
    (gb,) = precision.cotangent_vjp(_twin, (X,), G)
    gb = np.asarray(gb)
    assert gb.dtype == np.float32  # grads cast back to the primal dtype
    assert not np.array_equal(gb, ref), "bf16 cast did not engage"
    scale = np.abs(ref).max()
    assert np.abs(gb - ref).max() <= 5e-2 * scale  # documented envelope

    monkeypatch.setenv("NRTPU_COTANGENT_PRECISION", "high")
    (gh,) = precision.cotangent_vjp(_twin, (X,), G)
    np.testing.assert_array_equal(np.asarray(gh), ref)


def test_scope_sets_staged_precision(monkeypatch):
    assert precision.staged_precision() == jax.lax.Precision.HIGH
    monkeypatch.setenv("NRTPU_COTANGENT_PRECISION", "bf16")
    with precision.cotangent_precision():
        assert precision.staged_precision() == jax.lax.Precision.DEFAULT
    monkeypatch.setenv("NRTPU_COTANGENT_PRECISION", "highest")
    with precision.cotangent_precision():
        assert precision.staged_precision() == jax.lax.Precision.HIGHEST
    assert precision.staged_precision() == jax.lax.Precision.HIGH

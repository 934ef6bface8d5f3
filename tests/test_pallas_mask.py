"""Fused Pallas non-stationary mask kernel vs the jnp composition.

Runs in Pallas interpreter mode on CPU (the driver/CI environment); the
compiled-kernel path is exercised on real TPU by bench.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from noisereduce_tpu.config import iir_b_coefficient
from noisereduce_tpu.ops import ewma_filtfilt, sigmoid
from noisereduce_tpu.ops.pallas_mask import fused_nonstationary_mask

RNG = np.random.default_rng(11)


def _jnp_mask(Z, b, thresh, slope):
    mag = jnp.abs(Z)
    floor = ewma_filtfilt(mag, b)
    return sigmoid((mag - floor) / floor, -thresh, slope)


@pytest.mark.parametrize(
    "shape", [(1, 513, 300), (3, 513, 2579), (2, 2, 257, 130), (1, 129, 128)]
)
def test_kernel_matches_jnp(shape):
    Z = (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)).astype(
        np.complex64
    )
    b = iir_b_coefficient(2.0, 44100, 256)
    got = np.asarray(
        fused_nonstationary_mask(jnp.asarray(Z), b, 2.0, 10.0, interpret=True)
    )
    want = np.asarray(_jnp_mask(jnp.asarray(Z), b, 2.0, 10.0))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_kernel_handles_zero_rows():
    """All-zero frequency rows: the jnp path yields NaN (0/0, as the
    reference would); the kernel is defined to output ~0 there instead."""
    Z = (RNG.standard_normal((1, 64, 200)) + 1j * RNG.standard_normal((1, 64, 200))).astype(np.complex64)
    Z = np.asarray(Z)
    Z[0, 10] = 0.0
    b = iir_b_coefficient(2.0, 44100, 256)
    got = np.asarray(
        fused_nonstationary_mask(jnp.asarray(Z), b, 2.0, 10.0, interpret=True)
    )
    assert np.all(np.isfinite(got))
    want = np.asarray(_jnp_mask(jnp.asarray(Z), b, 2.0, 10.0))
    valid = ~np.isnan(want)
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-5)


def test_gate_pallas_flag_cpu_interpretable():
    """gate_nonstationary(use_pallas='auto') stays on the jnp path on CPU
    (exact parity there is covered by the reference tests)."""
    from noisereduce_tpu.config import GateConfig
    from noisereduce_tpu.models.spectral_gate import gate_nonstationary

    cfg = GateConfig(sr=8000, n_fft=256)
    x = jnp.asarray(RNG.standard_normal(4000), dtype=jnp.float32)
    auto = gate_nonstationary(x, cfg)
    off = gate_nonstationary(x, cfg, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(off))


def test_fused_mask_is_differentiable():
    """grad must work with the kernel path selected (custom_vjp routes
    differentiation through the jnp twin — pallas_call has no autodiff)."""
    from noisereduce_tpu.config import GateConfig
    from noisereduce_tpu.models.spectral_gate import gate_nonstationary

    cfg = GateConfig(sr=8000, n_fft=256)
    x = jnp.asarray(RNG.standard_normal(4000), dtype=jnp.float32)

    def loss(x):
        return jnp.mean(gate_nonstationary(x, cfg, use_pallas=True) ** 2)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # gradient equals the jnp path's gradient
    g_ref = jax.grad(
        lambda x: jnp.mean(gate_nonstationary(x, cfg, use_pallas=False) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-7)


def test_fused_mask_custom_vjp_value():
    Z = (RNG.standard_normal((1, 65, 130)) + 1j * RNG.standard_normal((1, 65, 130))).astype(np.complex64)
    b = iir_b_coefficient(2.0, 44100, 256)
    # primal via interpret kernel vs jnp impl
    got = np.asarray(fused_nonstationary_mask(jnp.asarray(Z), b, 2.0, 10.0, True))
    want = np.asarray(_jnp_mask(jnp.asarray(Z), b, 2.0, 10.0))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_tm_kernel_matches_jnp():
    from noisereduce_tpu.ops.pallas_mask import fused_nonstationary_mask_tm, _jnp_mask_impl_tm

    b = iir_b_coefficient(2.0, 44100, 256)
    for shape in [(2, 300, 513), (1, 2579, 513), (1, 130, 65)]:
        re = RNG.standard_normal(shape).astype(np.float32)
        im = RNG.standard_normal(shape).astype(np.float32)
        got = np.asarray(
            fused_nonstationary_mask_tm(jnp.asarray(re), jnp.asarray(im), b, 2.0, 10.0, True)
        )
        want = np.asarray(_jnp_mask_impl_tm(jnp.asarray(re), jnp.asarray(im), b, 2.0, 10.0))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_tm_kernel_differentiable():
    from noisereduce_tpu.ops.pallas_mask import fused_nonstationary_mask_tm

    b = iir_b_coefficient(2.0, 44100, 256)
    re = jnp.asarray(RNG.standard_normal((1, 140, 65)).astype(np.float32))
    im = jnp.asarray(RNG.standard_normal((1, 140, 65)).astype(np.float32))
    g = jax.grad(lambda r: jnp.sum(fused_nonstationary_mask_tm(r, im, b, 2.0, 10.0, True) ** 2))(re)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# VMEM budget gate (VERDICT r1 item 7): derived bound + explicit-True fallback
# ---------------------------------------------------------------------------
def test_vmem_budget_is_derived_and_sane():
    from noisereduce_tpu.ops.pallas_mask import max_frames_for_vmem

    b = max_frames_for_vmem()
    assert b % 128 == 0
    # 16 MiB core, 5 resident planes -> ~6k frames (round-1 empirical gate)
    assert 5000 <= b <= 6400


def test_pallas_decision_boundary():
    import warnings

    import jax.numpy as jnp

    from noisereduce_tpu.models.spectral_gate import _pallas_decision
    from noisereduce_tpu.ops.pallas_mask import max_frames_for_vmem

    b = max_frames_for_vmem()
    assert _pallas_decision(False, jnp.float32, 100) is False
    assert _pallas_decision(True, jnp.float32, b) is True
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _pallas_decision(True, jnp.float32, b + 1) is False
    assert any("VMEM budget" in str(x.message) for x in w)
    # auto on CPU stays off regardless of size
    assert _pallas_decision("auto", jnp.float32, 100) is False

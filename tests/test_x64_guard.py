"""jax_enable_x64 must not reach the COMPILED Mosaic kernel path.

Found live on v5e (round 5): with x64 enabled, Mosaic lowering recurses on
integer converts (``pallas/mosaic/lowering.py::_convert_helper`` —
RecursionError at trace time) and even an int32-only kernel crashes the
TPU compile service; the fused path is uncompilable in x64 mode, period.
``models/spectral_gate._mosaic_blocked`` therefore routes every public
entry point to the staged XLA twin when x64 is on and the backend is a
TPU (warning when the kernels were requested explicitly), while CPU runs
and interpret-mode kernels — this suite — stay on the kernel code.

This suite runs with x64 enabled (conftest), so a TPU-looking backend is
simulated by monkeypatching ``_tpu_available``.
"""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from noisereduce_tpu.config import GateConfig
from noisereduce_tpu.models import spectral_gate as sg

RNG = np.random.default_rng(11)


def test_mosaic_blocked_under_x64_tpu(monkeypatch):
    # CPU backend (this suite): never blocked, x64 or not
    assert not sg._mosaic_blocked("auto")
    monkeypatch.setattr(sg, "_tpu_available", lambda: True)
    assert sg._mosaic_blocked("auto")
    with pytest.warns(UserWarning, match="x64"):
        assert sg._mosaic_blocked(True)


def test_gate_falls_back_to_staged_under_x64(monkeypatch):
    """use_pallas=True on an x64 'TPU' warns and returns the staged
    result instead of tracing the fused kernels (which would crash)."""
    monkeypatch.setattr(sg, "_tpu_available", lambda: True)
    import noisereduce_tpu.ops.pallas_pipeline as pp

    def boom(*a, **kw):  # the compiled path must not be entered
        raise AssertionError("fused kernel path entered under x64")

    monkeypatch.setattr(pp, "fused_gate_nonstationary", boom)
    monkeypatch.setattr(pp, "fused_gate_stationary", boom)
    monkeypatch.setattr(pp, "fused_stationary_threshold", boom)

    cfg = GateConfig(sr=48000, stationary=False)
    n = 48000
    from noisereduce_tpu.ops.pallas.dispatch import fused_gate_supported

    ngt = cfg.smoothing[1] if cfg.smoothing else 0
    assert fused_gate_supported(cfg, n, ngt)  # geometry would take kernels

    x = jnp.asarray(RNG.standard_normal((1, n)), jnp.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = sg.gate_nonstationary(x, cfg, use_pallas=True)
    assert any("x64" in str(m.message) for m in w)
    expect = sg._gate_nonstationary_jnp(x, cfg, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))

    # stationary engine: threshold + gate, same fallback
    noise = jnp.asarray(RNG.standard_normal(12000) * 0.5, jnp.float32)
    cfg_s = GateConfig(sr=48000, stationary=True)
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        thr = sg.stationary_noise_threshold(noise, cfg_s, use_pallas=True)
        got_s = sg.gate_stationary(x, thr, cfg_s, use_pallas=True)
    assert np.all(np.isfinite(np.asarray(got_s)))


def test_fused_chunked_blocked_except_interpret(monkeypatch):
    """The whole-body fused chunked path declines under x64+TPU — except
    in interpret mode, which the CPU-mesh tests and the driver dryrun use
    (NRTPU_FUSED_INTERPRET) and which never touches the Mosaic compiler."""
    monkeypatch.setattr(sg, "_tpu_available", lambda: True)
    from noisereduce_tpu.api import _fused_chunked_ok

    cfg = GateConfig(sr=48000, stationary=False)
    y2d = jnp.zeros((1, 150000), jnp.float32)
    args = (cfg, y2d, 60000, 10000, None, 0)
    assert not _fused_chunked_ok(*args, use_pallas="auto", interpret=False)
    assert _fused_chunked_ok(*args, use_pallas="auto", interpret=True)
    # and on CPU (not blocked) the compiled path is gated by backend only
    monkeypatch.setattr(sg, "_tpu_available", lambda: False)
    assert _fused_chunked_ok(*args, use_pallas=True, interpret=False)

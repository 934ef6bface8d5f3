"""Fully fused Pallas gate (ops/pallas_pipeline.py) vs the staged jnp path.

Runs the kernels in interpret mode on CPU; the staged float32 jnp pipeline
is the oracle (on real TPU the fused path is *closer* to float64 than the
staged path — every kernel dot is Precision.HIGHEST — see bench.py's
on-device assertion).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noisereduce_tpu.config import GateConfig
from noisereduce_tpu.models.spectral_gate import _gate_nonstationary_jnp
from noisereduce_tpu.ops.pallas_pipeline import (
    _fused_gate_impl,
    fused_gate_supported,
)

RNG = np.random.default_rng(5)

CASES = [
    ("default", 30000, 44100, (), {}),
    ("batched", 50000, 48000, (2,), {}),
    ("multidim-batch", 40000, 48000, (2, 2), {}),
    ("no-smoothing", 30000, 44100, (),
     dict(freq_mask_smooth_hz=None, time_mask_smooth_ms=None)),
    ("freq-only-smoothing", 20000, 16000, (), dict(time_mask_smooth_ms=None)),
    ("time-only-smoothing", 20000, 16000, (), dict(freq_mask_smooth_hz=None)),
    ("prop-decrease", 30000, 44100, (),
     dict(prop_decrease=0.6, thresh_n_mult_nonstationary=1.2,
          sigmoid_slope_nonstationary=25)),
    ("prop-zero", 30000, 44100, (), dict(prop_decrease=0.0)),
    ("nfft-2048", 30000, 44100, (), dict(n_fft=2048)),
    ("r2-hop", 30000, 44100, (), dict(n_fft=1024, hop_length=512)),
    ("fast-iir", 30000, 44100, (), dict(time_constant_s=0.5)),
    ("low-sr", 8000, 8000, (), {}),
]


@pytest.mark.parametrize("name,n,sr,batch,kw", CASES, ids=[c[0] for c in CASES])
def test_fused_matches_staged(name, n, sr, batch, kw):
    cfg = GateConfig(sr=sr, stationary=False, **kw)
    sm = cfg.smoothing
    ngt = sm[1] if sm else 0
    assert fused_gate_supported(cfg, n, ngt), "case expected to be eligible"
    x = jnp.asarray(RNG.standard_normal(batch + (n,)), jnp.float32)
    ref = np.asarray(_gate_nonstationary_jnp(x, cfg, method="matmul"),
                     np.float64)
    got = np.asarray(_fused_gate_impl(x, cfg, interpret=True), np.float64)
    assert got.shape == ref.shape
    dev = np.abs(got - ref).max()
    scale = np.abs(ref).max()
    # f32 accumulation-order differences only (HIGHEST kernel dots vs XLA)
    assert dev <= 5e-5 * scale, f"{name}: rel dev {dev / scale:.3e}"


def test_unsupported_geometries_fall_back():
    # hop not lane-aligned
    assert not fused_gate_supported(
        GateConfig(sr=44100, n_fft=256), 8000, 1)
    # win < n_fft breaks the Hann-in-frequency identity
    assert not fused_gate_supported(
        GateConfig(sr=44100, n_fft=2048, win_length=1024, hop_length=256),
        30000, 9)
    # hop == win violates COLA
    assert not fused_gate_supported(
        GateConfig(sr=44100, n_fft=1024, hop_length=1024), 30000, 9)
    # torch convention has its own windowing rules
    from noisereduce_tpu.config import Convention

    assert not fused_gate_supported(
        GateConfig(sr=44100, convention=Convention.TORCH), 30000, 9)


def test_gate_dispatch_uses_jnp_on_cpu():
    """With use_pallas='auto' on CPU the staged jnp path must be taken
    (results identical to use_pallas=False)."""
    from noisereduce_tpu.models.spectral_gate import gate_nonstationary

    cfg = GateConfig(sr=44100, stationary=False)
    x = jnp.asarray(RNG.standard_normal(20000), jnp.float32)
    a = gate_nonstationary(x, cfg, method="matmul", use_pallas="auto")
    b = gate_nonstationary(x, cfg, method="matmul", use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_gate_grad_routes_through_jnp_twin():
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_nonstationary

    cfg = GateConfig(sr=8000, stationary=False)
    x = jnp.asarray(RNG.standard_normal(9000), jnp.float32)

    g = jax.grad(
        lambda a: jnp.mean(fused_gate_nonstationary(a, cfg, interpret=True) ** 2)
    )(x)
    g_ref = jax.grad(
        lambda a: jnp.mean(_gate_nonstationary_jnp(a, cfg, "matmul") ** 2)
    )(x)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-7)


def test_fused_grad_primal_is_fused_value():
    """Under vjp/grad the VALUE must be the fused kernel output bitwise —
    training forward == serving forward (VERDICT r2 item 2); only the
    cotangent comes from the staged twin."""
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_nonstationary

    cfg = GateConfig(sr=8000, stationary=False)
    x = jnp.asarray(RNG.standard_normal(9000), jnp.float32)
    infer = np.asarray(fused_gate_nonstationary(x, cfg, interpret=True))
    out, vjp_fn = jax.vjp(
        lambda a: fused_gate_nonstationary(a, cfg, interpret=True), x
    )
    np.testing.assert_array_equal(np.asarray(out), infer)
    (g,) = vjp_fn(jnp.ones_like(out))
    assert np.all(np.isfinite(np.asarray(g)))


def test_fused_stationary_grad_primal_is_fused_value():
    from noisereduce_tpu.models.spectral_gate import stationary_noise_threshold
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_stationary

    cfg = GateConfig(sr=8000, stationary=True)
    x = jnp.asarray(RNG.standard_normal(9000), jnp.float32)
    noise = jnp.asarray(RNG.standard_normal(8000), jnp.float32)
    thr = stationary_noise_threshold(noise, cfg, method="matmul",
                                     use_pallas=False)
    infer = np.asarray(fused_gate_stationary(x, thr, cfg, interpret=True))
    out, vjp_fn = jax.vjp(
        lambda a: fused_gate_stationary(a, thr, cfg, interpret=True), x
    )
    np.testing.assert_array_equal(np.asarray(out), infer)
    (g,) = vjp_fn(jnp.ones_like(out))
    assert np.all(np.isfinite(np.asarray(g)))


def test_fused_chunked_grad_primal_is_fused_value():
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_chunked

    cfg = GateConfig(sr=16000, stationary=False)
    y = jnp.asarray(RNG.standard_normal((1, 40000)), jnp.float32)
    infer = np.asarray(
        fused_gate_chunked(y, cfg, 16000, 2048, interpret=True)
    )
    out, vjp_fn = jax.vjp(
        lambda a: fused_gate_chunked(a, cfg, 16000, 2048, interpret=True), y
    )
    np.testing.assert_array_equal(np.asarray(out), infer)
    (g,) = vjp_fn(jnp.ones_like(out))
    assert np.all(np.isfinite(np.asarray(g)))


def test_fused_tpugate_grad_primal_is_fused_value():
    from noisereduce_tpu.models.tpu_gate import TPUGate
    from noisereduce_tpu.ops.pallas_pipeline import fused_tpugate

    g = TPUGate(sr=16000, nonstationary=True)
    x = jnp.asarray(RNG.standard_normal((2, 20000)), jnp.float32)
    infer = np.asarray(fused_tpugate(x, None, g, interpret=True))
    out, vjp_fn = jax.vjp(lambda a: fused_tpugate(a, None, g, interpret=True), x)
    np.testing.assert_array_equal(np.asarray(out), infer)
    (gr,) = vjp_fn(jnp.ones_like(out))
    assert np.all(np.isfinite(np.asarray(gr)))


# ---------------------------------------------------------------------------
# Stationary fused path (kernel AS + banded matmul + kernel B)
# ---------------------------------------------------------------------------
STAT_CASES = [
    ("default", 30000, 44100, (), {}),
    ("batched", 50000, 48000, (2,), {}),
    ("prop-decrease", 30000, 44100, (), dict(prop_decrease=0.6)),
    ("prop-zero", 20000, 16000, (2,), dict(prop_decrease=0.0)),
    ("no-smoothing", 30000, 44100, (),
     dict(freq_mask_smooth_hz=None, time_mask_smooth_ms=None)),
    ("tighter-thresh", 30000, 44100, (), dict(n_std_thresh_stationary=2.5)),
]


@pytest.mark.parametrize(
    "name,n,sr,batch,kw", STAT_CASES, ids=[c[0] for c in STAT_CASES]
)
def test_fused_stationary_matches_staged(name, n, sr, batch, kw):
    from noisereduce_tpu.models.spectral_gate import _gate_stationary_jnp

    cfg = GateConfig(sr=sr, stationary=True, **kw)
    sm = cfg.smoothing
    assert fused_gate_supported(cfg, n, sm[1] if sm else 0)
    x = jnp.asarray(RNG.standard_normal(batch + (n,)), jnp.float32)
    noise = jnp.asarray(RNG.standard_normal(20000), jnp.float32) * 0.5
    from noisereduce_tpu.models.spectral_gate import stationary_noise_threshold

    thr = stationary_noise_threshold(noise, cfg, method="matmul",
                                     use_pallas=False)
    ref = np.asarray(_gate_stationary_jnp(x, thr, cfg, method="matmul"),
                     np.float64)
    got = np.asarray(
        _fused_gate_impl(x, cfg, interpret=True, noise_thresh=thr), np.float64
    )
    assert got.shape == ref.shape
    dev = np.abs(got - ref).max()
    scale = np.abs(ref).max()
    assert dev <= 5e-5 * scale, f"{name}: rel dev {dev / scale:.3e}"


def test_fused_stationary_per_row_thresholds_bitwise():
    """A (B, bins) per-row threshold gates each row exactly as the
    single-row fused call does (batched serving, VERDICT r4 #3): the kernel
    grid row reads its own threshold tile, the per-cell body is unchanged."""
    cfg = GateConfig(sr=44100, stationary=True)
    B, n = 3, 30000
    x = jnp.asarray(RNG.standard_normal((B, n)), jnp.float32)
    from noisereduce_tpu.models.spectral_gate import stationary_noise_threshold

    thr = stationary_noise_threshold(
        x[:, :20000] * jnp.asarray([0.5, 1.0, 2.0])[:, None], cfg,
        method="matmul", use_pallas=False,
    )
    assert thr.shape[0] == B and thr.ndim == 2
    got = np.asarray(_fused_gate_impl(x, cfg, interpret=True, noise_thresh=thr))
    for b in range(B):
        want = np.asarray(
            _fused_gate_impl(x[b], cfg, interpret=True, noise_thresh=thr[b])
        )
        np.testing.assert_array_equal(got[b], want)


def test_fused_chunked_per_row_thresholds_bitwise():
    """Per-row thresholds through the whole-body fused CHUNKED path: every
    chunk of signal row b gates against row b's statistics, bitwise equal to
    the single-signal chunked call."""
    from noisereduce_tpu.models.spectral_gate import stationary_noise_threshold
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_chunked

    cfg = GateConfig(sr=44100, stationary=True)
    B, n, cs, pad = 2, 40000, 16000, 2048
    x = jnp.asarray(RNG.standard_normal((B, n)), jnp.float32)
    thr = stationary_noise_threshold(
        x[:, :cs], cfg, method="matmul", use_pallas=False
    )
    got = np.asarray(
        fused_gate_chunked(x, cfg, cs, pad, noise_thresh=thr, interpret=True)
    )
    for b in range(B):
        want = np.asarray(fused_gate_chunked(
            x[b : b + 1], cfg, cs, pad, noise_thresh=thr[b], interpret=True
        ))[0]
        np.testing.assert_array_equal(got[b], want)


def test_fused_stationary_threshold_matches_staged():
    from noisereduce_tpu.models.spectral_gate import stationary_noise_threshold
    from noisereduce_tpu.ops.pallas_pipeline import fused_stationary_threshold

    cfg = GateConfig(sr=44100, stationary=True)
    noise = jnp.asarray(RNG.standard_normal(30000), jnp.float32) * 0.3
    a = np.asarray(stationary_noise_threshold(noise, cfg, method="matmul",
                                              use_pallas=False), np.float64)
    b = np.asarray(fused_stationary_threshold(noise, cfg, interpret=True),
                   np.float64)
    assert a.shape == b.shape
    # dB-domain values; f32 statistics agree to ~1e-3 dB
    assert np.abs(a - b).max() <= 2e-3


def test_fused_stationary_grad_routes_through_jnp_twin():
    from noisereduce_tpu.models.spectral_gate import (
        _gate_stationary_jnp, stationary_noise_threshold,
    )
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_stationary

    cfg = GateConfig(sr=8000, stationary=True)
    x = jnp.asarray(RNG.standard_normal(9000), jnp.float32)
    noise = jnp.asarray(RNG.standard_normal(8000), jnp.float32)
    thr = stationary_noise_threshold(noise, cfg, method="matmul",
                                     use_pallas=False)
    g = jax.grad(
        lambda a: jnp.mean(
            fused_gate_stationary(a, thr, cfg, interpret=True) ** 2
        )
    )(x)
    g_ref = jax.grad(
        lambda a: jnp.mean(_gate_stationary_jnp(a, thr, cfg, "matmul") ** 2)
    )(x)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-7)


# ---------------------------------------------------------------------------
# Torch-convention (TPUGate) fused path
# ---------------------------------------------------------------------------
TORCH_CASES = [
    ("nonstat-default", dict(sr=16000, nonstationary=True), (4, 64000), None),
    ("nonstat-move125",
     dict(sr=16000, nonstationary=True, n_movemean_nonstationary=125),
     (2, 64000), None),
    ("nonstat-prop",
     dict(sr=16000, nonstationary=True, prop_decrease=0.5), (2, 48000), None),
    ("stat-self", dict(sr=16000, nonstationary=False), (3, 48000), None),
    ("stat-xn1d", dict(sr=16000, nonstationary=False), (2, 48000), (24000,)),
    ("stat-xn2d", dict(sr=16000, nonstationary=False), (2, 48000), (2, 24000)),
    ("nonstat-44k", dict(sr=44100, nonstationary=True), (1, 60000), None),
]


@pytest.mark.parametrize(
    "name,kw,xshape,xnshape", TORCH_CASES, ids=[c[0] for c in TORCH_CASES]
)
def test_fused_tpugate_matches_staged(name, kw, xshape, xnshape):
    from noisereduce_tpu.models.tpu_gate import TPUGate
    from noisereduce_tpu.ops.pallas_pipeline import (
        _fused_torch_impl, fused_tpugate_supported,
    )

    g = TPUGate(**kw)
    xn_len = xnshape[-1] if xnshape else None
    assert fused_tpugate_supported(g, xshape[-1], xn_len)
    # per-case generator: the shared module RNG makes inputs depend on
    # which tests ran before, and the stationary BINARY mask can cross its
    # threshold on a borderline bin for some input draws (a discontinuity
    # of the algorithm, not an implementation bound)
    import zlib

    rng = np.random.default_rng(zlib.crc32(name.encode()))
    x = jnp.asarray(rng.standard_normal(xshape), jnp.float32)
    xn = (None if xnshape is None
          else jnp.asarray(rng.standard_normal(xnshape), jnp.float32) * 0.5)
    ref = np.asarray(g._call_jnp(x, xn, method="matmul"), np.float64)
    got = np.asarray(_fused_torch_impl(x, xn, g, True), np.float64)
    assert got.shape == ref.shape
    dev = np.abs(got - ref).max()
    scale = np.abs(ref).max()
    # exact-Hann stencil vs the f32-quantized torch window (~6e-8) plus f32
    # accumulation-order differences
    assert dev <= 5e-5 * scale, f"{name}: rel dev {dev / scale:.3e}"


def test_tpugate_dispatch_uses_jnp_on_cpu():
    from noisereduce_tpu.models.tpu_gate import TPUGate

    g = TPUGate(sr=16000, nonstationary=True)
    x = jnp.asarray(RNG.standard_normal((2, 48000)), jnp.float32)
    a = g(x, method="matmul", use_pallas="auto")
    b = g(x, method="matmul", use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_tpugate_grad_routes_through_jnp_twin():
    from noisereduce_tpu.models.tpu_gate import TPUGate
    from noisereduce_tpu.ops.pallas_pipeline import fused_tpugate

    g = TPUGate(sr=16000, nonstationary=True)
    x = jnp.asarray(RNG.standard_normal((2, 48000)), jnp.float32)
    grad = jax.grad(
        lambda a: jnp.mean(fused_tpugate(a, None, g, interpret=True) ** 2)
    )(x)
    grad_ref = jax.grad(
        lambda a: jnp.mean(g._call_jnp(a, None, "matmul") ** 2)
    )(x)
    assert np.all(np.isfinite(np.asarray(grad)))
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref),
                               atol=1e-7)


def test_fused_tpugate_unsupported_geometries():
    from noisereduce_tpu.models.tpu_gate import TPUGate
    from noisereduce_tpu.ops.pallas_pipeline import fused_tpugate_supported

    # window shorter than n_fft breaks the Hann-in-frequency identity
    assert not fused_tpugate_supported(
        TPUGate(sr=16000, n_fft=2048, win_length=1024), 64000)
    # hop not lane-aligned
    assert not fused_tpugate_supported(TPUGate(sr=8000, n_fft=256), 64000)
    # moving-average floor wider than the kernel's 2-halo-block window
    assert not fused_tpugate_supported(
        TPUGate(sr=16000, nonstationary=True,
                n_movemean_nonstationary=600), 64000)


# ---------------------------------------------------------------------------
# Whole-body chunked fast path (signal -> hop-block gather -> assemble)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "n,cs,pad,stationary",
    [
        (50000, 8000, 1500, False),
        (50000, 8000, 1500, True),
        (50000, 8000, 100, False),   # padding smaller than the istft tail
        (48000, 9000, 1200, False),
    ],
)
def test_fused_chunked_matches_process_chunked(n, cs, pad, stationary):
    from noisereduce_tpu.models.spectral_gate import (
        _gate_nonstationary_jnp, _gate_stationary_jnp,
        stationary_noise_threshold,
    )
    from noisereduce_tpu.ops.pallas_pipeline import _fused_chunked_impl
    from noisereduce_tpu.parallel.chunking import process_chunked

    cfg = GateConfig(sr=44100, stationary=stationary)
    y = jnp.asarray(RNG.standard_normal((2, n)), jnp.float32)
    if stationary:
        thr = stationary_noise_threshold(
            y[0, :cs], cfg, method="matmul", use_pallas=False
        )
        ref = process_chunked(
            lambda c, t: _gate_stationary_jnp(c, t, cfg, "matmul"),
            y, cs, pad, extra=(thr,),
        )
        got = _fused_chunked_impl(y, thr, cfg, cs, pad, True)
    else:
        ref = process_chunked(
            lambda c: _gate_nonstationary_jnp(c, cfg, "matmul"), y, cs, pad
        )
        got = _fused_chunked_impl(y, None, cfg, cs, pad, True)
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    assert got.shape == ref.shape
    dev = np.abs(got - ref).max()
    assert dev <= 5e-5 * np.abs(ref).max()


def test_fused_chunked_grad_routes_through_jnp_twin():
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_chunked
    from noisereduce_tpu.models.spectral_gate import _gate_nonstationary_jnp
    from noisereduce_tpu.parallel.chunking import process_chunked

    cfg = GateConfig(sr=44100, stationary=False)
    y = jnp.asarray(RNG.standard_normal((1, 30000)), jnp.float32)
    g = jax.grad(
        lambda a: jnp.mean(
            fused_gate_chunked(a, cfg, 8000, 1500, interpret=True) ** 2
        )
    )(y)
    g_ref = jax.grad(
        lambda a: jnp.mean(
            process_chunked(
                lambda c: _gate_nonstationary_jnp(c, cfg, "matmul"),
                a, 8000, 1500,
            ) ** 2
        )
    )(y)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-7)


# ---------------------------------------------------------------------------
# Merged single-kernel gate vs the two-kernel split pipeline
# ---------------------------------------------------------------------------
MERGED_CASES = [
    ("nonstat-default", False, 30000, 44100, {}),
    ("nonstat-no-freq-smooth", False, 20000, 16000,
     dict(freq_mask_smooth_hz=None)),
    ("nonstat-prop", False, 30000, 44100, dict(prop_decrease=0.6)),
    ("stationary-default", True, 30000, 44100, {}),
    # multi-F-tile geometry (n_bins 1025 -> several 128-lane tiles) and
    # the r=2 hop factorization: guard the tile/halo bookkeeping edges
    ("nonstat-nfft-2048", False, 30000, 44100, dict(n_fft=2048)),
    ("nonstat-r2-hop", False, 30000, 44100,
     dict(n_fft=1024, hop_length=512)),
]


@pytest.mark.parametrize(
    "name,stat,n,sr,kw", MERGED_CASES, ids=[c[0] for c in MERGED_CASES]
)
def test_merged_matches_split(name, stat, n, sr, kw, monkeypatch):
    """The single-kernel merged gate and the split (kernel AM/AS + banded
    matmul + kernel B) pipeline agree to f32 rounding: the only difference
    is the frequency-smoothing contraction (128 in-tile lanes vs f_pad)."""
    from noisereduce_tpu.ops import pallas_pipeline as pp
    from noisereduce_tpu.ops.pallas import dispatch as disp

    cfg = GateConfig(sr=sr, stationary=stat, **kw)
    x = jnp.asarray(RNG.standard_normal((n,)), jnp.float32)
    thr = None
    if stat:
        from noisereduce_tpu.models.spectral_gate import (
            stationary_noise_threshold,
        )

        noise = jnp.asarray(RNG.standard_normal(20000), jnp.float32) * 0.5
        thr = stationary_noise_threshold(noise, cfg, method="matmul",
                                         use_pallas=False)
    scfg = cfg.stft
    geom = pp._geometry(scfg, n)
    t_pad, hop = geom[5], geom[1]
    ngf = cfg.smoothing[0] if cfg.smoothing else 0
    assert pp._merged_supported(
        t_pad, hop, pp._merged_halo(ngf), scfg.n_bins
    ), "case expected to take the merged kernel"
    merged = np.asarray(
        _fused_gate_impl(x, cfg, interpret=True, noise_thresh=thr), np.float64
    )
    monkeypatch.setattr(disp, "_merged_supported", lambda *a: False)
    split = np.asarray(
        _fused_gate_impl(x, cfg, interpret=True, noise_thresh=thr), np.float64
    )
    assert merged.shape == split.shape
    dev = np.abs(merged - split).max()
    scale = np.abs(split).max()
    assert dev <= 5e-6 * scale, f"{name}: rel dev {dev / scale:.3e}"


def test_bf16_fast_mode_routes_and_bounded():
    """bf16 input switches every kernel dot to single-pass bf16 MXU
    (Mosaic DEFAULT). In interpret mode DEFAULT is still true f32, so the
    only deviation here is the bf16 input quantization — this pins the
    plumbing (dtype round-trip + trace) rather than the on-device envelope,
    which bench.py asserts on real TPU."""
    from noisereduce_tpu.ops.pallas_pipeline import _fused_chunked_impl

    cfg = GateConfig(sr=8000, stationary=False)
    y32 = jnp.asarray(RNG.standard_normal((1, 12000)), jnp.float32)
    y16 = y32.astype(jnp.bfloat16)
    a = _fused_chunked_impl(y32, None, cfg, 5000, 300, True)
    b = _fused_chunked_impl(y16, None, cfg, 5000, 300, True)
    assert b.dtype == jnp.bfloat16
    dev = np.abs(
        np.asarray(a, np.float64) - np.asarray(b, np.float64)
    ).max()
    assert dev <= 2e-2 * np.abs(np.asarray(a)).max()


def test_direct_dft_kernels_match_staged_on_quantized_input():
    """The bf16 fast mode now runs DIRECT windowed-DFT kernels (window +
    phases folded into the matrices, no twiddle/Hann/Hermitian phases).
    Pre-quantizing the input to bf16 for BOTH paths removes quantization
    from the comparison; in interpret mode (where DEFAULT precision is
    true f32) what remains is f32 summation-order noise.

    Two envelopes: with the mask forced to 1 (prop_decrease=0) the direct
    analysis+synthesis transform itself is pinned to f32 rounding; with
    the default gate, near-zero spectra bins carry large RELATIVE f32
    cancellation noise that the near-threshold sigmoid amplifies (measured
    ~2e-3 — the same amplification the bf16 dots cause on device, and far
    inside the fast mode's pinned quantization envelope)."""
    y32 = jnp.asarray(RNG.standard_normal(30000), jnp.float32)
    y16 = y32.astype(jnp.bfloat16)
    y32q = y16.astype(jnp.float32)  # identical values to the bf16 input

    cfg_id = GateConfig(sr=44100, stationary=False, prop_decrease=0.0)
    ref = np.asarray(_gate_nonstationary_jnp(y32q, cfg_id, method="matmul"),
                     np.float64)
    got = np.asarray(_fused_gate_impl(y16, cfg_id, interpret=True),
                     np.float64)
    assert got.shape == ref.shape
    dev = np.abs(got - ref).max() / np.abs(ref).max()
    assert dev <= 1e-5, f"direct transform rel dev {dev:.3e}"

    cfg = GateConfig(sr=44100, stationary=False)
    ref = np.asarray(_gate_nonstationary_jnp(y32q, cfg, method="matmul"),
                     np.float64)
    got = np.asarray(_fused_gate_impl(y16, cfg, interpret=True), np.float64)
    dev = np.abs(got - ref).max() / np.abs(ref).max()
    assert dev <= 1e-2, f"direct gated rel dev {dev:.3e}"


def test_direct_stationary_routes_and_bounded():
    """The stationary gate through the DIRECT bf16 kernels: dtype
    round-trip intact, deviation bounded by the documented binary-mask
    envelope (threshold-adjacent bin flips)."""
    from noisereduce_tpu.models.spectral_gate import stationary_noise_threshold

    cfg = GateConfig(sr=44100, stationary=True)
    y32 = jnp.asarray(RNG.standard_normal(30000), jnp.float32)
    noise = jnp.asarray(RNG.standard_normal(20000), jnp.float32) * 0.5
    thr = stationary_noise_threshold(noise, cfg, method="matmul",
                                     use_pallas=False)
    a = np.asarray(
        _fused_gate_impl(y32, cfg, interpret=True, noise_thresh=thr),
        np.float64,
    )
    b = np.asarray(
        _fused_gate_impl(y32.astype(jnp.bfloat16), cfg, interpret=True,
                         noise_thresh=thr),
        np.float64,
    )
    assert np.all(np.isfinite(b))
    dev = np.abs(a - b).max()
    assert dev <= 1.5e-1 * np.abs(a).max()


def test_bf16_fast_mode_torch_path():
    """Torch-convention twin of the bf16 routing test: bf16 input keeps the
    TPUGate fused kernels' dtype round-trip and trace intact (single-pass
    MXU dots on device; DEFAULT == f32 in interpret mode)."""
    from noisereduce_tpu.models.tpu_gate import TPUGate
    from noisereduce_tpu.ops.pallas_pipeline import (
        _fused_torch_impl,
        fused_tpugate_supported,
    )

    gate = TPUGate(sr=16000, nonstationary=True)
    x32 = jnp.asarray(RNG.standard_normal((2, 16000)), jnp.float32)
    assert fused_tpugate_supported(gate, 16000)
    a = _fused_torch_impl(x32, None, gate, True)
    b = _fused_torch_impl(x32.astype(jnp.bfloat16), None, gate, True)
    assert b.dtype == jnp.bfloat16
    dev = np.abs(
        np.asarray(a, np.float64) - np.asarray(b, np.float64)
    ).max()
    assert dev <= 2e-2 * np.abs(np.asarray(a)).max()


TORCH_MERGED_CASES = [
    ("nonstat", True, {}, False),
    ("nonstat-nosmooth", True,
     dict(freq_mask_smooth_hz=None, time_mask_smooth_ms=None), False),
    ("stat-selfnoise", False, {}, False),
    ("stat-xn", False, {}, True),
]


@pytest.mark.parametrize(
    "name,nonstat,kw,use_xn", TORCH_MERGED_CASES,
    ids=[c[0] for c in TORCH_MERGED_CASES],
)
def test_torch_merged_matches_split(name, nonstat, kw, use_xn, monkeypatch):
    """The single-kernel merged torch gate agrees with the split
    (mt/as kernel + XLA banded matmul + kernel B) path to f32 rounding."""
    from noisereduce_tpu.models.tpu_gate import TPUGate
    from noisereduce_tpu.ops import pallas_pipeline as pp
    from noisereduce_tpu.ops.pallas import torch_dispatch as tdisp

    gate = TPUGate(sr=16000, nonstationary=nonstat, **kw)
    x = jnp.asarray(RNG.standard_normal((2, 16000)), jnp.float32)
    xn = (
        jnp.asarray(RNG.standard_normal((1, 8000)), jnp.float32) * 0.5
        if use_xn else None
    )
    merged = np.asarray(pp._fused_torch_impl(x, xn, gate, True), np.float64)
    monkeypatch.setattr(tdisp, "_merged_supported", lambda *a: False)
    split = np.asarray(pp._fused_torch_impl(x, xn, gate, True), np.float64)
    assert merged.shape == split.shape
    dev = np.abs(merged - split).max()
    assert dev <= 5e-6 * np.abs(split).max(), f"{name}"


# ---------------------------------------------------------------------------
# Dispatch guards (round-2 review findings)
# ---------------------------------------------------------------------------
def test_explicit_cpu_device_skips_pallas_everywhere(monkeypatch):
    """device='cpu' on a TPU host must take the jnp path for ALL engines.

    _tpu_available is forced True so that any dispatch site that ignores
    the device-derived use_pallas=False would enter the Pallas path and
    fail on the CPU backend (stationary and torch paths did exactly that
    before use_pallas was threaded through _run_stationary /
    _run_torch_gate / the group helpers)."""
    import noisereduce_tpu.models.spectral_gate as sg
    import noisereduce_tpu as nr

    monkeypatch.setattr(sg, "_tpu_available", lambda: True)
    y = np.asarray(RNG.standard_normal(30000), np.float32)
    nr.reduce_noise(y=y, sr=44100, stationary=True, device="cpu",
                    chunk_size=12000, padding=2000)
    nr.reduce_noise(y=y, sr=44100, use_torch=True, device="cpu")
    nr.reduce_noise(y=y, sr=44100, use_torch=True, stationary=True,
                    device="cpu")


def test_tpugate_incompatible_xn_batch_raises(monkeypatch):
    """A noise-clip batch that is neither 1 nor the signal batch must raise
    the reference's broadcast error — the fused path's threshold BlockSpec
    would silently clamp row indexing past the clip batch."""
    import noisereduce_tpu.models.spectral_gate as sg
    from noisereduce_tpu.models.tpu_gate import TPUGate

    monkeypatch.setattr(sg, "_tpu_available", lambda: True)
    gate = TPUGate(sr=16000, nonstationary=False)
    x = jnp.asarray(RNG.standard_normal((3, 16000)), jnp.float32)
    xn = jnp.asarray(RNG.standard_normal((2, 8000)), jnp.float32)
    with pytest.raises(Exception, match="broadcast"):
        gate(x, xn)


def test_tpugate_vmem_overflow_geometry_not_supported():
    """A smoothing kernel too wide for the merged halo on a signal too big
    for the split pipeline's VMEM must report unsupported (and so fall back
    to jnp) instead of dying at Mosaic compile."""
    from noisereduce_tpu.models.tpu_gate import TPUGate
    from noisereduce_tpu.ops.pallas_pipeline import fused_tpugate_supported

    gate = TPUGate(sr=48000, nonstationary=True, freq_mask_smooth_hz=6000)
    assert not fused_tpugate_supported(gate, 1_280_000)


def test_merged_rejects_single_core_bin_last_tile():
    """n_bins ≡ 1 (mod core) with frequency smoothing on: the last tile's
    Nyquist-extension lane would source an under-smoothed halo lane, so the
    merged kernel must decline (split path handles it) — ADVICE r2."""
    from noisereduce_tpu.ops import pallas_pipeline as pp

    halo = 3  # n_grad_freq = 1 -> in-tile banded smoothing active
    core = pp._FT - 2 * halo
    assert not pp._merged_supported(256, 256, halo, 2 * core + 1)
    assert pp._merged_supported(256, 256, halo, 2 * core + 2)
    # no smoothing (default halo): no in-tile banded sum, no rejection
    dcore = pp._FT - 2 * pp._HALO
    assert pp._merged_supported(256, 256, pp._HALO, 2 * dcore + 1)


def test_threshold_spectra_vmem_guard():
    """The stationary noise-threshold path runs the spectra-only kernel,
    whose VMEM footprint the GATE predicates don't model — clip lengths
    beyond the spectra budget must report unsupported (jnp fallback), and
    moderate clips beyond the old 16 MiB default must report supported
    (the kernel raises its scoped limit like the merged gate)."""
    from noisereduce_tpu.ops.pallas_pipeline import fused_threshold_supported

    cfg = GateConfig(sr=48000, stationary=True)
    assert fused_threshold_supported(cfg, 48000 * 2)
    assert fused_threshold_supported(cfg, 1_200_000)  # OOM'd pre-fix
    assert not fused_threshold_supported(cfg, 48000 * 3600)

    from noisereduce_tpu.models.tpu_gate import TPUGate
    from noisereduce_tpu.ops.pallas_pipeline import fused_tpugate_supported

    gate = TPUGate(sr=48000, nonstationary=False)
    assert fused_tpugate_supported(gate, 60000, 1_200_000)
    assert not fused_tpugate_supported(gate, 60000, 48000 * 3600)

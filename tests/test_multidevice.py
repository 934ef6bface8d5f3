"""Multi-device chunk-axis sharding on a fake 8-device CPU mesh.

The sharded path must produce bit-identical results to the single-device
vmap path (chunks are embarrassingly parallel; halo recompute, no
collectives)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import noisereduce_tpu as nr
from noisereduce_tpu.parallel.chunking import process_chunked

RNG = np.random.default_rng(5)


def _mesh(n=8, name="chunks"):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} virtual devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (name,))


def test_process_chunked_sharded_matches_single():
    y = jnp.asarray(RNG.standard_normal((2, 50000)))

    def filt(c):
        return c * 2.0 + jnp.cumsum(c, axis=-1) * 1e-3

    single = process_chunked(filt, y, chunk_size=4000, padding=500)
    sharded = process_chunked(
        filt, y, chunk_size=4000, padding=500, mesh=_mesh(), axis_name="chunks"
    )
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


def test_process_chunked_sharded_pads_chunk_count():
    # 5 chunks over 8 devices: chunk axis padded to 8, zeros trimmed
    y = jnp.asarray(RNG.standard_normal((1, 20000)))
    single = process_chunked(lambda c: c + 1.0, y, chunk_size=4000, padding=100)
    sharded = process_chunked(
        lambda c: c + 1.0, y, chunk_size=4000, padding=100, mesh=_mesh()
    )
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


@pytest.mark.parametrize("stationary", [True, False])
def test_reduce_noise_mesh_matches_unsharded(stationary):
    y = RNG.standard_normal(60000) * 1000
    kw = dict(stationary=stationary, chunk_size=8000, padding=1000)
    base = nr.reduce_noise(y=y, sr=44100, **kw)
    sharded = nr.reduce_noise(y=y, sr=44100, mesh=_mesh(), **kw)
    np.testing.assert_allclose(sharded, base, atol=1e-10)


def test_reduce_noise_mesh_torch_path():
    y = RNG.standard_normal(60000) * 1000
    kw = dict(stationary=True, chunk_size=8000, padding=1000, use_torch=True)
    base = nr.reduce_noise(y=y, sr=44100, **kw)
    sharded = nr.reduce_noise(y=y, sr=44100, mesh=_mesh(), **kw)
    np.testing.assert_allclose(sharded, base, atol=1e-10)


def test_reduce_noise_mesh_multichannel():
    y = RNG.standard_normal((2, 40000)) * 1000
    kw = dict(stationary=False, chunk_size=5000, padding=800)
    base = nr.reduce_noise(y=y, sr=44100, **kw)
    sharded = nr.reduce_noise(y=y, sr=44100, mesh=_mesh(), **kw)
    np.testing.assert_allclose(sharded, base, atol=1e-10)


def test_chunk_mesh_and_distributed_chunks():
    from noisereduce_tpu.parallel.mesh import chunk_mesh, distributed_chunks

    mesh = chunk_mesh(8)
    assert mesh.shape["chunks"] == 8
    local = np.asarray(RNG.standard_normal((1, 8, 500)), dtype=np.float32)
    arr = distributed_chunks(local, mesh)
    assert arr.shape == (1, 8, 500)
    np.testing.assert_allclose(np.asarray(arr), local)


# ---------------------------------------------------------------------------
# Whole-body fused chunked path under mesh / max_parallel_chunks
# (VERDICT r3 #3). Interpret mode executes the Mosaic kernels as jax ops on
# the CPU mesh — the exact composition that runs compiled on real TPUs.
# ---------------------------------------------------------------------------
def _fused_cfg():
    from noisereduce_tpu.config import GateConfig

    return GateConfig(sr=48000, stationary=False)


def _fused_signal(k_chunks=6, chunk=4096, channels=1):
    n = chunk * k_chunks - 1000  # last chunk partial
    return jnp.asarray(
        RNG.standard_normal((channels, n)) * 0.3, dtype=jnp.float32
    )


def test_fused_chunked_mesh_matches_single():
    from noisereduce_tpu.ops.pallas_pipeline import (
        fused_gate_chunked, fused_gate_supported,
    )

    cfg = _fused_cfg()
    assert fused_gate_supported(cfg, 4096 + 2 * 512, cfg.smoothing[1])
    y = _fused_signal()
    single = fused_gate_chunked(y, cfg, 4096, 512, interpret=True)
    sharded = fused_gate_chunked(
        y, cfg, 4096, 512, interpret=True, mesh=_mesh(), axis_name="chunks"
    )
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


def test_fused_chunked_max_parallel_chunks_matches():
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_chunked

    cfg = _fused_cfg()
    y = _fused_signal(k_chunks=5)
    full = fused_gate_chunked(y, cfg, 4096, 512, interpret=True)
    grouped = fused_gate_chunked(
        y, cfg, 4096, 512, interpret=True, max_parallel_chunks=2
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(grouped))


def test_fused_chunked_mesh_and_mpc_compose():
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_chunked

    cfg = _fused_cfg()
    y = _fused_signal(k_chunks=9, channels=2)  # >1 chunk/device on 4 devices
    single = fused_gate_chunked(y, cfg, 4096, 512, interpret=True)
    both = fused_gate_chunked(
        y, cfg, 4096, 512, interpret=True, mesh=_mesh(4),
        axis_name="chunks", max_parallel_chunks=2,
    )
    np.testing.assert_array_equal(np.asarray(single), np.asarray(both))


def test_fused_chunked_stationary_mesh_matches():
    from noisereduce_tpu.config import GateConfig
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_chunked

    cfg = GateConfig(sr=48000, stationary=True)
    y = _fused_signal()
    thresh = jnp.asarray(
        RNG.uniform(-60, -20, cfg.stft.n_bins), dtype=jnp.float32
    )
    single = fused_gate_chunked(
        y, cfg, 4096, 512, noise_thresh=thresh, interpret=True
    )
    sharded = fused_gate_chunked(
        y, cfg, 4096, 512, noise_thresh=thresh, interpret=True, mesh=_mesh()
    )
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


def test_fused_chunked_bf16_mesh_matches():
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_chunked

    cfg = _fused_cfg()
    y = _fused_signal().astype(jnp.bfloat16)
    single = fused_gate_chunked(y, cfg, 4096, 512, interpret=True)
    sharded = fused_gate_chunked(y, cfg, 4096, 512, interpret=True, mesh=_mesh())
    assert sharded.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(single, np.float32), np.asarray(sharded, np.float32)
    )


@pytest.mark.parametrize("stationary", [False, True])
def test_public_api_mesh_hits_fused_path(monkeypatch, stationary):
    """reduce_noise(mesh=...) runs the whole-body fused kernels per shard
    (forced interpret on CPU), matching the unsharded fused path exactly and
    the staged pipeline within the fused-vs-staged envelope."""
    monkeypatch.setenv("NRTPU_FUSED_INTERPRET", "1")
    y = (RNG.standard_normal(4096 * 5 - 777) * 0.3).astype(np.float32)
    kw = dict(
        sr=48000, stationary=stationary, chunk_size=4096, padding=512,
        compute_dtype=jnp.float32,
    )
    if stationary:
        kw["y_noise"] = y[:8192]
    fused_single = nr.reduce_noise(y=y, **kw)
    fused_mesh = nr.reduce_noise(y=y, mesh=_mesh(), **kw)
    np.testing.assert_array_equal(fused_single, fused_mesh)
    monkeypatch.delenv("NRTPU_FUSED_INTERPRET")
    staged = nr.reduce_noise(y=y, **kw)
    scale = np.max(np.abs(staged))
    assert np.max(np.abs(fused_mesh - staged)) < 5e-3 * scale

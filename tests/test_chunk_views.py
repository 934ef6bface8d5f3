"""The halo'd chunk-view builder (parallel/chunking.extract_chunks) against
an explicit per-chunk slice loop with the reference's zero-fill semantics
(reference base.py:130-148: chunk i covers [i*cs - padding, (i+1)*cs +
padding), zero outside [0, n)).

These tests pin the builder bit-exactly against that loop regardless of
how it is lowered (vmapped dynamic_slice today; a sample-level concat
decomposition was tried and reverted — see NOTES.md dead-ideas (d)),
including the regime where the halo'd view spans several chunks
(view > 2*chunk_size, e.g. the reference test #4 shape chunk_size=30000
with the default padding=30000).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from noisereduce_tpu.parallel.chunking import extract_chunks, n_chunks_for

RNG = np.random.default_rng(7)


def _reference_views(y, cs, pad):
    """Explicit loop: zero-extended slices [i*cs - pad, (i+1)*cs + pad)."""
    n = y.shape[-1]
    k = n_chunks_for(n, cs)
    view = cs + 2 * pad
    out = np.zeros(y.shape[:-1] + (k, view), dtype=y.dtype)
    for i in range(k):
        for off in range(view):
            src = i * cs - pad + off
            if 0 <= src < n:
                out[..., i, off] = y[..., src]
    return out


@pytest.mark.parametrize(
    "shape,cs,pad",
    [
        ((1001,), 300, 50),
        ((2, 1001,), 300, 50),
        ((901,), 300, 0),          # no halo: m == 1
        ((1200,), 300, 300),       # view == 3*cs boundary: m == 3
        ((1000,), 250, 700),       # view >> cs: m == ceil(1650/250) == 7
        ((300,), 300, 100),        # single chunk
        ((299,), 300, 100),        # single short chunk
    ],
)
def test_extract_chunks_matches_reference_slices(shape, cs, pad):
    y = RNG.standard_normal(shape).astype(np.float32)
    got = np.asarray(extract_chunks(jnp.asarray(y), cs, pad))
    want = _reference_views(y, cs, pad)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_extract_chunks_two_phase_matches_naive():
    """chunk_size % 128 == 64 triggers the phase-aligned gather (a second
    64-lane-shifted padded copy for odd chunks); the views must be
    bit-identical to naive per-chunk slicing of the padded signal."""
    import jax.numpy as jnp

    from noisereduce_tpu.parallel.chunking import (
        extract_chunks, n_chunks_for, pad_chunk_signal,
    )

    rng = np.random.default_rng(11)
    for chunk_size, padding, n in ((1088, 200, 5000), (1088, 64, 3265),
                                   (1024, 200, 5000), (900, 100, 4321)):
        y = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
        got = np.asarray(extract_chunks(y, chunk_size, padding))
        ypad = np.asarray(pad_chunk_signal(y, chunk_size, padding))
        view = chunk_size + 2 * padding
        k = n_chunks_for(n, chunk_size)
        want = np.stack(
            [ypad[:, i * chunk_size : i * chunk_size + view] for i in range(k)],
            axis=1,
        )
        np.testing.assert_array_equal(got, want)

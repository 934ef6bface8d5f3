"""Chunk + halo combinator — the TPU-native replacement for the reference's
joblib/memmap runtime (spectralgate/base.py:130-226).

The reference splits long recordings into ``chunk_size``-sample chunks, each
extended by a ``padding``-sample halo read from the source signal (zero-fill
past the signal edges, base.py:130-142), filters chunks in worker *processes*
and assembles results in a shared np.memmap (base.py:167-226).

Here the same geometry becomes pure array surgery:

  signal (..., n)  →  halo'd chunk views (..., n_chunks, chunk+2·pad)
                   →  vmap(filter)           [single chip]
                   →  shard_map over a mesh  [multi chip, see parallel.mesh]
                   →  trim halos, reshape, crop to n

Chunks are *views by gather* of one zero-extended array, so halo content is
identical to the reference's overlapping reads — no inter-chunk
communication is needed (halo recompute, SURVEY.md §2).

Everything is static-shaped: all signals pad up to n_chunks·chunk_size.
"""
from __future__ import annotations


from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "n_chunks_for",
    "pad_chunk_signal",
    "extract_chunks",
    "assemble_chunks",
    "process_chunked",
    "grouped_filter",
    "shard_filter",
]


def n_chunks_for(n_samples: int, chunk_size: int) -> int:
    """Number of chunks the reference would process (base.py:174-177):
    ich2 = (n-1)//cs, chunks = ich2+1."""
    return (n_samples - 1) // chunk_size + 1


def pad_chunk_signal(
    y: jax.Array, chunk_size: int, padding: int
) -> jax.Array:
    """Zero-extend (..., n) so that chunk i's halo'd view is the plain
    slice [i*cs, i*cs + cs + 2*padding) of the result (the shared geometry
    of extract_chunks and the host-driven progress loop)."""
    n = y.shape[-1]
    total = n_chunks_for(n, chunk_size) * chunk_size
    return jnp.pad(
        y, [(0, 0)] * (y.ndim - 1) + [(padding, total - n + padding)]
    )


def extract_chunks(
    y: jax.Array, chunk_size: int, padding: int
) -> jax.Array:
    """(..., n) -> (..., n_chunks, chunk_size + 2*padding) halo'd views.

    Chunk i covers source samples [i*cs - padding, (i+1)*cs + padding),
    zero-filled outside [0, n) — exactly base.py:144-148 + 130-142.

    The views are unrolled static slices (XLA TPU lowers a vmapped/rolled
    gather worse — NOTES.md), and when ``chunk_size % 128 == 64`` (the
    reference default) odd chunks slice a second 64-lane-shifted padded
    copy so every per-chunk copy is 128-lane aligned — bit-identical
    reads, same trick as the fused path's gather (ops.pallas.dispatch).
    """
    n = y.shape[-1]
    n_chunks = n_chunks_for(n, chunk_size)
    view = chunk_size + 2 * padding
    total = n_chunks * chunk_size
    ypads = [pad_chunk_signal(y, chunk_size, padding)]
    two_phase = chunk_size % 128 == 64 and padding >= 64
    if two_phase:
        ypads.append(jnp.pad(
            y,
            [(0, 0)] * (y.ndim - 1) + [(padding - 64, total - n + padding + 64)],
        ))
    parts = [
        jax.lax.dynamic_slice_in_dim(
            ypads[i % 2 if two_phase else 0],
            i * chunk_size - (64 * (i % 2) if two_phase else 0),
            view,
            axis=-1,
        )
        for i in range(n_chunks)
    ]
    return jnp.stack(parts, axis=-2)


def assemble_chunks(
    filtered: jax.Array, chunk_size: int, padding: int, n_samples: int
) -> jax.Array:
    """(..., n_chunks, chunk+2·pad) -> (..., n_samples): trim halos,
    concatenate, crop (base.py:150, 162-165, 217-220)."""
    core = filtered[..., padding : padding + chunk_size]
    out = core.reshape(core.shape[:-2] + (core.shape[-2] * chunk_size,))
    return out[..., :n_samples]


def grouped_filter(
    filter_fn: Callable[..., jax.Array],
    chunks: jax.Array,
    extra: tuple,
    group: int,
) -> jax.Array:
    """Scan ``filter_fn`` over groups of ``group`` chunks along axis -2.

    Bounds live HBM to ~group·view samples while keeping one compiled body
    (``lax.map`` over the group axis). Zero-pads the chunk count up to a
    multiple of ``group`` and trims afterwards. Results match the one-shot
    batched call up to float rounding (XLA fuses the two programs
    differently; exact in float64).
    """
    n_chunks = chunks.shape[-2]
    n_groups = -(-n_chunks // group)
    pad_k = n_groups * group - n_chunks
    if pad_k:
        chunks = jnp.pad(
            chunks, [(0, 0)] * (chunks.ndim - 2) + [(0, pad_k), (0, 0)]
        )
    grouped = chunks.reshape(
        chunks.shape[:-2] + (n_groups, group, chunks.shape[-1])
    )
    grouped = jnp.moveaxis(grouped, -3, 0)  # (n_groups, ..., group, view)
    filtered = jax.lax.map(lambda c: filter_fn(c, *extra), grouped)
    filtered = jnp.moveaxis(filtered, 0, -3)
    filtered = filtered.reshape(
        filtered.shape[:-3] + (n_groups * group, filtered.shape[-1])
    )
    return filtered[..., :n_chunks, :]


def shard_filter(
    filter_fn: Callable[..., jax.Array],
    chunks: jax.Array,
    mesh,
    axis_name: str = "chunks",
    extra: tuple = (),
    max_parallel_chunks: int = 0,
) -> jax.Array:
    """shard_map ``filter_fn`` over the chunk axis (-2) of pre-extracted
    halo'd chunks (..., n_chunks, view).

    Each device filters its local chunks independently (halo recompute — no
    collectives). ``max_parallel_chunks`` bounds the *per-device* resident
    chunk count via ``grouped_filter`` inside the shard, so hour-long
    recordings on a mesh get bounded HBM too (VERDICT r1 item 4). The chunk
    count pads up to a multiple of the mesh axis with all-zero chunks,
    trimmed from the result.
    """
    from jax.sharding import PartitionSpec as P

    n_chunks = chunks.shape[-2]
    n_dev = mesh.shape[axis_name]
    pad_chunks = (-n_chunks) % n_dev
    if pad_chunks:
        chunks = jnp.pad(
            chunks, [(0, 0)] * (chunks.ndim - 2) + [(0, pad_chunks), (0, 0)]
        )

    def local_fn(local_chunks, *local_extra):
        k_local = local_chunks.shape[-2]
        if max_parallel_chunks and k_local > max_parallel_chunks:
            return grouped_filter(
                filter_fn, local_chunks, local_extra, max_parallel_chunks
            )
        return filter_fn(local_chunks, *local_extra)

    spec = P(*([None] * (chunks.ndim - 2)), axis_name, None)
    extra_specs = tuple(P() for _ in extra)
    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec,) + extra_specs,
        out_specs=spec,
        check_vma=False,
    )(chunks, *extra)
    if pad_chunks:
        sharded = sharded[..., :n_chunks, :]
    return sharded


def process_chunked(
    filter_fn: Callable[..., jax.Array],
    y: jax.Array,
    chunk_size: int,
    padding: int,
    mesh=None,
    axis_name: str = "chunks",
    extra: tuple = (),
    max_parallel_chunks: int = 0,
    cores: bool = False,
) -> jax.Array:
    """Apply ``filter_fn`` ((..., L) -> (..., L)) chunk-parallel over (..., n).

    Single-device path: the chunk axis becomes a batch axis (XLA batches all
    chunks in one launch). With ``mesh`` (a ``jax.sharding.Mesh`` containing
    ``axis_name``), the chunk axis is sharded over devices with
    ``jax.shard_map`` — each device filters its chunks locally; halo overlap
    means zero collectives (the TPU-native replacement for the reference's
    joblib process pool, base.py:206-216).

    ``extra``: additional (replicated) array operands passed to
    ``filter_fn(chunks, *extra)`` — e.g. a stationary noise threshold.
    Passed explicitly rather than closed over so shard_map can see them.

    ``max_parallel_chunks``: 0/None processes every chunk in one batched
    launch (fastest; HBM ∝ total audio). A positive value bounds device
    memory for very long recordings by scanning over groups of that many
    chunks (``lax.map``) — HBM ∝ group size, one compiled body. Composes
    with ``mesh``: each device scans its *local* chunks in groups, so the
    bound is per-device. Results match the batched path up to float
    rounding (XLA fuses the two programs differently; exact in float64).

    ``cores=True`` returns the halo-trimmed (..., n_chunks, chunk_size)
    cores instead of the flat signal — the device-side flatten of
    non-tile-aligned rows is a relayout loop XLA pays per chunk, while
    the host copy flattens for free (see ops.pallas.dispatch). The
    unchunked fast path always returns flat (it has no chunk axis).
    """
    n = y.shape[-1]
    if n <= chunk_size:
        # Unchunked fast path — still halo-padded (base.py:222 → 144-150;
        # SURVEY.md §5.6: even unchunked signals get ±padding zeros). Kept
        # exact (length n + 2·padding) even when a mesh is given, because
        # the non-stationary IIR is global over frames: reshaping to padded
        # chunks would change the result vs the reference.
        ypad = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(padding, padding)])
        return filter_fn(ypad, *extra)[..., padding : padding + n]
    chunks = extract_chunks(y, chunk_size, padding)
    n_chunks = chunks.shape[-2]
    if mesh is None:
        if max_parallel_chunks and n_chunks > max_parallel_chunks:
            filtered = grouped_filter(filter_fn, chunks, extra, max_parallel_chunks)
        else:
            filtered = filter_fn(chunks, *extra)  # one batched launch
    else:
        filtered = shard_filter(
            filter_fn, chunks, mesh, axis_name, extra, max_parallel_chunks
        )
    if cores:
        return filtered[..., padding : padding + chunk_size]
    return assemble_chunks(filtered, chunk_size, padding, n)

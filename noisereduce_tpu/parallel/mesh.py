"""Mesh construction helpers: single-host, multi-chip, and multi-host.

The reference's only scale-out story is a joblib process pool on one machine
(spectralgate/base.py:206-216). Here the equivalent axes are:

* one chip: the chunk axis is a batch axis (process_chunked, vmap-style)
* multi-chip, one host: ``chunk_mesh()`` + ``reduce_noise(..., mesh=...)``
  shard the chunk axis over ICI with ``jax.shard_map`` — no collectives
  (halo recompute)
* multi-host: ``distributed_chunks()`` builds a global sharded array from
  per-host audio segments with ``jax.make_array_from_process_local_data``,
  so hours-long recordings shard over DCN while each host's chunks stay
  local; the same shard-mapped gate runs unchanged.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["chunk_mesh", "distributed_chunks"]


def chunk_mesh(n_devices: Optional[int] = None, axis_name: str = "chunks") -> Mesh:
    """1-D mesh over (up to) all local devices for chunk-axis sharding."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def distributed_chunks(
    local_chunks: np.ndarray,
    mesh: Mesh,
    axis_name: str = "chunks",
) -> jax.Array:
    """Assemble per-process halo'd chunks into one globally sharded array.

    Each process passes its own (channels, local_n_chunks, view) block —
    e.g. produced by ``utils.io.stream_chunks`` over its segment of a long
    recording (with halos read across segment boundaries by the reader).
    Returns a global (channels, total_chunks, view) array sharded over
    ``axis_name``; feed it to the shard-mapped gate exactly like the
    single-host path.

    Multi-host semantics note: halos must come from the *source signal*
    (zero-fill only at the true recording edges) to match the reference's
    chunk reads (base.py:130-148) — cut segments with ``padding`` overlap.
    """
    sharding = NamedSharding(
        mesh, P(*([None] * (local_chunks.ndim - 2)), axis_name, None)
    )
    return jax.make_array_from_process_local_data(sharding, local_chunks)

"""Data parallelism: frame batches sharded across chips.

The reference's primary axis (SURVEY.md §2.4): one spawn-pool worker per
GPU slot, frames round-robined by ``apply_async``
(upscale_processing.py:321-333, 565-577).  On TPU this is simply the batch
dimension of the fused device program sharded over a mesh axis — XLA/GSPMD
partitions every op in the program along N with zero collectives (convs
are independent per frame), so scaling is embarrassingly parallel over ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(x, mesh: Mesh, axis: str = "dp"):
    """Place (N, ...) with N sharded over ``axis`` (N % axis size == 0)."""
    if x.shape[0] % mesh.shape[axis]:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by {axis}={mesh.shape[axis]}"
        )
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def data_parallel_fn(fn: Callable, mesh: Mesh, axis: str = "dp") -> Callable:
    """Wrap a batched program so inputs/outputs are sharded over ``axis``.

    ``fn`` must be shape-polymorphic over the batch dim (all our fused
    chain programs are).  Params and scalars stay replicated.
    """
    spec = NamedSharding(mesh, P(axis))

    jitted = jax.jit(fn, out_shardings=spec)

    def wrapped(batch):
        return jitted(shard_batch(batch, mesh, axis))

    return wrapped

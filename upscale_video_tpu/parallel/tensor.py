"""Tensor parallelism: conv channels sharded across chips (GSPMD).

SURVEY.md §2.4 notes the reference has no tensor dimension; the one real
TP opportunity in this workload is sharding the Valar RRDBNet's 420 convs
channel-wise for per-frame latency.  The idiomatic TPU route is GSPMD:
annotate each conv weight's output-channel axis onto a ``tp`` mesh axis
and jit with replicated inputs — XLA partitions every conv and places the
all-gathers/reduce-scatters on ICI (the scaling-book recipe).

This complements dp (frames across chips) and sp (rows across chips);
tp pays collective traffic per layer and only wins when channel counts
are large relative to the spatial extent per chip.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_params_channelwise(params: Dict, mesh: Mesh, axis: str = "tp") -> Dict:
    """Place conv weights with the output-channel (last HWIO) axis sharded
    over ``mesh[axis]``; biases/slopes shard the same channel axis; params
    whose channel count does not divide the axis stay replicated."""
    n = mesh.shape[axis]

    def place(path_leaf):
        arr = path_leaf
        if arr.ndim == 4 and arr.shape[-1] % n == 0:  # HWIO weight
            spec = P(None, None, None, axis)
        elif arr.ndim == 1 and arr.shape[0] % n == 0:  # bias / slope
            spec = P(axis)
        else:
            spec = P()
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def tensor_parallel_fn(fwd: Callable, mesh: Mesh) -> Callable:
    """jit ``fwd(params, x)`` with replicated activations and channel-
    sharded params; XLA inserts the per-layer collectives."""
    repl = NamedSharding(mesh, P())
    return jax.jit(fwd, out_shardings=repl)

"""Spatial parallelism: one frame sharded across chips by image rows.

This is the TPU analog of the reference's intra-frame tiling
(upscale_processing.py:395-477) promoted to *true* spatial parallelism:
instead of one worker looping over 960px tiles, the frame's H axis is
sharded over a mesh axis and each chip exchanges ``halo`` boundary rows
with its neighbors over ICI (``jax.lax.ppermute``), runs the whole conv
stack on its extended slice, and crops the halo — the reference's
10px-border overlap semantics (:409-434, :465-477), executed as a
collective.  Useful when a single frame's activations exceed one chip's
HBM (8K frames, Valar RRDBNet) or to cut per-frame latency.

Accuracy matches the tiling module: exact away from shard boundaries when
``halo >= receptive field``; global frame borders see zero context (same
approximation class as the reference's borderless edge tiles).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8: keyword is check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _exchange_halo(x: jnp.ndarray, axis_name: str, halo: int) -> jnp.ndarray:
    """Extend a local (N, Hloc, W, C) slice with neighbor rows.

    Non-wrapping: the first shard's top halo and last shard's bottom halo
    are zeros (mirroring conv zero padding at the true frame border).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send my bottom rows down to the next shard (they become its top halo)
    down = [(i, (i + 1) % n) for i in range(n)]
    up = [(i, (i - 1) % n) for i in range(n)]
    top_halo = jax.lax.ppermute(x[:, -halo:], axis_name, down)
    bot_halo = jax.lax.ppermute(x[:, :halo], axis_name, up)
    zeros = jnp.zeros_like(top_halo)
    top_halo = jnp.where(idx == 0, zeros, top_halo)
    bot_halo = jnp.where(idx == n - 1, zeros, bot_halo)
    return jnp.concatenate([top_halo, x, bot_halo], axis=1)


def spatial_forward(
    fwd: Callable,
    params,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "sp",
    halo: int = 16,
    scale: int = 2,
    extra_axes: tuple = (),
) -> jnp.ndarray:
    """Run ``fwd(params, x)`` with the H axis sharded over ``mesh[axis]``.

    Args:
      fwd: NHWC model forward (params, (N,h,W,C)) -> (N,h*scale,...).
      x: (N, H, W, C) with H divisible by the axis size.
      halo: boundary rows exchanged (>= receptive field for exactness).
      extra_axes: other mesh axes the input batch is sharded over (e.g.
        ("dp",) when combining with data parallelism).

    Returns the full (N, H*scale, W*scale, C') result, sharded the same way.
    """
    n_shards = mesh.shape[axis]
    if x.shape[1] % n_shards:
        raise ValueError(f"H={x.shape[1]} not divisible by {axis}={n_shards}")

    batch_spec = extra_axes[0] if extra_axes else None
    spec_in = P(batch_spec, axis, None, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), spec_in),
        out_specs=spec_in,
        check_rep=False,
    )
    def run(params, xs):
        ext = _exchange_halo(xs, axis, halo)
        y = fwd(params, ext)
        hs = halo * scale
        return y[:, hs : y.shape[1] - hs]

    return run(params, x)


def sp_sharded_fn(fn: Callable, mesh: Mesh, axis: str = "sp") -> Callable:
    """The SHIPPED ``--parallel sp`` path: GSPMD row sharding of a frames
    program (uint8 (N, H, W, C) in, uint8 frames or planes out).

    The H axis is sharded over ``mesh[axis]`` and ``fn`` is jitted with
    matching in/out shardings — XLA/GSPMD inserts the per-conv halo
    exchanges on ICI (exact math, unlike the fixed-halo approximation of
    :func:`spatial_forward`, which remains the explicit-collective
    formulation of the same axis; tests/test_parallel.py holds the two
    equivalent).  H not divisible by the axis size — e.g. the reference's
    own 800-row Blu-ray (README.md:149) on a 3-chip mesh — is edge-padded
    to the next multiple (``ops.pixel.pad_to_multiple``) and the padding
    cropped after, scaled by the program's own H ratio so the full-frame
    (scale*H) and shuffle-planar (H) output contracts both crop correctly.
    """
    from upscale_video_tpu.ops.pixel import pad_to_multiple

    n = mesh.shape[axis]
    spec = NamedSharding(mesh, P(None, axis, None, None))
    jitted = jax.jit(fn, in_shardings=spec, out_shardings=spec)

    def _sp_step(frames_u8):
        h = frames_u8.shape[1]
        padded, (ph, _) = pad_to_multiple(jnp.asarray(frames_u8), n, 1)
        y = jitted(jax.device_put(padded, spec))
        if ph:
            out_scale = y.shape[1] // (h + ph)
            y = y[:, : y.shape[1] - ph * out_scale]
        return y

    return _sp_step


def shard_frame_batch(x, mesh: Mesh, batch_axis: str = "dp", h_axis: str = "sp"):
    """Place a host (N,H,W,C) batch with N over dp and H over sp."""
    spec = P(
        batch_axis if batch_axis in mesh.shape else None,
        h_axis if h_axis in mesh.shape else None,
        None,
        None,
    )
    return jax.device_put(x, NamedSharding(mesh, spec))

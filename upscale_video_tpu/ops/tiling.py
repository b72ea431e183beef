"""Haloed spatial tiling for frames that exceed the HBM activation budget.

Reference semantics (upscale/upscale_processing.py:395-477, ``process_tile``/
``upscale_image``): the frame is cut into a fixed 960px grid; each tile is
extended by a 10px context border on edges interior to the image, the model
runs per tile, and the scaled border is cropped before pasting into a black
output canvas.  That design produces ragged tile shapes (edge tiles are
smaller), which is hostile to XLA's static-shape compilation — every ragged
shape would recompile.

TPU-first redesign:

- the frame is zero-padded by ``halo`` and up to a tile multiple, so every
  tile has the SAME static shape ``(tile+2*halo, tile+2*halo)``;
- tiles are gathered into a batch and processed by ``jax.lax.map`` in
  chunks of ``tiles_per_step`` (bounding peak HBM exactly like the
  reference's per-tile loop bounded VRAM), or ``vmap`` when they all fit;
- the scaled halo is cropped and tiles are reassembled by reshape — no
  scatter needed.

Accuracy: with ``halo >= receptive field`` interior pixels are bit-identical
to whole-frame execution; pixels within one receptive field of the frame
border see zero-context instead of the conv's own zero padding (same
approximation class as the reference, which uses halo=10 — *below* the
Compact models' ~18px receptive field).  Default halo here is 16 and
configurable, unlike the reference's hardcoded 10/960 constants
(upscale_processing.py:489 — promoted to flags per SURVEY.md §5).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp


def fit_tile_grid(h: int, w: int, budget: int) -> Tuple[int, int]:
    """Geometry-fit rectangular tile for an (h, w) frame.

    A square ``budget`` tile wastes up to ~50% compute when the frame is
    not a multiple of it (e.g. 480 on 1080 rows covers 1440: 3 tiles,
    +33% padded rows — the reference pays the same class of waste through
    ragged edge tiles, upscale_processing.py:409-427).  Instead keep the
    grid the square budget implies (``ceil(dim / budget)`` tiles per
    axis) but shrink each tile to just cover the frame, so padding waste
    is at most 7 px per axis and per-tile memory never exceeds the
    budget's.  Tile edges are rounded up to 8 (sublane tiling; the Pallas
    kernels pad to lane multiples internally).
    """
    gy = max(1, math.ceil(h / budget))
    gx = max(1, math.ceil(w / budget))
    th = min(budget, 8 * math.ceil(h / gy / 8))
    tw = min(budget, 8 * math.ceil(w / gx / 8))
    # rounding up the edge can make the last tile redundant (e.g. 1000
    # rows, budget 480: gy=3 but th=336 -> 3*336=1008 covers it with
    # gy=3; 1020 rows -> th=344, 3*344=1032, still 3).  Drop empty tails.
    while gy > 1 and (gy - 1) * th >= h:
        gy -= 1
    while gx > 1 and (gx - 1) * tw >= w:
        gx -= 1
    return th, tw


def tiled_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    img: jnp.ndarray,
    tile: Union[int, Tuple[int, int]] = 512,
    halo: int = 16,
    scale: int = 1,
    tiles_per_step: Optional[int] = None,
) -> jnp.ndarray:
    """Apply a per-batch model ``fn`` over haloed tiles of ``img``.

    Args:
      fn: maps (N, th, tw, C) -> (N, th*scale, tw*scale, C') — a jitted
        model forward closed over params.
      img: (H, W, C) single frame (float, model domain).
      tile: interior tile size — an int (both axes) or an ``(th, tw)``
        pair (see :func:`fit_tile_grid` for geometry-fit planning).
      halo: context border; >= the model's receptive field for exactness.
      scale: spatial scale factor of ``fn``.
      tiles_per_step: process tiles in chunks of this size via ``lax.map``
        (bounds peak memory); ``None`` = all at once via one batched call.

    Returns: (H*scale, W*scale, C') frame.
    """
    h, w, c = img.shape
    tile_h, tile_w = (tile, tile) if isinstance(tile, int) else tile
    ty = math.ceil(h / tile_h)
    tx = math.ceil(w / tile_w)
    ph = ty * tile_h - h
    pw = tx * tile_w - w

    x = jnp.pad(img, ((halo, halo + ph), (halo, halo + pw), (0, 0)))

    # gather uniform tiles: (ty*tx, tile_h+2halo, tile_w+2halo, c)
    span_h = tile_h + 2 * halo
    span_w = tile_w + 2 * halo
    rows = []
    for i in range(ty):
        for j in range(tx):
            rows.append(
                x[i * tile_h : i * tile_h + span_h,
                  j * tile_w : j * tile_w + span_w, :]
            )
    tiles = jnp.stack(rows, axis=0)

    n = tiles.shape[0]
    if tiles_per_step is None or tiles_per_step >= n:
        out_tiles = fn(tiles)
    else:
        # pad tile count to a chunk multiple, lax.map over chunks
        chunks = math.ceil(n / tiles_per_step)
        pad_n = chunks * tiles_per_step - n
        if pad_n:
            tiles = jnp.concatenate([tiles, tiles[:pad_n]], axis=0)
        tiles = tiles.reshape(chunks, tiles_per_step, span_h, span_w, c)
        out_tiles = jax.lax.map(fn, tiles)
        out_tiles = out_tiles.reshape(
            chunks * tiles_per_step, span_h * scale, span_w * scale, -1
        )
        out_tiles = out_tiles[:n]

    # crop scaled halo, reassemble grid by reshape
    hs = halo * scale
    ts_h = tile_h * scale
    ts_w = tile_w * scale
    inner = out_tiles[:, hs : hs + ts_h, hs : hs + ts_w, :]
    c_out = inner.shape[-1]
    grid = inner.reshape(ty, tx, ts_h, ts_w, c_out)
    full = grid.transpose(0, 2, 1, 3, 4).reshape(ty * ts_h, tx * ts_w, c_out)
    return full[: h * scale, : w * scale, :]


def receptive_field_halo(num_conv3x3: int) -> int:
    """Halo needed for interior exactness of a stack of 3x3 convs."""
    return num_conv3x3

"""Bordered-chain Pallas conv stack: zero host ops between layers.

The profiler attribution in NOTES.md shows the per-layer Pallas conv
kernels are the fastest convs on the chip but the naive composition loses
it all to host-side glue: a pad and an output crop around EVERY layer,
because each ``conv3x3_fused`` call re-establishes its own padded layout.

This module keeps a single **chain layout** across a whole stack of
stride-1 3x3 convs, so consecutive layers connect custom-call-to-custom-
call with no XLA ops in between:

- array ``((gy+2)*th, (gx+2)*tw, 128)`` bf16: a one-tile ring of zeros
  surrounds the data region (standing in for conv zero padding); lanes
  are fixed at 128 — Mosaic requires full-lane-tile HBM operands for
  these DMA window patterns (64-lane and packed-2D variants were tried
  on hardware and crash the compiler);
- each layer is one ``pallas_call`` over the DATA tiles only: the ring is
  never re-written — output buffers ping-pong between two ring-zeroed
  arrays donated via ``input_output_aliases``, so ring zeros persist and
  border grid steps (22% of v1's steps) disappear;
- every data tile DMAs its haloed window (always in-bounds thanks to the
  ring, so every in-kernel slice offset is static), masks the grid-padding
  region to zero (it holds stale bytes from two layers ago), builds the
  im2col patch matrix in VMEM, and runs one MXU matmul with the bias +
  activation epilogue;
- layers may change channel count (cin_k -> cout_k <= 128).

Host cost for an L-layer stack: ONE embed before and ONE crop after (or
zero crops when the fused SR tail consumes the chain layout directly —
``crop=False`` returns the ring-layout array).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from upscale_video_tpu.ops.common import CHAIN_TILE_H, CHAIN_TILE_W, round_up
from upscale_video_tpu.ops.conv_pallas import (
    ACT_LEAKY, ACT_NONE, ACT_PRELU, ACT_RELU,
)

LANES = 128


class ChainLayer(NamedTuple):
    wmat: jnp.ndarray  # (9*cin, cout) bf16
    bias: jnp.ndarray  # (1, cout) f32
    slope: jnp.ndarray  # (1, cout) f32 (PReLU/leaky) or zeros
    act: int  # conv_pallas encoding: ACT_NONE/ACT_PRELU/ACT_LEAKY/ACT_RELU
    cin: int
    cout: int


def _chain_kernel(w_ref, b_ref, s_ref, x_hbm, dst_ref, out_ref, win, sem,
                  *, th: int, tw: int, cin: int, act: int,
                  valid_h: int, valid_w: int):
    del dst_ref  # ring-zeroed buffer aliased to the output; never read
    i = pl.program_id(0)
    j = pl.program_id(1)
    gy = pl.num_programs(0)
    gx = pl.num_programs(1)
    win_w = tw + 16
    k = i * gx + j
    slot = k % 2

    def window_dma(ii, jj, sl):
        # data region starts at (th, tw); halo offsets stay static and
        # in-bounds because of the zero ring
        r0 = th + ii * th - 1
        c0 = pl.multiple_of(tw + jj * tw - 8, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, th + 2), pl.ds(c0, win_w), :],
            win.at[sl],
            sem.at[sl],
        )

    @pl.when(k == 0)
    def _warmup():
        window_dma(i, j, slot).start()

    # prefetch the NEXT grid step's window (double buffering across steps)
    last = k == gy * gx - 1
    nj = jnp.where(j + 1 < gx, j + 1, 0)
    ni = jnp.where(j + 1 < gx, i, i + 1)

    @pl.when(jnp.logical_not(last))
    def _prefetch():
        window_dma(ni, nj, 1 - slot).start()

    window_dma(i, j, slot).wait()
    xt = win[slot]
    # zero the grid-padding region inside the data area (stands in for
    # conv zero padding at the true frame bottom/right; recycled buffers
    # hold stale activations there).  Masks are built at full 3D shape —
    # Mosaic rejects inserting a minor dim onto a 2D mask.
    shape3 = (th + 2, win_w, LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape3, 0) + (i * th - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape3, 1) + (j * tw - 8)
    valid = jnp.logical_and(rows < valid_h, cols < valid_w)
    xt = jnp.where(valid, xt, jnp.zeros_like(xt))

    m = th * tw
    colsl = []
    for dy in range(3):
        for dx in range(3):
            sl = xt[dy : dy + th, 7 + dx : 7 + dx + tw, :cin]
            colsl.append(sl.reshape(m, cin))
    patches = jnp.concatenate(colsl, axis=-1)

    y = jnp.dot(patches, w_ref[:, :], preferred_element_type=jnp.float32)
    y = y + b_ref[0, :].astype(jnp.float32)
    if act == ACT_RELU:
        y = jnp.maximum(y, 0.0)
    elif act == ACT_LEAKY:
        y = jnp.where(y >= 0, y, y * s_ref[0, 0].astype(jnp.float32))
    elif act == ACT_PRELU:
        slope = s_ref[0, :].astype(jnp.float32)
        y = jnp.where(y >= 0, y, y * slope)
    cout = y.shape[-1]
    y = y.astype(out_ref.dtype)
    if cout < LANES:
        y = jnp.concatenate(
            [y, jnp.zeros((m, LANES - cout), out_ref.dtype)], axis=-1
        )
    out_ref[:, :, :] = y.reshape(th, tw, LANES)


def _chain_step(src, dst, layer: ChainLayer, th, tw, valid_h, valid_w,
                interpret):
    """One conv layer: reads ``src`` (ring layout, cin lanes), writes the
    data tiles of ``dst`` (ring layout, cout lanes; its ring must already
    be zero — it is donated and aliased to the output)."""
    gy = src.shape[0] // th - 2
    gx = src.shape[1] // tw - 2
    return pl.pallas_call(
        functools.partial(
            _chain_kernel, th=th, tw=tw, cin=layer.cin, act=layer.act,
            valid_h=valid_h, valid_w=valid_w,
        ),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec((9 * layer.cin, layer.cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, layer.cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, layer.cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (th, tw, LANES), lambda i, j: (i + 1, j + 1, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(dst.shape, jnp.bfloat16),
        input_output_aliases={4: 0},
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 16, LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(layer.wmat, layer.bias, layer.slope, src, dst)


@functools.partial(
    jax.jit,
    static_argnames=("acts", "tile_h", "tile_w", "interpret", "crop"),
)
def _run_chain(x, wmats, biases, slopes, acts, tile_h, tile_w, interpret,
               crop=True):
    hgt, wid, cin0 = x.shape
    th = min(tile_h, round_up(hgt, 8))
    tw = min(tile_w, round_up(wid, 8))
    gy = -(-hgt // th)
    gx = -(-wid // tw)
    rows, cols = (gy + 2) * th, (gx + 2) * tw

    # embed once: ring + grid padding + lane padding, all zeros
    arr = jnp.zeros((rows, cols, LANES), jnp.bfloat16)
    arr = jax.lax.dynamic_update_slice(
        arr, x.astype(jnp.bfloat16), (th, tw, 0)
    )

    # ping-pong: TWO ring-zeroed buffers alternate (each layer's grid
    # fully overwrites the data region of the donated buffer; the ring is
    # never written, so its zeros persist across all layers)
    spare = jnp.zeros((rows, cols, LANES), jnp.bfloat16)
    for wmat, b, s, act in zip(wmats, biases, slopes, acts):
        cin = wmat.shape[0] // 9
        layer = ChainLayer(wmat, b, s, act, cin, wmat.shape[1])
        out = _chain_step(arr, spare, layer, th, tw, hgt, wid, interpret)
        spare = arr  # previous input buffer is free for recycling
        arr = out

    cout = wmats[-1].shape[1]
    if not crop:
        return arr
    return jax.lax.dynamic_slice(
        arr, (th, tw, 0), (hgt, wid, LANES)
    )[:, :, :cout]


def conv3x3_chain(
    x: jnp.ndarray,
    layers: Sequence[dict],
    tile_h: int = CHAIN_TILE_H,
    tile_w: int = CHAIN_TILE_W,
    interpret: Optional[bool] = None,
    crop: bool = True,
) -> jnp.ndarray:
    """Run a stack of SAME 3x3 convs over one (H, W, C) image.

    ``layers``: dicts with ``weight`` (HWIO), optional ``bias``, ``slope``
    (per-channel PReLU or 1-elem leaky), ``act`` — the conv_pallas
    activation constants (ACT_NONE / ACT_PRELU / ACT_LEAKY / ACT_RELU;
    ONE encoding shared by both kernel families).  Returns (H, W, cout_last) bf16 — or, with
    ``crop=False``, the full ring-layout array (data region at tile
    offset (1, 1)) for a fused consumer like the SR tail kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    wmats, biases, slopes, acts = [], [], [], []
    for l in layers:
        w = l["weight"]
        kh, kw, cin, cout = w.shape
        assert (kh, kw) == (3, 3) and cin <= 128 and cout <= 128
        wmats.append(jnp.asarray(w, jnp.bfloat16).reshape(9 * cin, cout))
        b = l.get("bias")
        biases.append(
            (jnp.asarray(b) if b is not None else jnp.zeros((cout,)))
            .reshape(1, cout).astype(jnp.float32)
        )
        s = l.get("slope")
        if s is None:
            slopes.append(jnp.zeros((1, cout), jnp.float32))
        else:
            s = jnp.asarray(s, jnp.float32).reshape(1, -1)
            slopes.append(jnp.broadcast_to(s, (1, cout))
                          if s.shape[1] in (1, cout) else s)
        acts.append(int(l.get("act", 0)))
    return _run_chain(x, tuple(wmats), tuple(biases), tuple(slopes),
                      tuple(acts), tile_h, tile_w, interpret, crop)


def conv3x3_chain_batch(x, layers, **kw):
    """Static unroll over N (HBM-space pallas operands cannot be vmapped)."""
    return jnp.stack([
        conv3x3_chain(x[i], layers, **kw) for i in range(x.shape[0])
    ])



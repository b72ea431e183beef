"""Pallas fused conv3x3(+bias+PReLU/leaky) — the framework's hot kernel.

Why: XLA's ``conv_general_dilated`` on v5e runs the zoo's 64-channel 3x3
convs at ~20 TFLOP/s (~10% of MXU peak; measured via bench.py's chained
protocol), and every HBM-materialized im2col formulation is bandwidth-bound
(arithmetic intensity 9x lower than the conv itself).  This kernel reads
each input tile into VMEM **once**, builds the (tile_pixels, 9*C_in) patch
matrix as in-register values (never touching HBM), and runs one MXU matmul
per tile with the bias + activation epilogue fused:

    HBM traffic  = x once in + y once out   (AI ~ 288 FLOP/byte, compute-bound)
    MXU shape    = (th*tw, 9*C_in) @ (9*C_in, C_out)

Alignment rules honoured (Mosaic): the input's leading (row) dim of a 3D
array is untiled so row offsets are free; the column (sublane) dim is
over-fetched to multiples of 8; channels ride the lane dim.

Used by the graph executor for stride-1 dilation-1 3x3 convs (with the
following PReLU fused when the graph allows); everything else falls back
to the XLA path.

Measured on v5e (bench.py two-K protocol, 1080p, 64ch):

- XLA ``conv_general_dilated``: ~20 TFLOP/s
- this kernel (double-buffered, th=16/tw=480): ~44 TFLOP/s per layer
- a 16-layer chain of this kernel: 3.5 ms/layer (56 ms body total)
- full-model outcome (profiler-attributed, NOTES.md): for the 64-channel
  Compact family XLA's own conv fusion is near-optimal and the per-layer
  pad/crop glue makes this path a net loss there (the bordered-chain
  variant in ops/conv_chain.py eliminates the glue and reaches parity);
  for Valar's narrow-channel RRDB blocks this kernel is the WIN: -18%
  whole-model device time vs XLA.  ``conv_impl="auto"`` encodes that
  policy.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from upscale_video_tpu.ops.common import round_up

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# activation modes for the fused epilogue
ACT_NONE = 0
ACT_PRELU = 1  # per-channel slope
ACT_LEAKY = 2  # scalar slope (slope[0])
ACT_RELU = 3


def _kernel(x_hbm, w_ref, b_ref, s_ref, out_ref, xbuf, sem,
            *, th: int, tw: int, cin: int, act: int):
    """Double-buffered: while tile k computes, tile k+1's input window is
    in flight (output blocks are pipelined by Pallas itself)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    gx = pl.num_programs(1)
    win_w = tw + 8  # sublane-aligned over-fetch (need tw+2)
    slot = (i * gx + j) % 2

    def window_dma(ii, jj, sl):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(ii * th, th + 2), pl.ds(jj * tw, win_w), :],
            xbuf.at[sl],
            sem.at[sl],
        )

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _warmup():
        window_dma(i, j, slot).start()

    # prefetch the next grid step's window into the other slot
    last = jnp.logical_and(i == pl.num_programs(0) - 1, j == gx - 1)
    nj = jnp.where(j + 1 < gx, j + 1, 0)
    ni = jnp.where(j + 1 < gx, i, i + 1)

    @pl.when(jnp.logical_not(last))
    def _prefetch():
        window_dma(ni, nj, 1 - slot).start()

    window_dma(i, j, slot).wait()

    # xbuf carries cin padded up to the 128-lane tiling (HBM DMA slices
    # must be lane-aligned); the real channels are the leading cin lanes.
    xt = xbuf[slot]  # (th+2, tw+8, cin_padded)
    m = th * tw
    cols = []
    for dy in range(3):
        for dx in range(3):
            sl = xt[dy : dy + th, dx : dx + tw, :cin]
            cols.append(sl.reshape(m, cin))
    patches = jnp.concatenate(cols, axis=-1)  # (m, 9*cin), VMEM value

    y = jnp.dot(patches, w_ref[:, :], preferred_element_type=jnp.float32)
    y = y + b_ref[0, :].astype(jnp.float32)
    if act == ACT_PRELU:
        slope = s_ref[0, :].astype(jnp.float32)
        y = jnp.where(y >= 0, y, y * slope)
    elif act == ACT_LEAKY:
        y = jnp.where(y >= 0, y, y * s_ref[0, 0].astype(jnp.float32))
    elif act == ACT_RELU:
        y = jnp.maximum(y, 0.0)

    out_ref[:, :, :] = y.astype(out_ref.dtype).reshape(th, tw, -1)


@functools.partial(
    jax.jit,
    static_argnames=("act", "tile_h", "tile_w", "interpret", "out_dtype"),
)
def conv3x3_fused(
    x: jnp.ndarray,
    w_hwio: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    slope: Optional[jnp.ndarray] = None,
    act: int = ACT_NONE,
    tile_h: int = 16,
    tile_w: int = 480,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME-padded stride-1 3x3 conv + bias + activation on one (H, W, Cin)
    image; returns (H, W, Cout) in ``out_dtype``.

    ``slope``: per-channel PReLU slopes (act=ACT_PRELU) or a 1-element
    leaky slope (act=ACT_LEAKY).
    """
    hgt, wid, cin = x.shape
    kh, kw, wcin, cout = w_hwio.shape
    assert (kh, kw) == (3, 3) and wcin == cin, "kernel expects 3x3 SAME conv"

    th = min(tile_h, round_up(hgt, 8))
    tw = min(tile_w, round_up(wid, 8))
    gy = -(-hgt // th)
    gx = -(-wid // tw)

    xb = x.astype(jnp.bfloat16)
    # conv zero padding (1px) + grid/alignment slack (zeros, cropped after);
    # channels padded to the 128-lane tiling so HBM DMA windows are legal
    cin_p = round_up(cin, 128)
    xp = jnp.pad(
        xb,
        ((1, gy * th + 1 - hgt), (1, gx * tw + 8 - 1 - wid), (0, cin_p - cin)),
    )

    wmat = w_hwio.reshape(9 * cin, cout).astype(jnp.bfloat16)
    b = (bias if bias is not None else jnp.zeros((cout,), jnp.float32))
    b = b.reshape(1, cout).astype(jnp.float32)
    if slope is None:
        s = jnp.zeros((1, cout), jnp.float32)
    else:
        s = jnp.broadcast_to(
            slope.reshape(1, -1).astype(jnp.float32), (1, cout)
        ) if slope.size in (1, cout) else slope.reshape(1, cout)

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, tw=tw, cin=cin, act=act),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((9 * cin, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (th, tw, cout), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((gy * th, gx * tw, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 8, cin_p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wmat, b, s)

    return out[:hgt, :wid, :]


def conv3x3_fused_batch(x, w_hwio, bias=None, slope=None, act=ACT_NONE, **kw):
    """(N, H, W, C) batched wrapper; interprets the kernel off-TPU so the
    same model code runs on the CPU test platform.

    Batch is a static unroll, NOT vmap: Mosaic requires HBM-space pallas
    operands to be whole arrays with trivial index maps, which a vmapped
    leading batch dim violates for N > 1.  N is the pipeline's small
    frames-per-step, so the unroll is cheap."""
    kw.setdefault("interpret", jax.default_backend() != "tpu")
    return jnp.stack([
        conv3x3_fused(x[i], w_hwio, bias, slope, act, **kw)
        for i in range(x.shape[0])
    ])



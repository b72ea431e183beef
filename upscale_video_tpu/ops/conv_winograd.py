"""Row-wise Winograd F(2,3) conv chain — the round-3 conv-body experiment.

The shipped Compact body is 16 x 64->64 3x3 convs at ~71 TFLOP/s of a ~98
TFLOP/s lane-fill ceiling (NOTES.md conv-body study); the only identified
algorithmic lever left is Winograd's MAC reduction.  Full 2D F(2x2,3x3)
needs stride-2 decimation of the *column* (sublane-tiled) axis for its
input transform — a minor-dim relayout per coordinate that the same study
predicts eats the 2.25x MAC saving.  This kernel therefore applies
Winograd along ROWS only (the outer, untiled axis) and stays direct along
columns — "F(2x1, 3x3)":

- per output-row pair ``2i, 2i+1`` the four row combinations
  ``V0 = d0-d2, V1 = d1+d2, V2 = d2-d1, V3 = d1-d3`` (rows ``2i-1..2i+2``)
  are stride-2 slices of the haloed window on the OUTER dim — free;
- the column taps stay an im2col concat (the proven chain-kernel move), so
  each of the four coordinates is one MXU matmul
  ``[th/2*tw, 3*cin] @ [3*cin, cout]`` against the row-transformed weights
  ``U_a = sum_dy G[a,dy] w[dy,:,:,:]``;
- output transform ``y_even = M0+M1+M2, y_odd = M1-M2-M3`` is four f32
  adds and an outer-dim interleave (major-dim reshape — free).

MACs per output pixel: ``4 * 3*cin * cout / 2`` = **1.5x fewer** than
direct ``9*cin*cout`` (2/3), with all transforms on cheap axes.  Whether
that converts to wall-clock on v5e is decided by measurement
(tools/wino_bench.py); NOTES.md records the verdict either way — the
round-2 verdict asks for the experiment or its data-backed refutation.

Everything else (ring-zeroed chain layout, window DMA double buffering,
ping-pong output aliasing, validity masking) mirrors conv_chain.py — the
two kernels share the layout contract so either can run the conv body.

Reference hot loop this replaces: upscale_processing.py:450-452 (ncnn
extractor conv stack).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from upscale_video_tpu.ops.common import CHAIN_TILE_H, CHAIN_TILE_W, round_up
from upscale_video_tpu.ops.conv_pallas import (
    ACT_LEAKY, ACT_NONE, ACT_PRELU, ACT_RELU,
)

LANES = 128

# F(2,3): G (4x3) row-transforms the weights; A^T (2x4) the outputs.
_G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]]
)


def transform_weights(w) -> jnp.ndarray:
    """HWIO (3, 3, cin, cout) -> (4, 3*cin, cout): ``U_a`` per coordinate,
    K ordered dx-major to match the kernel's patch concat.  jnp throughout
    so traced weights (e.g. a chained benchmark or a finetune step that
    re-derives U per iteration) work too."""
    u = jnp.einsum(
        "ad,dxio->axio", jnp.asarray(_G, jnp.float32),
        jnp.asarray(w, jnp.float32),
    )
    return u.reshape(4, 3 * w.shape[2], w.shape[3])


def _wino_kernel(w_ref, b_ref, s_ref, x_hbm, dst_ref, out_ref, win, sem,
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

    last = k == gy * gx - 1
    nj = jnp.where(j + 1 < gx, j + 1, 0)
    ni = jnp.where(j + 1 < gx, i, i + 1)

    @pl.when(jnp.logical_not(last))
    def _prefetch():
        window_dma(ni, nj, 1 - slot).start()

    window_dma(i, j, slot).wait()
    xt = win[slot]
    # zero the grid-padding region (stale bytes from two layers ago stand
    # where conv zero padding must be) — identical to conv_chain
    shape3 = (th + 2, win_w, LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape3, 0) + (i * th - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape3, 1) + (j * tw - 8)
    valid = jnp.logical_and(rows < valid_h, cols < valid_w)
    xt = jnp.where(valid, xt, jnp.zeros_like(xt))

    # Winograd row combinations: stride-2 row selection via outer-dim
    # reshape + index (Mosaic lowers a strided 3D slice as a gather, which
    # it rejects; splitting the untiled rows dim is relayout-free).
    # Window row w == tile row w-1, so pair i uses window rows 2i..2i+3.
    lo = xt[0:th].reshape(th // 2, 2, win_w, LANES)
    hi = xt[2 : th + 2].reshape(th // 2, 2, win_w, LANES)
    d0, d1 = lo[:, 0], lo[:, 1]
    d2, d3 = hi[:, 0], hi[:, 1]
    v = (d0 - d2, d1 + d2, d2 - d1, d1 - d3)

    m2 = (th // 2) * tw
    cout = b_ref.shape[-1]
    bias = b_ref[0, :].astype(jnp.float32)
    acc0 = jnp.broadcast_to(bias, (m2, cout))
    acc1 = acc0
    # A^T = [[1,1,1,0],[0,1,-1,-1]] — accumulate each coordinate's matmul
    # straight into the two output rows (one patches buffer live at a time)
    coef = ((1.0, 0.0), (1.0, 1.0), (1.0, -1.0), (0.0, -1.0))
    for a in range(4):
        patches = jnp.concatenate(
            [v[a][:, 7 + dx : 7 + dx + tw, :cin].reshape(m2, cin)
             for dx in range(3)],
            axis=-1,
        )
        m = jnp.dot(patches, w_ref[a], preferred_element_type=jnp.float32)
        c0, c1 = coef[a]
        if c0:
            acc0 = acc0 + (m if c0 == 1.0 else m * c0)
        if c1:
            acc1 = acc1 + (m if c1 == 1.0 else -m)

    def epilogue(y):
        if act == ACT_RELU:
            return jnp.maximum(y, 0.0)
        if act == ACT_LEAKY:
            return jnp.where(y >= 0, y, y * s_ref[0, 0].astype(jnp.float32))
        if act == ACT_PRELU:
            slope = s_ref[0, :].astype(jnp.float32)
            return jnp.where(y >= 0, y, y * slope)
        return y

    y0 = epilogue(acc0).reshape(th // 2, tw, cout)
    y1 = epilogue(acc1).reshape(th // 2, tw, cout)
    y = jnp.stack([y0, y1], axis=1).reshape(th, tw, cout)
    y = y.astype(out_ref.dtype)
    if cout < LANES:
        y = jnp.concatenate(
            [y, jnp.zeros((th, tw, LANES - cout), out_ref.dtype)], axis=-1
        )
    out_ref[:, :, :] = y


def _wino_step(src, dst, wmat, bias, slope, act, cin, th, tw,
               valid_h, valid_w, interpret):
    gy = src.shape[0] // th - 2
    gx = src.shape[1] // tw - 2
    cout = wmat.shape[-1]
    return pl.pallas_call(
        functools.partial(
            _wino_kernel, th=th, tw=tw, cin=cin, act=act,
            valid_h=valid_h, valid_w=valid_w,
        ),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec((4, 3 * cin, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
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
    )(wmat, bias, slope, src, dst)


@functools.partial(
    jax.jit,
    static_argnames=("acts", "cins", "tile_h", "tile_w", "interpret", "crop"),
)
def _run_wino_chain(x, wmats, biases, slopes, acts, cins, tile_h, tile_w,
                    interpret, crop=True):
    hgt, wid, _ = x.shape
    th = min(tile_h, round_up(hgt, 8))
    tw = min(tile_w, round_up(wid, 8))
    if th % 2:
        th += 1  # F(2,3) pairs output rows
    gy = -(-hgt // th)
    gx = -(-wid // tw)
    rows, cols = (gy + 2) * th, (gx + 2) * tw

    arr = jnp.zeros((rows, cols, LANES), jnp.bfloat16)
    arr = jax.lax.dynamic_update_slice(
        arr, x.astype(jnp.bfloat16), (th, tw, 0)
    )
    spare = jnp.zeros((rows, cols, LANES), jnp.bfloat16)
    for wmat, b, s, act, cin in zip(wmats, biases, slopes, acts, cins):
        out = _wino_step(arr, spare, wmat, b, s, act, cin, th, tw,
                         hgt, wid, interpret)
        spare = arr
        arr = out

    cout = wmats[-1].shape[-1]
    if not crop:
        return arr
    return jax.lax.dynamic_slice(
        arr, (th, tw, 0), (hgt, wid, LANES)
    )[:, :, :cout]


def winograd_chain(
    x: jnp.ndarray,
    layers: Sequence[dict],
    tile_h: int = CHAIN_TILE_H,
    tile_w: int = CHAIN_TILE_W,
    interpret: Optional[bool] = None,
    crop: bool = True,
) -> jnp.ndarray:
    """Run a stack of SAME 3x3 convs over one (H, W, C) image with the
    row-wise Winograd kernel.  Same contract as conv_chain.conv3x3_chain
    (``layers`` dicts with HWIO ``weight``, optional ``bias``/``slope``,
    ``act`` in the shared conv_pallas encoding; bf16 compute)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    wmats, biases, slopes, acts, cins = [], [], [], [], []
    for l in layers:
        w = l["weight"]
        kh, kw, cin, cout = w.shape
        if (kh, kw) != (3, 3) or cin > 128 or cout > 128:
            # must survive `python -O`: a non-3x3 weight reshaped by
            # transform_weights would silently compute garbage
            raise ValueError(
                f"winograd_chain needs 3x3 convs with <=128 channels, "
                f"got weight {w.shape}"
            )
        wmats.append(jnp.asarray(transform_weights(w), jnp.bfloat16))
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
        cins.append(cin)
    return _run_wino_chain(x, tuple(wmats), tuple(biases), tuple(slopes),
                           tuple(acts), tuple(cins), tile_h, tile_w,
                           interpret, crop)

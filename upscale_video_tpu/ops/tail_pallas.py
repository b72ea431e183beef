"""Pallas fused SR tail: conv(64->3*s^2) + pixel-shuffle + nearest-skip add.

The SRVGG tail (reference graph: ``Conv_34 -> DepthToSpace_35 ->
Resize_36 -> Add_37`` in 2x_Compact_Pretrain.param) is where the mixed
XLA/Pallas pipeline loses time: XLA ops consuming a Pallas custom-call
output re-layout the full 4K tensor (NOTES.md).  This kernel produces the
FINAL image directly from the body activations — the 3x3 conv, the
pixel-shuffle rearrange, the nearest-x2 input skip, and the residual add
all happen per tile in VMEM; output is planar (3, 2H, 2W) so the upscaled
resolution rides the lane axis.

Status: semantics-complete and interpret-tested against the XLA tail;
opt-in (not yet wired into the executor) pending TPU validation — part of
the NOTES.md round-2 boundary-glue elimination plan.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from upscale_video_tpu.ops.common import CHAIN_TILE_H, CHAIN_TILE_W, round_up

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tail_kernel(u_hbm, rgb_hbm, w_ref, b_ref, out_ref, ubuf, rbuf, sem,
                 *, th: int, tw: int, cin: int, scale: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    win_w = tw + 8

    dma_u = pltpu.make_async_copy(
        u_hbm.at[pl.ds(i * th, th + 2), pl.ds(j * tw, win_w), :], ubuf,
        sem.at[0],
    )
    dma_r = pltpu.make_async_copy(
        rgb_hbm.at[pl.ds(i * th, th), pl.ds(j * tw, tw), :], rbuf,
        sem.at[1],
    )
    dma_u.start()
    dma_r.start()
    dma_u.wait()

    ut = ubuf[:, :, :]
    m = th * tw
    cols = []
    for dy in range(3):
        for dx in range(3):
            cols.append(ut[dy : dy + th, dx : dx + tw, :cin].reshape(m, cin))
    patches = jnp.concatenate(cols, axis=-1)

    y = jnp.dot(patches, w_ref[:, :], preferred_element_type=jnp.float32)
    y = y + b_ref[0, :].astype(jnp.float32)

    dma_r.wait()
    skip = rbuf[:, :, :].astype(jnp.float32)  # (th, tw, lanes); :3 valid

    # pixel-shuffle in POLYPHASE form: out[c, a, b] holds the (th, tw)
    # plane for output positions (s*r+a, s*x+b) of channel c.  Mosaic
    # rejects the 5D interleaving transpose ("unsupported shape cast"),
    # so the sub-pixel interleave happens as one XLA transpose outside.
    y3 = y.reshape(th, tw, -1)  # (th, tw, cout)
    for c in range(3):
        sk = skip[:, :, c : c + 1]
        for a in range(scale):
            for b in range(scale):
                k = c * scale * scale + a * scale + b
                plane = y3[:, :, k : k + 1] + sk  # (th, tw, 1)
                out_ref[c, a, b, :, :] = plane[:, :, 0].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "tile_h", "tile_w", "interpret")
)
def sr_tail_fused(
    u: jnp.ndarray,
    rgb: jnp.ndarray,
    w_hwio: jnp.ndarray,
    bias: jnp.ndarray,
    scale: int = 2,
    tile_h: int = 16,
    tile_w: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused tail for one frame.

    Args:
      u:   (H, W, Cf) body activations (float).
      rgb: (H, W, 3) the model-domain input frame (the Interp skip source).
      w_hwio: (3, 3, Cf, 3*scale^2) tail conv weights.
      bias:   (3*scale^2,) or None.

    Returns (H*scale, W*scale, 3) float32 (HWC).
    """
    hgt, wid, cin = u.shape
    kh, kw, wcin, cout = w_hwio.shape
    assert (kh, kw) == (3, 3) and wcin == cin and cout == 3 * scale * scale

    th = min(tile_h, round_up(hgt, 8))
    tw = min(tile_w, round_up(wid, 8))
    gy = -(-hgt // th)
    gx = -(-wid // tw)

    cin_p = round_up(cin, 128)
    up = jnp.pad(
        u.astype(jnp.bfloat16),
        ((1, gy * th + 1 - hgt), (1, gx * tw + 8 - 1 - wid), (0, cin_p - cin)),
    )
    rgbp = jnp.pad(
        rgb.astype(jnp.bfloat16),
        ((0, gy * th - hgt), (0, gx * tw - wid), (0, 128 - 3)),
    )
    wmat = w_hwio.reshape(9 * cin, cout).astype(jnp.bfloat16)
    b = (bias if bias is not None else jnp.zeros((cout,))).reshape(1, cout)
    b = b.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_tail_kernel, th=th, tw=tw, cin=cin, scale=scale),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((9 * cin, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, scale, scale, th, tw), lambda i, j: (0, 0, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3, scale, scale, gy * th, gx * tw), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, tw + 8, cin_p), jnp.bfloat16),
            pltpu.VMEM((th, tw, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(up, rgbp, wmat, b)

    # polyphase (c, a, b, H', W') -> HWC (s*H', s*W', c), then crop
    full = out.transpose(3, 1, 4, 2, 0).reshape(
        scale * gy * th, scale * gx * tw, 3
    )
    return full[: hgt * scale, : wid * scale, :]


def _tail_chain_kernel(w_ref, b_ref, u_hbm, rgb_hbm, out_ref, ubuf, rbuf, sem,
                       *, th: int, tw: int, cin: int, lanes: int, scale: int,
                       valid_h: int, valid_w: int, emit_u8: bool,
                       reverse_channels: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)
    win_w = tw + 16

    # haloed window straight out of the conv-chain ring layout: data region
    # starts at (th, tw); ring zeros stand in for conv SAME padding
    dma_u = pltpu.make_async_copy(
        u_hbm.at[pl.ds(th + i * th - 1, th + 2),
                 pl.ds(pl.multiple_of(tw + j * tw - 8, 8), win_w), :],
        ubuf, sem.at[0],
    )
    dma_r = pltpu.make_async_copy(
        rgb_hbm.at[pl.ds(i * th, th), pl.ds(j * tw, tw), :], rbuf,
        sem.at[1],
    )
    dma_u.start()
    dma_r.start()
    dma_u.wait()

    ut = ubuf[:, :, :]
    # grid-padding region holds stale bytes from the chain's recycled
    # buffers — mask to zero (true conv padding at frame bottom/right)
    shape3 = (th + 2, win_w, lanes)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape3, 0) + (i * th - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape3, 1) + (j * tw - 8)
    valid = jnp.logical_and(rows < valid_h, cols < valid_w)
    ut = jnp.where(valid, ut, jnp.zeros_like(ut))

    m = th * tw
    colsl = []
    for dy in range(3):
        for dx in range(3):
            colsl.append(
                ut[dy : dy + th, 7 + dx : 7 + dx + tw, :cin].reshape(m, cin)
            )
    patches = jnp.concatenate(colsl, axis=-1)

    y = jnp.dot(patches, w_ref[:, :], preferred_element_type=jnp.float32)
    y = y + b_ref[0, :].astype(jnp.float32)

    dma_r.wait()
    skip = rbuf[:, :, :3].astype(jnp.float32)  # lanes padded to 128 for DMA

    y3 = y.reshape(th, tw, -1)
    for c in range(3):
        sk = skip[:, :, c : c + 1]
        c_out = (2 - c) if reverse_channels else c
        for a in range(scale):
            for b in range(scale):
                k = c * scale * scale + a * scale + b
                plane = y3[:, :, k : k + 1] + sk  # model-domain [0,1]
                if emit_u8:
                    v = jnp.clip(jnp.round(plane * 255.0), 0.0, 255.0)
                    # Mosaic lacks a direct f32->u8 cast; go via i32
                    # (exact: v is integral in [0, 255] after round+clip)
                    out_ref[c_out, a, b, :, :] = (
                        v[:, :, 0].astype(jnp.int32).astype(out_ref.dtype)
                    )
                else:
                    out_ref[c_out, a, b, :, :] = plane[:, :, 0].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "tile_h", "tile_w", "hgt", "wid", "emit_u8",
                     "reverse_channels", "interpret"),
)
def sr_tail_fused_chain(
    arr: jnp.ndarray,
    rgb: jnp.ndarray,
    w_hwio: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    scale: int,
    hgt: int,
    wid: int,
    tile_h: int = CHAIN_TILE_H,
    tile_w: int = CHAIN_TILE_W,
    emit_u8: bool = False,
    reverse_channels: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SR tail consuming the conv-chain RING layout directly (no
    crop/re-pad between the body and the tail — the VERDICT round-1 gap).

    Args:
      arr: ring-layout body activations from ``conv3x3_chain(crop=False)``
        with ``tile_h/tile_w`` matching; data region at tile offset (1,1).
      rgb: (H, W, 3) model-domain float skip (the network input).
      w_hwio: (3, 3, Cf, 3*scale^2) tail conv weights; bias optional.
      emit_u8: fuse the frame epilogue (x255, round-half-even, clamp) and
        return uint8; with ``reverse_channels`` the BGR->RGB flip happens
        in the plane writes, so the host does ONE cheap u8 interleave and
        no separate reverse pass.

    Returns (H*scale, W*scale, 3) — uint8 when ``emit_u8`` else float32.
    """
    rows, cols, lanes = arr.shape
    th = min(tile_h, round_up(hgt, 8))
    tw = min(tile_w, round_up(wid, 8))
    # the ring array carries no metadata: verify the caller's tiles match
    # the conv3x3_chain call that produced it (a mismatch would DMA
    # misaligned windows of valid data and corrupt the output silently)
    assert lanes == 128 and rows % th == 0 and cols % tw == 0, (
        f"ring layout {arr.shape} does not match tile_h={th}, tile_w={tw} "
        f"(pass the SAME tiles as the producing conv3x3_chain call)"
    )
    gy = rows // th - 2
    gx = cols // tw - 2
    assert gy >= 1 and gx >= 1 and gy * th >= hgt and gx * tw >= wid, (
        f"ring grid {gy}x{gx} (tiles {th}x{tw}) cannot cover {hgt}x{wid}"
    )
    kh, kw, cin, cout = w_hwio.shape
    assert (kh, kw) == (3, 3) and cin <= lanes and cout == 3 * scale * scale

    rgbp = jnp.pad(
        rgb.astype(jnp.bfloat16),
        ((0, gy * th - hgt), (0, gx * tw - wid), (0, 128 - 3)),
    )  # lanes padded to the 128 tile (Mosaic DMA slice alignment)
    wmat = w_hwio.reshape(9 * cin, cout).astype(jnp.bfloat16)
    b = (bias if bias is not None else jnp.zeros((cout,))).reshape(1, cout)
    b = b.astype(jnp.float32)

    out_dtype = jnp.uint8 if emit_u8 else jnp.float32
    out = pl.pallas_call(
        functools.partial(
            _tail_chain_kernel, th=th, tw=tw, cin=cin, lanes=lanes,
            scale=scale, valid_h=hgt, valid_w=wid, emit_u8=emit_u8,
            reverse_channels=reverse_channels,
        ),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec((9 * cin, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (3, scale, scale, th, tw), lambda i, j: (0, 0, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3, scale, scale, gy * th, gx * tw), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, tw + 16, lanes), jnp.bfloat16),
            pltpu.VMEM((th, tw, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(wmat, b, arr, rgbp)

    # polyphase (c, a, b, H', W') -> HWC (s*H', s*W', c), then crop
    full = out.transpose(3, 1, 4, 2, 0).reshape(
        scale * gy * th, scale * gx * tw, 3
    )
    return full[: hgt * scale, : wid * scale, :]


def sr_tail_fused_batch(u, rgb, w_hwio, bias, scale=2, **kw):
    """(N, H, W, C) batched wrapper; interprets off-TPU (CPU tests).
    Static unroll over N (HBM-space pallas operands cannot be vmapped)."""
    kw.setdefault("interpret", jax.default_backend() != "tpu")
    return jnp.stack([
        sr_tail_fused(u[i], rgb[i], w_hwio, bias, scale, **kw)
        for i in range(u.shape[0])
    ])



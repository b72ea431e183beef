"""int8 bordered-chain conv stack — the round-3 precision experiment.

Round-3 measurements (NOTES.md) close every algorithmic lever on the
Compact conv body: Winograd is refuted on hardware, the mega-kernel by
roofline, and plain-dot re-layouts by the arrangement study — the body is
lane-fill-limited at N=64, so the one lever left is *precision*.  The
int8 probes show why this needs a kernel: ``tools/int8_bench.py``
measures XLA's int8 **conv** lowering at 48.8 ms/frame vs bf16 44.0 (no
win — XLA never engages the int8 MXU path for convolutions), while
``tools/int8_dot_probe.py`` measures XLA int8 **dots** at ~3x the bf16
rate (571 vs 190 T(FL)OP/s on a fat matmul).  The MXU's int8 rate is
real but only reachable through ``dot_general`` — i.e. through an
im2col-in-VMEM kernel, exactly the structure of the bordered chain
(``ops/conv_chain.py``).

This module is that chain with a quantized contract:

- activations live in the ring-layout HBM buffers as **int8** (symmetric,
  zero-point 0 — the ring/grid zero padding is exact), halving the
  chain's HBM traffic as a side effect;
- each layer: im2col patches (int8) @ w_q (int8) -> int32 on the MXU,
  then a f32 epilogue ``y*scale + bias -> PReLU -> *inv_out -> round ->
  clip`` and requantize to the next layer's int8;
- ``scale`` is per-output-channel (s_in * s_w), ``inv_out`` the next
  layer's 1/s_act — static quantization, calibrated offline.

Integer semantics are exact (int8 x int8 -> int32 cannot overflow at
K = 9*128 < 2^31 / 127^2); the only rounding points are the f32 epilogue
(deterministic up to FMA association — tests allow 1 bf16 ULP) and the
round-half-even requantization.

Reference parity note: the reference runs ncnn fp16 end to end
(upscale_processing.py:450-452 drives ncnn's fp16 Vulkan path); int8 is
an opt-in speed/quality trade beyond the reference's surface, gated by
the PSNR quality harness before it can ship as a default.
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


class Q8ChainLayer(NamedTuple):
    wmat: jnp.ndarray   # (9*cin, cout) int8
    scale: jnp.ndarray  # (1, cout) f32: s_in * s_w (per-channel dequant)
    bias: jnp.ndarray   # (1, cout) f32 (real-valued, applied post-dequant)
    slope: jnp.ndarray  # (1, cout) f32 PReLU slopes (or zeros)
    inv_out: jnp.ndarray  # (1, 1) f32: 1 / s_out of this layer's output
    act: int
    cin: int
    cout: int


def _q8_chain_kernel(w_ref, sc_ref, b_ref, sl_ref, io_ref, x_hbm, dst_ref,
                     out_ref, win, sem, *, th: int, tw: int, cin: int,
                     act: int, requant: bool, valid_h: int, valid_w: int):
    del dst_ref  # ring-zeroed donated buffer; never read
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
    # where conv zero padding must be at the true frame bottom/right)
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

    y = jnp.dot(patches, w_ref[:, :], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sc_ref[0, :] + b_ref[0, :]
    if act == ACT_RELU:
        y = jnp.maximum(y, 0.0)
    elif act == ACT_LEAKY:
        y = jnp.where(y >= 0, y, y * sl_ref[0, 0])
    elif act == ACT_PRELU:
        y = jnp.where(y >= 0, y, y * sl_ref[0, :])
    cout = y.shape[-1]
    if requant:
        q = jnp.clip(jnp.round(y * io_ref[0, 0]), -127.0, 127.0)
        y8 = q.astype(jnp.int8)
        if cout < LANES:
            y8 = jnp.concatenate(
                [y8, jnp.zeros((m, LANES - cout), jnp.int8)], axis=-1
            )
        out_ref[:, :, :] = y8.reshape(th, tw, LANES)
    else:
        yb = y.astype(jnp.bfloat16)
        if cout < LANES:
            yb = jnp.concatenate(
                [yb, jnp.zeros((m, LANES - cout), jnp.bfloat16)], axis=-1
            )
        out_ref[:, :, :] = yb.reshape(th, tw, LANES)


def _q8_chain_step(src, dst, layer: Q8ChainLayer, th, tw, valid_h, valid_w,
                   requant, interpret):
    gy = src.shape[0] // th - 2
    gx = src.shape[1] // tw - 2
    out_dtype = jnp.int8 if requant else jnp.bfloat16
    return pl.pallas_call(
        functools.partial(
            _q8_chain_kernel, th=th, tw=tw, cin=layer.cin, act=layer.act,
            requant=requant, valid_h=valid_h, valid_w=valid_w,
        ),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec((9 * layer.cin, layer.cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, layer.cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, layer.cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, layer.cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (th, tw, LANES), lambda i, j: (i + 1, j + 1, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(dst.shape, out_dtype),
        input_output_aliases={6: 0},
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 16, LANES), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(layer.wmat, layer.scale, layer.bias, layer.slope, layer.inv_out,
      src, dst)


@functools.partial(
    jax.jit,
    static_argnames=("acts", "tile_h", "tile_w", "interpret"),
)
def _run_q8_chain(x8, wmats, scales, biases, slopes, inv_outs, acts,
                  tile_h, tile_w, interpret):
    """``x8``: (H, W, cin0) int8, already quantized to the first layer's
    input scale.  Returns (H, W, cout_last) bf16 — the last layer departs
    the int8 domain (dequantized activation) so the consumer (SR tail /
    skip add) keeps full precision."""
    hgt, wid, _ = x8.shape
    th = min(tile_h, round_up(hgt, 8))
    tw = min(tile_w, round_up(wid, 8))
    gy = -(-hgt // th)
    gx = -(-wid // tw)
    rows, cols = (gy + 2) * th, (gx + 2) * tw

    arr = jnp.zeros((rows, cols, LANES), jnp.int8)
    arr = jax.lax.dynamic_update_slice(arr, x8, (th, tw, 0))

    spare = jnp.zeros((rows, cols, LANES), jnp.int8)
    n = len(wmats)
    for idx, (wmat, sc, b, s, io, act) in enumerate(
        zip(wmats, scales, biases, slopes, inv_outs, acts)
    ):
        cin = wmat.shape[0] // 9
        layer = Q8ChainLayer(wmat, sc, b, s, io, act, cin, wmat.shape[1])
        requant = idx < n - 1
        if not requant:
            dst = jnp.zeros((rows, cols, LANES), jnp.bfloat16)
        else:
            dst = spare
        out = _q8_chain_step(arr, dst, layer, th, tw, hgt, wid, requant,
                             interpret)
        if requant:
            spare = arr
        arr = out

    cout = wmats[-1].shape[1]
    return jax.lax.dynamic_slice(
        arr, (th, tw, 0), (hgt, wid, LANES)
    )[:, :, :cout]


def conv3x3_chain_q8(
    x8: jnp.ndarray,
    layers: Sequence[dict],
    tile_h: int = CHAIN_TILE_H,
    tile_w: int = CHAIN_TILE_W,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Run a quantized stack of SAME 3x3 convs over one int8 (H, W, C)
    image in ring-chain layout.

    ``layers``: dicts with ``wq`` ((3,3,cin,cout) int8 HWIO or pre-flattened
    (9*cin, cout)), ``scale`` (per-cout f32 dequant s_in*s_w), optional
    ``bias``/``slope`` (f32, post-dequant domain), ``inv_out`` (scalar
    1/s_act of the layer's output; ignored for the last layer, which
    returns bf16), ``act`` (conv_pallas ACT_* constants).

    ``x8`` must be lane-padded to 128 channels by the caller's embed (the
    helper pads internally if C < 128).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if x8.dtype != jnp.int8:
        raise ValueError(f"conv3x3_chain_q8 expects int8 input, got {x8.dtype}")
    if x8.shape[-1] < LANES:
        x8 = jnp.pad(x8, ((0, 0), (0, 0), (0, LANES - x8.shape[-1])))
    wmats, scales, biases, slopes, inv_outs, acts = [], [], [], [], [], []
    for l in layers:
        w = jnp.asarray(l["wq"], jnp.int8)
        if w.ndim == 4:
            kh, kw, cin, cout = w.shape
            if (kh, kw) != (3, 3) or cin > 128 or cout > 128:
                raise ValueError(f"unsupported q8 chain weight shape {w.shape}")
            w = w.reshape(9 * cin, cout)
        cout = w.shape[1]
        wmats.append(w)
        scales.append(
            jnp.asarray(l["scale"], jnp.float32).reshape(1, -1)
            * jnp.ones((1, cout), jnp.float32)
        )
        b = l.get("bias")
        biases.append(
            (jnp.asarray(b, jnp.float32) if b is not None
             else jnp.zeros((cout,), jnp.float32)).reshape(1, cout)
        )
        s = l.get("slope")
        if s is None:
            slopes.append(jnp.zeros((1, cout), jnp.float32))
        else:
            s = jnp.asarray(s, jnp.float32).reshape(1, -1)
            slopes.append(jnp.broadcast_to(s, (1, cout)).astype(jnp.float32)
                          if s.shape[1] in (1, cout) else s)
        io = l.get("inv_out", 1.0)
        inv_outs.append(jnp.asarray(io, jnp.float32).reshape(1, 1))
        acts.append(int(l.get("act", ACT_NONE)))
    return _run_q8_chain(x8, tuple(wmats), tuple(scales), tuple(biases),
                         tuple(slopes), tuple(inv_outs), tuple(acts),
                         tile_h, tile_w, interpret)


def q8_oracle(x8, layers):
    """Exact-integer XLA oracle for tests: the same math as the kernel
    (int32 conv from int8 operands, f32 epilogue, round-half-even
    requant), expressed with lax.conv — bit-true in interpret mode."""
    y8 = jnp.asarray(x8, jnp.int8)
    n = len(layers)
    out = None
    for idx, l in enumerate(layers):
        w = jnp.asarray(l["wq"], jnp.int8)
        assert w.ndim == 4
        cin = w.shape[2]
        y = jax.lax.conv_general_dilated(
            y8[None, :, :, :cin], w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )[0]
        cout = w.shape[3]
        yf = y.astype(jnp.float32) * jnp.asarray(
            l["scale"], jnp.float32).reshape(1, 1, -1) * jnp.ones((cout,))
        b = l.get("bias")
        if b is not None:
            yf = yf + jnp.asarray(b, jnp.float32).reshape(1, 1, -1)
        act = int(l.get("act", ACT_NONE))
        if act == ACT_RELU:
            yf = jnp.maximum(yf, 0.0)
        elif act == ACT_LEAKY:
            yf = jnp.where(yf >= 0, yf, yf * jnp.float32(l["slope"]))
        elif act == ACT_PRELU:
            sl = jnp.asarray(l["slope"], jnp.float32).reshape(1, 1, -1)
            yf = jnp.where(yf >= 0, yf, yf * sl)
        if idx < n - 1:
            io = jnp.asarray(l.get("inv_out", 1.0), jnp.float32)
            q = jnp.clip(jnp.round(yf * io), -127.0, 127.0)
            y8 = q.astype(jnp.int8)
            if y8.shape[-1] < LANES:
                y8 = jnp.pad(
                    y8, ((0, 0), (0, 0), (0, LANES - y8.shape[-1]))
                )
        else:
            out = yf.astype(jnp.bfloat16)
    return out

"""JAX graph executor for parsed ncnn graphs.

Replaces the ncnn C++ extractor used by the reference
(``net.create_extractor(); ex.input(...); ex.extract(...)`` at
upscale/upscale_processing.py:278-280, 450-452).  Instead of interpreting
the graph per-inference on a Vulkan queue, the **whole network is traced
once** into a single XLA program: :func:`build_forward` returns a pure
``forward(params, x)`` that can be wrapped in ``jax.jit``/``pjit`` and
fused end-to-end by the compiler (conv + bias + activation + pixel-shuffle
epilogues all land in one executable; XLA tiles the convs onto the MXU).

Conventions
-----------
- Tensors are **NHWC** (TPU-native); ncnn is CHW, so channel-axis
  attributes (Concat axis, PixelShuffle grouping) are remapped here.
- ``params`` is the pytree from :mod:`upscale_video_tpu.models.bin_loader`.
- ``compute_dtype``: ``jnp.bfloat16`` runs convs on the MXU in bf16 with
  float32 accumulation (``preferred_element_type``); the shipped zoo stores
  fp16 weights so bf16 is within the models' own storage precision.

Supported layer types cover the full reference zoo:
SRVGGNetCompact (2x/4x Compact: Input/Split/Convolution/PReLU/PixelShuffle/
Interp/BinaryOp) and RRDBNet (4x_Valar_v1: + Concat/Eltwise, 1206 layers).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import os

import jax
import jax.numpy as jnp
import numpy as np

from upscale_video_tpu.models.param_parser import NcnnGraph, NcnnLayer

# CHW axis -> NHWC axis (for Concat / Slice style attributes)
_CHW_TO_NHWC = {0: 3, 1: 1, 2: 2}


def _apply_activation(x: jnp.ndarray, act_type: int, act_params: Sequence[float]):
    """ncnn fused conv activations (Convolution attr 9 / array attr 10).

    0 none, 1 relu, 2 leaky-relu(slope), 3 clip(min,max), 4 sigmoid,
    5 mish, 6 hardswish.  4x_Valar_v1.param uses ``9=2 -23310=1,0.2``.
    """
    if act_type == 0:
        return x
    if act_type == 1:
        return jnp.maximum(x, 0)
    if act_type == 2:
        slope = jnp.asarray(act_params[0], dtype=x.dtype)
        return jnp.where(x >= 0, x, x * slope)
    if act_type == 3:
        return jnp.clip(x, act_params[0], act_params[1])
    if act_type == 4:
        return jax.nn.sigmoid(x)
    if act_type == 5:
        return x * jnp.tanh(jax.nn.softplus(x))
    if act_type == 6:
        lo, hi = act_params[0], act_params[1]
        return x * jnp.clip(x * lo + hi, 0.0, 1.0)
    raise NotImplementedError(f"activation type {act_type}")


def _op_convolution(layer: NcnnLayer, inputs, p, compute_dtype):
    (x,) = inputs
    # In f32 quality mode, force true-f32 MXU passes; in bf16 perf mode the
    # default single-pass bf16 MXU path is what we want.
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    w = p["weight"].astype(compute_dtype)
    kw = layer.attr_i(1)
    kh = layer.attr_i(11, kw)
    sw = layer.attr_i(3, 1)
    sh = layer.attr_i(13, sw)
    dw = layer.attr_i(2, 1)
    dh = layer.attr_i(12, dw)
    pad_l = layer.attr_i(4, 0)
    pad_t = layer.attr_i(14, pad_l)
    pad_r = layer.attr_i(15, pad_l)
    pad_b = layer.attr_i(16, pad_t)
    if pad_l == -233:  # ncnn "SAME_UPPER" auto-pad
        padding = "SAME"
    else:
        padding = [(pad_t, pad_b), (pad_l, pad_r)]
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w,
        window_strides=(sh, sw),
        padding=padding,
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    y = _apply_activation(y, layer.attr_i(9, 0), layer.attr(10, []))
    return y.astype(compute_dtype)


def _op_convolution_depthwise(layer: NcnnLayer, inputs, p, compute_dtype):
    """ncnn ConvolutionDepthWise with group == channels (true depthwise;
    common in community SRVGG/mobile variants).  Grouped variants with
    1 < group < channels fall back to a split/concat composition."""
    (x,) = inputs
    group = int(p.get("group", layer.attr_i(7, 1)))
    out_ch = layer.attr_i(0)
    kw = layer.attr_i(1)
    kh = layer.attr_i(11, kw)
    sw = layer.attr_i(3, 1)
    sh = layer.attr_i(13, sw)
    dw = layer.attr_i(2, 1)
    dh = layer.attr_i(12, dw)
    pad_l = layer.attr_i(4, 0)
    pad_t = layer.attr_i(14, pad_l)
    pad_r = layer.attr_i(15, pad_l)
    pad_b = layer.attr_i(16, pad_t)
    if pad_l == -233:  # ncnn "SAME_UPPER" auto-pad, as in _op_convolution
        padding = "SAME"
    else:
        padding = [(pad_t, pad_b), (pad_l, pad_r)]
    cin = x.shape[-1]
    flat = p["weight"]
    # ncnn stores group blocks of (out/g, in/g, kh, kw)
    w = jnp.asarray(flat, compute_dtype).reshape(
        group, out_ch // group, cin // group, kh, kw
    )
    # HWIO with feature groups: (kh, kw, cin/g, out)
    w = jnp.transpose(w, (3, 4, 2, 0, 1)).reshape(kh, kw, cin // group, out_ch)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w,
        window_strides=(sh, sw),
        padding=padding,
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=group,
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + jnp.asarray(p["bias"], jnp.float32)
    y = _apply_activation(y, layer.attr_i(9, 0), layer.attr(10, []))
    return y.astype(compute_dtype)


def _op_prelu(layer: NcnnLayer, inputs, p, compute_dtype):
    (x,) = inputs
    slope = p["slope"].astype(x.dtype)
    return jnp.where(x >= 0, x, x * slope)


def _op_pixelshuffle(layer: NcnnLayer, inputs, p, compute_dtype):
    """ncnn PixelShuffle (attr 0 = upscale_factor r, attr 1 = mode).

    Mode 0 (default, PyTorch ``pixel_shuffle``): output channel ``c`` at
    pixel (y*r+i, x*r+j) reads input channel ``c*r*r + i*r + j``.  Used as
    ``DepthToSpace_35 0=2`` in 2x_Compact_Pretrain.param.
    """
    (x,) = inputs
    r = layer.attr_i(0, 1)
    if r == 1:
        return x
    mode = layer.attr_i(1, 0)
    n, h, w, c_in = x.shape
    c_out = c_in // (r * r)
    if mode == 0:
        x = x.reshape(n, h, w, c_out, r, r)  # (..., c, i, j)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, c
    else:  # mode 1: channel = (i*r + j)*c_out + c
        x = x.reshape(n, h, w, r, r, c_out)  # (..., i, j, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, c_out)


def _op_interp(layer: NcnnLayer, inputs, p, compute_dtype):
    """ncnn Interp: attr 0 resize_type (1 nearest, 2 bilinear, 3 bicubic),
    attrs 1/2 height/width scale, attrs 3/4 fixed output size.

    The zoo uses nearest only (``Resize_36 0=1 1=2.0 2=2.0``), whose ncnn
    semantics are floor-mapping ``src = floor(dst / scale)`` — an exact
    ``repeat`` for integer scales.  Bilinear matches half-pixel centers
    (align_corners=false), delegated to ``jax.image.resize``.
    """
    (x,) = inputs
    rtype = layer.attr_i(0, 0)
    hs = layer.attr_f(1, 1.0)
    ws = layer.attr_f(2, 1.0)
    out_h = layer.attr_i(3, 0) or int(x.shape[1] * hs)
    out_w = layer.attr_i(4, 0) or int(x.shape[2] * ws)
    n, h, w, c = x.shape
    if (out_h, out_w) == (h, w):
        return x
    if rtype in (0, 1):  # nearest
        if out_h % h == 0 and out_w % w == 0:
            x = jnp.repeat(x, out_h // h, axis=1)
            x = jnp.repeat(x, out_w // w, axis=2)
            return x
        ys = jnp.clip((jnp.arange(out_h) * h) // out_h, 0, h - 1)
        xs = jnp.clip((jnp.arange(out_w) * w) // out_w, 0, w - 1)
        return x[:, ys][:, :, xs]
    if rtype == 2:
        return jax.image.resize(x, (n, out_h, out_w, c), method="linear")
    if rtype == 3:
        return jax.image.resize(x, (n, out_h, out_w, c), method="cubic")
    raise NotImplementedError(f"Interp resize_type {rtype}")


_BINARY_OPS = {
    0: jnp.add,
    1: jnp.subtract,
    2: jnp.multiply,
    3: jnp.divide,
    4: jnp.maximum,
    5: jnp.minimum,
    6: jnp.power,
    7: lambda a, b: b - a,
    8: lambda a, b: b / a,
}


def _op_binaryop(layer: NcnnLayer, inputs, p, compute_dtype):
    op = _BINARY_OPS[layer.attr_i(0, 0)]
    if layer.attr_i(1, 0):  # with_scalar
        return op(inputs[0], jnp.asarray(layer.attr_f(2), dtype=inputs[0].dtype))
    a, b = inputs
    return op(a, b)


def _op_eltwise(layer: NcnnLayer, inputs, p, compute_dtype):
    """ncnn Eltwise: 0=op (0 prod, 1 sum, 2 max), array attr 1 = coeffs.

    4x_Valar_v1 fuses its ESRGAN residual scaling here:
    ``Eltwise 0=1 -23301=2,0.2,1.0`` computes ``0.2*a + 1.0*b``.
    """
    op = layer.attr_i(0, 0)
    coeffs = layer.attr(1, [])
    if op == 0:
        out = inputs[0]
        for t in inputs[1:]:
            out = out * t
        return out
    if op == 1:
        if coeffs:
            out = inputs[0] * jnp.asarray(coeffs[0], dtype=inputs[0].dtype)
            for t, c in zip(inputs[1:], coeffs[1:]):
                out = out + t * jnp.asarray(c, dtype=t.dtype)
            return out
        out = inputs[0]
        for t in inputs[1:]:
            out = out + t
        return out
    if op == 2:
        out = inputs[0]
        for t in inputs[1:]:
            out = jnp.maximum(out, t)
        return out
    raise NotImplementedError(f"Eltwise op {op}")


def _op_concat(layer: NcnnLayer, inputs, p, compute_dtype):
    axis = _CHW_TO_NHWC[layer.attr_i(0, 0)]
    return jnp.concatenate(inputs, axis=axis)


def _op_split(layer: NcnnLayer, inputs, p, compute_dtype):
    return [inputs[0]] * len(layer.outputs)


def _op_identity(layer: NcnnLayer, inputs, p, compute_dtype):
    return inputs[0]


def _op_relu(layer: NcnnLayer, inputs, p, compute_dtype):
    slope = layer.attr_f(0, 0.0)
    x = inputs[0]
    if slope:
        return jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))
    return jnp.maximum(x, 0)


def _op_clip(layer: NcnnLayer, inputs, p, compute_dtype):
    return jnp.clip(inputs[0], layer.attr_f(0, -3.4e38), layer.attr_f(1, 3.4e38))


def _op_sigmoid(layer: NcnnLayer, inputs, p, compute_dtype):
    return jax.nn.sigmoid(inputs[0])


def _op_dropout(layer: NcnnLayer, inputs, p, compute_dtype):
    scale = layer.attr_f(0, 1.0)
    return inputs[0] if scale == 1.0 else inputs[0] * scale


def _op_reorg(layer: NcnnLayer, inputs, p, compute_dtype):
    """ncnn Reorg (attr 0 = stride r): space-to-depth, the inverse of
    :func:`_op_pixelshuffle` mode 0 — input channel ``c`` at pixel
    (y*r+i, x*r+j) lands in output channel ``c*r*r + i*r + j`` (torch
    ``pixel_unshuffle`` semantics; used by the x2/x1 RRDBNet checkpoint
    variants imported via models/torch_import.py, whose forward unshuffles
    the input before conv_first)."""
    (x,) = inputs
    r = layer.attr_i(0, 1)
    if r == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)  # n, h, i, w, j, c
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, i, j
    return x.reshape(n, h // r, w // r, c * r * r)


OP_REGISTRY: Dict[str, Callable] = {
    "Input": _op_identity,
    "Split": _op_split,
    "Convolution": _op_convolution,
    "ConvolutionDepthWise": _op_convolution_depthwise,
    "PReLU": _op_prelu,
    "PixelShuffle": _op_pixelshuffle,
    "Interp": _op_interp,
    "BinaryOp": _op_binaryop,
    "Eltwise": _op_eltwise,
    "Concat": _op_concat,
    "ReLU": _op_relu,
    "Clip": _op_clip,
    "Sigmoid": _op_sigmoid,
    "Dropout": _op_dropout,
    "Noop": _op_identity,
    "Reorg": _op_reorg,
}


def _infer_blob_channels(graph: NcnnGraph) -> Dict[str, int]:
    """Static channel-count inference over the graph (blob -> C).

    ncnn blobs carry no shape metadata; channel widths are derivable from
    conv attrs and propagation rules.  Blobs whose width cannot be derived
    are absent from the result (callers must treat missing as unknown).
    Used by the dense-scatter planner to resolve Concat part offsets.
    """
    ch: Dict[str, int] = {b: 3 for b in graph.input_blobs}
    passthrough = {
        "Split", "Noop", "Dropout", "ReLU", "Clip", "Sigmoid", "PReLU",
        "Interp", "Identity",
    }
    for layer in graph.layers:
        if layer.type in ("Convolution", "ConvolutionDepthWise", "Deconvolution"):
            ch[layer.outputs[0]] = layer.attr_i(0)
        elif layer.type in passthrough:
            c = ch.get(layer.inputs[0]) if layer.inputs else None
            if c is not None:
                for b in layer.outputs:
                    ch[b] = c
        elif layer.type in ("BinaryOp", "Eltwise"):
            known = [ch[b] for b in layer.inputs if b in ch]
            if known:
                ch[layer.outputs[0]] = max(known)
        elif layer.type == "Concat":
            if layer.attr_i(0, 0) == 0:  # CHW channel axis
                parts = [ch.get(b) for b in layer.inputs]
                if all(c is not None for c in parts):
                    ch[layer.outputs[0]] = sum(parts)
            else:
                c = ch.get(layer.inputs[0])
                if c is not None:
                    ch[layer.outputs[0]] = c
        elif layer.type == "PixelShuffle":
            c = ch.get(layer.inputs[0])
            r = layer.attr_i(0, 1)
            if c is not None and r and c % (r * r) == 0:
                ch[layer.outputs[0]] = c // (r * r)
        elif layer.type == "Reorg":
            c = ch.get(layer.inputs[0])
            r = layer.attr_i(0, 1)
            if c is not None:
                ch[layer.outputs[0]] = c * r * r
    return ch


def _dense_conv_class(layer: NcnnLayer) -> str | None:
    """Classify a conv for the dense-scatter rewrite.

    Returns ``"3x3"`` for SAME 3x3 stride-1 dilation-1 convs, ``"1x1"``
    for pad-0 1x1 stride-1 convs (promotable into a 3x3 group by zero
    embedding), else None.  Activation must be none/relu/leaky so it can
    be deferred to the accumulation site.
    """
    if layer.type != "Convolution" or len(layer.inputs) != 1:
        return None
    if layer.attr_i(9, 0) not in (0, 1, 2):
        return None
    kw = layer.attr_i(1)
    kh = layer.attr_i(11, kw)
    sw, sh = layer.attr_i(3, 1), layer.attr_i(13, layer.attr_i(3, 1))
    dw, dh = layer.attr_i(2, 1), layer.attr_i(12, layer.attr_i(2, 1))
    pads = {layer.attr_i(4, 0), layer.attr_i(14, layer.attr_i(4, 0)),
            layer.attr_i(15, layer.attr_i(4, 0)),
            layer.attr_i(16, layer.attr_i(4, 0))}
    if (sw, sh) != (1, 1) or (dw, dh) != (1, 1):
        return None
    if (kw, kh) == (3, 3) and pads == {1}:
        return "3x3"
    if (kw, kh) == (1, 1) and pads == {0}:
        return "1x1"
    return None


def _plan_dense_scatter(graph: NcnnGraph, consumers: Dict[str, List[int]],
                        exclude: Optional[set] = None):
    """Plan the dense-block *scatter* rewrite for RRDB-style graphs.

    The reference's real-life model (models/4x_Valar_v1.param, ESRGAN
    dense blocks) is a chain of convs over growing Concats whose output
    widths are 32 — a 25% fill of the MXU's 128 output lanes, the single
    biggest perf sink in the zoo (NOTES.md: 762 ms per 480px tile).

    Rewrite: ``conv(concat(x0..xk), W)`` is linear in channels, so it
    decomposes into per-source pieces ``sum_j conv(xj, W[:, :, off_j:, :])``.
    *Scatter form* computes, at the moment each source ``xj`` is produced,
    its contribution to EVERY downstream conv in ONE conv with the weight
    slices concatenated along the output axis (N = 96..224 instead of 32),
    then accumulates per target and applies bias+activation at the
    original layer position.  Per RDB this cuts padded MXU passes ~2.2x;
    direct convs reading the same source (Conv_1-style) and promotable
    1x1s (Conv_6-style, zero-embedded to 3x3) ride the same pass for free.

    Returns ``(piece_groups, dense_targets, dead_layers)``:

    - piece_groups: root blob -> list of target dicts (conv name, input
      slice, output width, 1x1 promotion flag), one fused conv per root;
    - dense_targets: conv layer name -> accumulation plan;
    - dead_layers: Concat layers whose output is no longer materialized.
    """
    producers: Dict[str, int] = {}
    for i, layer in enumerate(graph.layers):
        for b in layer.outputs:
            producers[b] = i

    def root_of(blob: str) -> str:
        seen = set()
        while blob not in seen:
            seen.add(blob)
            pi = producers.get(blob)
            if pi is None:
                return blob
            layer = graph.layers[pi]
            if layer.type in ("Split", "Noop") and layer.inputs:
                blob = layer.inputs[0]
            else:
                return blob
        return blob

    channels = _infer_blob_channels(graph)

    # pass 1: concat-fed convs decompose into per-source pieces
    piece_groups: Dict[str, List[dict]] = {}
    dense_targets: Dict[str, dict] = {}
    concat_of: Dict[str, str] = {}  # dense conv -> concat layer name
    exclude = exclude or set()
    for idx, layer in enumerate(graph.layers):
        if layer.name in exclude:
            continue  # claimed by the fused RDB kernel
        if _dense_conv_class(layer) != "3x3":
            continue
        src = layer.inputs[0]
        pi = producers.get(src)
        if pi is None:
            continue
        concat = graph.layers[pi]
        if concat.type != "Concat" or concat.attr_i(0, 0) != 0:
            continue
        if len(consumers.get(src, [])) != 1:
            continue
        widths = [channels.get(b) for b in concat.inputs]
        if any(w is None for w in widths):
            continue
        pieces, off = [], 0
        for part, w in zip(concat.inputs, widths):
            root = root_of(part)
            if producers.get(root, -1) >= idx and root not in graph.input_blobs:
                break  # source not available before the conv (shouldn't happen)
            pieces.append((root, off, w))
            off += w
        else:
            n_out = layer.attr_i(0)
            for root, in_off, w in pieces:
                piece_groups.setdefault(root, []).append({
                    "conv": layer.name, "in_off": in_off, "width": w,
                    "n_out": n_out, "promote1x1": False,
                })
            dense_targets[layer.name] = {
                "n_pieces": len(pieces), "act": layer.attr_i(9, 0),
                "act_params": layer.attr(10, [0.0]), "out": layer.outputs[0],
            }
            concat_of[layer.name] = concat.name

    if not piece_groups:
        return {}, {}, set()

    # pass 2: direct convs (and promotable 1x1s) whose input resolves to a
    # root that already has a scatter group join that group's fused pass
    for layer in graph.layers:
        if layer.name in exclude:
            continue
        cls = _dense_conv_class(layer)
        if cls is None or layer.name in dense_targets:
            continue
        root = root_of(layer.inputs[0])
        group = piece_groups.get(root)
        if not group or not any(t["in_off"] is not None for t in group):
            continue  # only join groups anchored by concat-derived pieces
        width = channels.get(root)
        if width is None:
            continue
        group.append({
            "conv": layer.name, "in_off": None, "width": width,
            "n_out": layer.attr_i(0), "promote1x1": cls == "1x1",
        })
        dense_targets[layer.name] = {
            "n_pieces": 1, "act": layer.attr_i(9, 0),
            "act_params": layer.attr(10, [0.0]), "out": layer.outputs[0],
        }

    # only worthwhile when pieces actually share passes
    total_pieces = sum(len(g) for g in piece_groups.values())
    if total_pieces <= len(piece_groups):
        return {}, {}, set()

    # Concats whose only consumer was rewritten are never materialized
    dead_layers = {
        concat_of[name] for name in concat_of if name in dense_targets
    }
    return piece_groups, dense_targets, dead_layers


def _plan_rdb_blocks(graph: NcnnGraph, consumers: Dict[str, List[int]]):
    """Match ESRGAN residual-dense blocks for the fused RDB kernel
    (ops/rdb_pallas.py) — the Valar variant exactly as laid out in
    models/4x_Valar_v1.param:4-21 (and make_rrdb_graph):

        c1 = lrelu(conv3x3(x))                          Conv_1
        c2 = lrelu(conv3x3(cat(x,c1))) + conv1x1(x)     Conv_4/Conv_6/Add_7
        c3 = lrelu(conv3x3(cat(x,c1,c2)))               Conv_9
        c4 = lrelu(conv3x3(cat(x,c1,c2,c3))) + c2       Conv_12/Add_14
        c5 = conv3x3(cat(x,c1,c2,c3,c4))                Conv_16
        out = 0.2*c5 + x                                Eltwise Add_19

    Returns (blocks, absorbed_layers): per block a dict with the root
    blob, output blob, the six conv layer names, the leaky slope, and the
    trigger (Eltwise) layer name; absorbed_layers = every matched layer
    name except the Splits (which stay as aliases).
    """
    producers: Dict[str, int] = {}
    by_name: Dict[str, "NcnnLayer"] = {}
    for i, layer in enumerate(graph.layers):
        by_name[layer.name] = layer
        for b in layer.outputs:
            producers[b] = i

    def root_of(blob: str) -> str:
        seen = set()
        while blob not in seen:
            seen.add(blob)
            pi = producers.get(blob)
            if pi is None:
                return blob
            layer = graph.layers[pi]
            if layer.type in ("Split", "Noop") and layer.inputs:
                blob = layer.inputs[0]
            else:
                return blob
        return blob

    def producer(blob):
        pi = producers.get(root_of(blob))
        return graph.layers[pi] if pi is not None else None

    def is_conv(layer, k, n_out, leaky):
        if layer is None or layer.type != "Convolution":
            return False
        if layer.attr_i(0) != n_out or layer.attr_i(1) != k:
            return False
        # geometry must be the SAME/stride-1/dilation-1 class rdb_apply
        # computes: a strided / VALID / dilated conv that happens to match
        # the block skeleton must fall back to the exact per-layer path
        # (same guard class as _dense_conv_class for the scatter rewrite)
        if _dense_conv_class(layer) != ("3x3" if k == 3 else "1x1"):
            return False
        act = layer.attr_i(9, 0)
        return act == 2 if leaky else act == 0

    blocks = []
    absorbed: set = set()
    for layer in graph.layers:
        # anchor: the 0.2*body + skip residual
        if layer.type != "Eltwise" or len(layer.inputs) != 2:
            continue
        coeffs = layer.attr(1, None)
        if not coeffs or list(coeffs)[:2] != [0.2, 1.0]:
            continue
        c5_conv = producer(layer.inputs[0])
        x_root = root_of(layer.inputs[1])
        if not is_conv(c5_conv, 3, 64, leaky=False):
            continue
        cat5 = producer(c5_conv.inputs[0])
        if cat5 is None or cat5.type != "Concat" or len(cat5.inputs) != 5:
            continue
        roots = [root_of(b) for b in cat5.inputs]
        if roots[0] != x_root:
            continue
        # c1
        c1_conv = producer(roots[1])
        if not (is_conv(c1_conv, 3, 32, leaky=True)
                and root_of(c1_conv.inputs[0]) == x_root):
            continue
        # c2 = add(conv3x3(cat(x,c1)), conv1x1(x))
        add7 = producer(roots[2])
        if add7 is None or add7.type != "BinaryOp" or add7.attr_i(0, 0) != 0:
            continue
        c4a, c6a = producer(add7.inputs[0]), producer(add7.inputs[1])
        if is_conv(c6a, 3, 32, leaky=True):  # argument order can flip
            c4a, c6a = c6a, c4a
        if not (is_conv(c4a, 3, 32, leaky=True)
                and is_conv(c6a, 1, 32, leaky=False)
                and root_of(c6a.inputs[0]) == x_root):
            continue
        cat2 = producer(c4a.inputs[0])
        if (cat2 is None or cat2.type != "Concat" or len(cat2.inputs) != 2
                or [root_of(b) for b in cat2.inputs]
                != [x_root, roots[1]]):
            continue
        # c3
        c9 = producer(roots[3])
        if not is_conv(c9, 3, 32, leaky=True):
            continue
        cat3 = producer(c9.inputs[0])
        if (cat3 is None or cat3.type != "Concat"
                or [root_of(b) for b in cat3.inputs] != roots[:3]):
            continue
        # c4 = add(conv3x3(cat(x,c1,c2,c3)), c2)
        add14 = producer(roots[4])
        if (add14 is None or add14.type != "BinaryOp"
                or add14.attr_i(0, 0) != 0):
            continue
        c12, c2b = producer(add14.inputs[0]), add14.inputs[1]
        if not is_conv(c12, 3, 32, leaky=True):
            c12, c2b = producer(add14.inputs[1]), add14.inputs[0]
        if not (is_conv(c12, 3, 32, leaky=True)
                and root_of(c2b) == roots[2]):
            continue
        cat4 = producer(c12.inputs[0])
        if (cat4 is None or cat4.type != "Concat"
                or [root_of(b) for b in cat4.inputs] != roots[:4]):
            continue
        block_names = {
            c1_conv.name, c4a.name, c6a.name, c9.name, c12.name,
            c5_conv.name, add7.name, add14.name, cat2.name, cat3.name,
            cat4.name, cat5.name, layer.name,
        }
        # The fused kernel never materializes the block's interior blobs,
        # so (a) Split/Noop aliases of interior blobs (the real param's
        # ``splitncnn_*`` bookkeeping, 4x_Valar_v1.param:6-19 — absent
        # from the synthetic graphs) must be absorbed with the block, and
        # (b) if ANY interior blob leaks to a consumer outside the block
        # the match must be abandoned, else that consumer would trace
        # against a missing blob.
        interior: set = set()
        for nm in block_names - {layer.name}:
            interior |= set(by_name[nm].outputs)
        splits: set = set()
        changed = True
        while changed:
            changed = False
            for l2 in graph.layers:
                if (l2.type in ("Split", "Noop") and l2.name not in splits
                        and any(b in interior for b in l2.inputs)):
                    splits.add(l2.name)
                    interior |= set(l2.outputs)
                    changed = True
        leaked = any(
            graph.layers[ci].name not in block_names
            and graph.layers[ci].name not in splits
            for b in interior
            for ci in consumers.get(b, [])
        )
        if leaked:
            continue
        slope = float(c1_conv.attr(10, [0.2])[0])
        blocks.append({
            "root": x_root,
            "out": layer.outputs[0],
            "convs": [c1_conv.name, c4a.name, c9.name, c12.name,
                      c5_conv.name],
            "skip_conv": c6a.name,
            "slope": slope,
            "trigger": layer.name,
        })
        absorbed |= block_names | splits
    return blocks, absorbed


def _pallas_fusable(layer: NcnnLayer) -> bool:
    """3x3 / stride 1 / dilation 1 / pad 1 convs with channel counts that
    map well onto MXU lanes qualify for the Pallas fused kernel
    (ops/conv_pallas.py).  Skinny-channel convs (the 3-channel input conv,
    the 12-channel pre-shuffle conv) are <1% of model FLOPs and their
    lane-padding makes the Pallas path a loss — they stay on XLA."""
    from upscale_video_tpu.models.bin_loader import _infer_conv_in_channels

    kw = layer.attr_i(1)
    kh = layer.attr_i(11, kw)
    sw = layer.attr_i(3, 1)
    sh = layer.attr_i(13, sw)
    dw = layer.attr_i(2, 1)
    dh = layer.attr_i(12, dw)
    pads = {layer.attr_i(4, 0), layer.attr_i(14, layer.attr_i(4, 0)),
            layer.attr_i(15, layer.attr_i(4, 0)), layer.attr_i(16, layer.attr_i(4, 0))}
    cout = layer.attr_i(0)
    cin = _infer_conv_in_channels(layer) or 0
    # cin >= 32: skinny-input convs explode in lane padding (XLA handles
    # them).  Skinny OUTPUTS are fine — and critically, routing the
    # 64->12 pre-shuffle conv through Pallas avoids a pathological XLA
    # layout interaction where an XLA conv consuming a custom-call output
    # runs ~100x slow (measured 1.9 s for a 7 GFLOP conv on v5e).
    return (kw, kh) == (3, 3) and (sw, sh) == (1, 1) and (dw, dh) == (1, 1) \
        and pads == {1} and layer.attr_i(9, 0) in (0, 1, 2) \
        and cin >= 32 and cout >= 8


def _chain_eligible(layer: NcnnLayer) -> bool:
    """Convs the bordered-chain kernel (ops/conv_chain.py) can take as a
    chain member: SAME 3x3 stride-1 dilation-1 with both channel counts
    inside one 128-lane tile.  Unlike :func:`_pallas_fusable` there is no
    minimum cin — the chain pays its lane padding ONCE for the whole stack,
    so even the 3-channel input conv rides along (skipping it would insert
    an XLA->custom-call layout boundary instead)."""
    from upscale_video_tpu.models.bin_loader import _infer_conv_in_channels

    kw = layer.attr_i(1)
    kh = layer.attr_i(11, kw)
    sw = layer.attr_i(3, 1)
    sh = layer.attr_i(13, sw)
    dw = layer.attr_i(2, 1)
    dh = layer.attr_i(12, dw)
    pads = {layer.attr_i(4, 0), layer.attr_i(14, layer.attr_i(4, 0)),
            layer.attr_i(15, layer.attr_i(4, 0)), layer.attr_i(16, layer.attr_i(4, 0))}
    cout = layer.attr_i(0)
    cin = _infer_conv_in_channels(layer) or 0
    return (kw, kh) == (3, 3) and (sw, sh) == (1, 1) and (dw, dh) == (1, 1) \
        and pads == {1} and layer.attr_i(9, 0) in (0, 1, 2) \
        and 0 < cin <= 128 and 0 < cout <= 128


def _plan_pallas_fusion(
    graph: NcnnGraph, exclude=frozenset(),
    consumers: Optional[Dict[str, List[int]]] = None,
) -> tuple[dict, set]:
    """Map conv layer name -> fused activation plan, and the set of layer
    names absorbed into a fused kernel (PReLUs, the SRVGG tail's
    PixelShuffle/Interp/Add when the whole tail fuses, and the members of
    bordered-chain runs beyond the first).  ``exclude``: convs already
    claimed by the dense-scatter rewrite.  ``consumers``: the caller's
    blob->consumer-indices map (rebuilt here only for standalone use)."""
    if consumers is None:
        consumers = {}
        for idx, layer in enumerate(graph.layers):
            for b in layer.inputs:
                consumers.setdefault(b, []).append(idx)

    plans: Dict[str, Dict[str, Any]] = {}
    absorbed: set = set()
    for idx, layer in enumerate(graph.layers):
        if layer.type != "Convolution" or layer.name in exclude:
            continue
        if not (_pallas_fusable(layer) or _chain_eligible(layer)):
            continue
        if _pallas_fusable(layer):
            tail = _match_srvgg_tail(graph, consumers, idx)
            if tail is not None:
                plans[layer.name] = tail
                absorbed.update(tail["absorbed"])
                continue
        plan = {"kind": "conv", "act": layer.attr_i(9, 0), "prelu": None,
                "out": layer.outputs[0], "solo": _pallas_fusable(layer),
                "chainable": _chain_eligible(layer)}
        cons = consumers.get(layer.outputs[0], [])
        if (
            plan["act"] == 0
            and len(cons) == 1
            and graph.layers[cons[0]].type == "PReLU"
        ):
            prelu = graph.layers[cons[0]]
            plan["prelu"] = prelu.name
            plan["out"] = prelu.outputs[0]
            absorbed.add(prelu.name)
        plans[layer.name] = plan

    _assemble_chains(graph, consumers, plans, absorbed)

    # drop per-layer plans for convs that are neither solo-profitable nor
    # part of a chain (e.g. a lone skinny conv): XLA handles those
    for name in [n for n, p in plans.items()
                 if p["kind"] == "conv" and not p["solo"]]:
        prelu = plans[name]["prelu"]
        if prelu:
            absorbed.discard(prelu)
        del plans[name]
    return plans, absorbed


def _assemble_chains(graph: NcnnGraph, consumers, plans, absorbed) -> None:
    """Upgrade maximal runs of >=2 linearly-linked chainable convs into one
    bordered-chain plan (ops/conv_chain.py): the whole run executes as L
    back-to-back pallas_calls with ONE embed before and ONE crop after,
    eliminating the per-layer pad/crop glue that made the per-layer kernels
    a model-level loss (NOTES.md profiler attribution)."""
    idx_of = {l.name: i for i, l in enumerate(graph.layers)}
    in_chain: set = set()
    for layer in graph.layers:
        name = layer.name
        if name in in_chain or name not in plans:
            continue
        if plans[name]["kind"] != "conv" or not plans[name]["chainable"]:
            continue
        seq = [layer]
        while True:
            last_plan = plans[seq[-1].name]
            cons = consumers.get(last_plan["out"], [])
            if len(cons) != 1:
                break
            nxt = graph.layers[cons[0]]
            if (
                nxt.type != "Convolution"
                or nxt.name not in plans
                or plans[nxt.name]["kind"] != "conv"
                or not plans[nxt.name]["chainable"]
                or nxt.name in in_chain
            ):
                break
            seq.append(nxt)
        if len(seq) < 2:
            continue
        items = []
        for l in seq:
            p = plans[l.name]
            items.append({
                "name": l.name,
                "prelu": p["prelu"],
                "act": p["act"],
                "slope_attr": l.attr(10, [0.0]),
            })
        chain_plan = {
            "kind": "chain",
            "items": items,
            "out": plans[seq[-1].name]["out"],
        }
        for l in seq[1:]:
            del plans[l.name]
            absorbed.add(l.name)
        plans[seq[0].name] = chain_plan
        in_chain.update(l.name for l in seq)

        # fuse a directly-following SRVGG tail: the tail kernel reads the
        # chain's ring layout straight from HBM (no crop/re-pad between
        # body and tail — the round-1 boundary-glue gap, NOTES.md item 1)
        cons = consumers.get(chain_plan["out"], [])
        if len(cons) == 1:
            nxt = graph.layers[cons[0]]
            tail = plans.get(nxt.name)
            if (
                tail is not None
                and tail.get("kind") == "tail"
                and not consumers.get(tail["out"])  # tail IS the output
            ):
                chain_plan["tail"] = dict(tail, conv=nxt.name)
                chain_plan["out"] = tail["out"]
                del plans[nxt.name]
                absorbed.add(nxt.name)


def _match_srvgg_tail(graph: NcnnGraph, consumers, conv_idx: int):
    """Detect the SRVGG tail ``conv -> PixelShuffle(s) -> Add(<- Interp(s)
    of the network input)`` (reference graph tail, 2x_Compact_Pretrain.param
    layers Conv_34/DepthToSpace_35/Resize_36/Add_37) for the fused Pallas
    tail kernel.  Returns a plan dict or None."""
    conv = graph.layers[conv_idx]
    if conv.attr_i(9, 0) != 0:
        return None
    cons = consumers.get(conv.outputs[0], [])
    if len(cons) != 1 or graph.layers[cons[0]].type != "PixelShuffle":
        return None
    shuffle = graph.layers[cons[0]]
    s = shuffle.attr_i(0, 1)
    if s < 2 or shuffle.attr_i(1, 0) != 0 or conv.attr_i(0) != 3 * s * s:
        return None
    sh_cons = consumers.get(shuffle.outputs[0], [])
    if len(sh_cons) != 1 or graph.layers[sh_cons[0]].type != "BinaryOp":
        return None
    add = graph.layers[sh_cons[0]]
    if add.attr_i(0, 0) != 0 or add.attr_i(1, 0) != 0 or len(add.inputs) != 2:
        return None
    other = [b for b in add.inputs if b != shuffle.outputs[0]][0]
    # every absorbed intermediate must be single-consumer: if the upsampled
    # skip (or any absorbed blob) feeds another layer, fusing the tail would
    # leave that consumer's input blob uncomputed (KeyError in forward)
    if len(consumers.get(other, [])) != 1:
        return None
    interp = next(
        (l for l in graph.layers if other in l.outputs and l.type == "Interp"),
        None,
    )
    if interp is None or interp.attr_i(0, 0) not in (0, 1):
        return None
    if interp.attr_f(1, 1.0) != float(s) or interp.attr_f(2, 1.0) != float(s):
        return None
    # the skip source must be the network input (directly or via Split)
    skip_src = interp.inputs[0]
    producer = next((l for l in graph.layers if skip_src in l.outputs), None)
    if producer is None or producer.type not in ("Input", "Split"):
        return None
    if producer.type == "Split" and producer.inputs[0] != graph.input_blobs[0]:
        return None
    return {
        "kind": "tail",
        "scale": s,
        "skip_blob": skip_src,
        "out": add.outputs[0],
        "absorbed": {shuffle.name, interp.name, add.name},
    }


def probe_srvgg_tail(graph: NcnnGraph) -> Optional[int]:
    """Cheap check whether ``graph`` ends in the SRVGG shuffle tail (the
    planar-contract precondition): returns the shuffle factor or None.

    Runs only the consumers-map + tail pattern scan — callers asking "is
    the planar contract available?" (pipeline/chain.py:planar_scale) must
    not pay for a full ``build_forward`` planning pass (dense-scatter
    analysis over Valar's 2127 blobs) just to learn the answer is no.
    """
    outputs = graph.output_blobs
    if len(graph.input_blobs) != 1 or len(outputs) != 1:
        return None
    consumers: Dict[str, List[int]] = {}
    for idx, layer in enumerate(graph.layers):
        for b in layer.inputs:
            consumers.setdefault(b, []).append(idx)
    for idx, layer in enumerate(graph.layers):
        if layer.type != "Convolution":
            continue
        t = _match_srvgg_tail(graph, consumers, idx)
        if t is not None and t["out"] == outputs[0] \
                and not consumers.get(t["out"]):
            return t["scale"]
    return None


def _planar_tail_u8(t: jnp.ndarray, skip: jnp.ndarray, s: int,
                    channel_order: str) -> jnp.ndarray:
    """SRVGG tail in *shuffle-planar* form: NO pixel shuffle on device.

    The reference-order tail (PixelShuffle -> nearest-Interp skip -> Add ->
    *255/round/clamp, upscale_processing.py:284-288) makes XLA materialize
    relayout copies of the FULL-RES tensor — ~6.5 ms/frame at 1080p->4K in
    bf16, 14 ms in uint8 (both measured) — running at ~1% of HBM bandwidth
    because the interleave crosses (8,128) tile boundaries with a 3-wide
    minor dim.  The interleave is hostile to ANY tiled-layout device; so
    it leaves the device entirely:

    - the skip add happens in the (3*s^2)-channel low-res domain (nearest
      x-s upsample of the skip == repeating each skip channel s^2 times);
    - channels are permuted from ncnn shuffle order ``(c, i, j)`` to
      planar order ``(i, j, c)`` with the BGR->RGB flip folded in — a
      minor-dim gather that fuses into the quantize epilogue;
    - output is uint8 ``(N, H, W, 3*s*s)``: plane ``(i, j)`` holds the
      output's stride-s subgrid at offset (i, j), exactly
      ``ops.pixel.planar_to_frames``'s input.  The host interleaves on the
      sink thread (C-contiguous strides, overlapped with device compute).

    Elementwise-only + permutation => identical to the reference-order
    epilogue after host interleave: bit-exact in f32; <=1 u8 LSB in bf16
    (XLA's excess-precision pass may elide the f32->bf16->f32 convert pair
    around the skip add differently between the formulations).  Tested.
    """
    s2 = s * s
    y = t + jnp.repeat(skip.astype(t.dtype), s2, axis=-1)
    idx = []
    for i in range(s):
        for j in range(s):
            for c in range(3):
                cm = 2 - c if channel_order == "bgr" else c
                idx.append(cm * s2 + i * s + j)
    y = y[..., np.asarray(idx)]
    y = jnp.clip(jnp.round(y.astype(jnp.float32) * 255.0), 0.0, 255.0)
    return y.astype(jnp.uint8)


def build_forward(
    graph: NcnnGraph,
    compute_dtype: Any = jnp.bfloat16,
    output_dtype: Any = jnp.float32,
    pallas_conv: bool = False,
    emit_frames: bool = False,
    channel_order: str = "bgr",
    dense_scatter: bool = True,
    planar_tail: bool = False,
    rdb_kernel: bool = False,
    residual_dtype: Any = None,
) -> Callable:
    """Compile ``graph`` into a pure ``forward(params, x_nhwc) -> y_nhwc``.

    The returned function is trace-compatible: wrap in ``jax.jit`` (or shard
    with ``shard_map``) at the call site.  Input is a float tensor in the
    model's native [0,1] domain, matching the reference normalization
    ``1/255`` applied before extraction (upscale_processing.py:271-273).

    ``emit_frames=True`` changes the OUTPUT contract to display-ready
    uint8 RGB frames: the ``x255 + round + clamp`` epilogue (and the
    BGR->RGB flip for ``channel_order='bgr'``) fuses into the Pallas tail
    kernel when the graph's tail is chain-fused, and into XLA otherwise —
    either way the caller skips ``model_to_frames``.

    ``planar_tail=True`` (with ``emit_frames``) additionally requests the
    *shuffle-planar* contract: when the graph tail matches the SRVGG
    pattern, output is uint8 ``(N, H, W, 3*s*s)`` in ``(i, j, c)`` plane
    order and the pixel-shuffle interleave is left to the host
    (``ops.pixel.planar_to_frames``) — the interleave costs ~6.5 ms/frame
    of device relayout at 4K but is a single C-contiguous pass on CPU.
    The returned function carries ``planar_scale`` (the shuffle factor,
    or None when the tail didn't match and the output is ordinary frames).
    """
    unsupported = sorted(
        {l.type for l in graph.layers if l.type not in OP_REGISTRY}
    )
    if unsupported:
        raise NotImplementedError(f"unsupported ncnn layer types: {unsupported}")

    if pallas_conv and compute_dtype == jnp.float32:
        # the fused kernels hold tiles/weights in bf16 (MXU-native); the
        # documented "f32 = max quality" contract is only honoured by the
        # XLA path (Precision.HIGHEST in _op_convolution), so downgrade.
        import logging

        logging.getLogger(__name__).warning(
            "precision f32 requested: Pallas conv kernels compute in bf16, "
            "using the XLA conv path (true-f32 MXU passes) instead"
        )
        pallas_conv = False

    input_blobs = graph.input_blobs
    if len(input_blobs) != 1:
        raise ValueError(f"expected exactly one Input, got {input_blobs}")
    output_blobs = graph.output_blobs
    if len(output_blobs) != 1:
        raise ValueError(f"expected exactly one output blob, got {output_blobs}")

    consumers_map: Dict[str, List[int]] = {}
    for idx, layer in enumerate(graph.layers):
        for b in layer.inputs:
            consumers_map.setdefault(b, []).append(idx)

    # fused-RDB blocks claim whole dense blocks before the scatter planner
    # sees them (ops/rdb_pallas.py — the round-3 Valar kernel; bf16-only,
    # so the f32 max-quality contract keeps the XLA path like pallas_conv)
    rdb_triggers: Dict[str, dict] = {}
    rdb_absorbed: set = set()
    if rdb_kernel and compute_dtype != jnp.float32:
        rdb_blocks, rdb_absorbed = _plan_rdb_blocks(graph, consumers_map)
        rdb_triggers = {b["trigger"]: b for b in rdb_blocks}

    piece_groups: Dict[str, List[dict]] = {}
    dense_targets: Dict[str, dict] = {}
    dead_layers: set = set()
    if dense_scatter:
        piece_groups, dense_targets, dead_layers = _plan_dense_scatter(
            graph, consumers_map, exclude=rdb_absorbed
        )

    fusion_plans: Dict[str, Any] = {}
    absorbed: set = set()
    if pallas_conv:
        fusion_plans, absorbed = _plan_pallas_fusion(
            graph, exclude=set(dense_targets) | rdb_absorbed,
            consumers=consumers_map,
        )

    # Shuffle-planar output contract (emit-frames only): the SRVGG tail's
    # pixel shuffle never runs on device — see _planar_tail_u8.  The Pallas
    # path has its own fused tail kernel.
    xla_tail: Dict[str, Any] | None = None
    if emit_frames and planar_tail and not pallas_conv:
        for idx, layer in enumerate(graph.layers):
            if layer.type != "Convolution" or layer.name in dense_targets:
                continue
            t = _match_srvgg_tail(graph, consumers_map, idx)
            if (
                t is not None
                and t["out"] == output_blobs[0]
                and not consumers_map.get(t["out"])
            ):
                xla_tail = dict(t, conv=layer.name)
                absorbed = absorbed | t["absorbed"]
                break

    # last consumer index per blob, so traced intermediates are dropped as
    # soon as possible (keeps the Python-side blob dict small for the
    # 2127-blob Valar graph; XLA liveness does the on-device equivalent).
    last_use: Dict[str, int] = {}
    for i, layer in enumerate(graph.layers):
        for b in layer.inputs:
            last_use[b] = i

    def _run_pallas_conv(layer, x, params, blobs=None):
        from upscale_video_tpu.ops.conv_pallas import (
            ACT_LEAKY, ACT_NONE, ACT_PRELU, ACT_RELU, conv3x3_fused_batch,
        )

        plan = fusion_plans[layer.name]
        p = params.get(layer.name, {})
        if plan["kind"] == "tail":
            from upscale_video_tpu.ops.tail_pallas import sr_tail_fused_batch

            rgb = blobs[plan["skip_blob"]]
            return sr_tail_fused_batch(
                x, rgb, p["weight"],
                p.get("bias"), scale=plan["scale"],
            ).astype(output_dtype)
        if plan["kind"] == "chain":
            from upscale_video_tpu.ops.conv_chain import (
                conv3x3_chain, conv3x3_chain_batch,
            )

            specs = []
            for item in plan["items"]:
                lp = params[item["name"]]
                spec = {"weight": lp["weight"], "bias": lp.get("bias")}
                from upscale_video_tpu.ops.conv_pallas import (
                    ACT_LEAKY as _LK, ACT_PRELU as _PR, ACT_RELU as _RL,
                )

                if item["prelu"] is not None:
                    spec["slope"] = params[item["prelu"]]["slope"]
                    spec["act"] = _PR
                elif item["act"] == 2:  # ncnn fused leaky-relu (attr 9=2)
                    spec["slope"] = jnp.asarray(item["slope_attr"], jnp.float32)
                    spec["act"] = _LK
                elif item["act"] == 1:  # ncnn relu
                    spec["act"] = _RL
                specs.append(spec)
            tail = plan.get("tail")
            if tail is None:
                return conv3x3_chain_batch(x, specs).astype(compute_dtype)

            # chain + fused tail: per-frame unroll, ring layout handed from
            # the chain straight to the tail kernel
            from upscale_video_tpu.ops.tail_pallas import sr_tail_fused_chain

            interpret = jax.default_backend() != "tpu"
            tp = params[tail["conv"]]
            rgb = blobs[tail["skip_blob"]]
            n, hgt, wid = x.shape[0], x.shape[1], x.shape[2]
            outs = []
            for i in range(n):
                arr = conv3x3_chain(x[i], specs, crop=False,
                                    interpret=interpret)
                outs.append(sr_tail_fused_chain(
                    arr, rgb[i], tp["weight"], tp.get("bias"),
                    scale=tail["scale"], hgt=hgt, wid=wid,
                    emit_u8=emit_frames,
                    reverse_channels=emit_frames and channel_order == "bgr",
                    interpret=interpret,
                ))
            y = jnp.stack(outs)
            return y if emit_frames else y.astype(output_dtype)
        bias = p.get("bias")
        slope = None
        act = ACT_NONE
        if plan["prelu"] is not None:
            slope = params[plan["prelu"]]["slope"]
            act = ACT_PRELU
        elif plan["act"] == 1:
            act = ACT_RELU
        elif plan["act"] == 2:
            slope = jnp.asarray(layer.attr(10, [0.0]), jnp.float32)
            act = ACT_LEAKY
        return conv3x3_fused_batch(
            x, p["weight"], bias, slope, act=act, out_dtype=compute_dtype,
        )

    conv_precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    # ``--precision mixed``: convs stay in compute_dtype (bf16 MXU path)
    # but every residual/Eltwise ADD runs — and its result flows onward —
    # in f32.  The error that separates Valar's bf16 output from the
    # Compact family's (PARITY 36.1 vs >=49.6 dB) accrues on the residual
    # SPINE: 69 RDB combines + 23 RRDB combines + trunk adds each
    # re-round the running sum to bf16's 8-bit mantissa.  Keeping the
    # spine f32 is elementwise-only work (the convs that dominate the
    # step are untouched) and measured +4.4 dB on the 23-RRDB synthetic
    # (33.75 -> 38.12 dB vs the f32 oracle, hermetic probe, round 5).
    residual_f32 = (
        residual_dtype is not None
        and jnp.dtype(residual_dtype) == jnp.dtype(jnp.float32)
        and jnp.dtype(compute_dtype) != jnp.dtype(jnp.float32)
    )

    def _spine_cast(ts):
        """Upcast float tensors entering a residual add when mixed."""
        return [
            t.astype(jnp.float32)
            if jnp.issubdtype(t.dtype, jnp.floating) else t
            for t in ts
        ]

    # graphs with a Reorg (pixel-unshuffle) need H/W divisible by the
    # stride; basicsr's reference forward mod-pads the input and crops the
    # output (Real-ESRGAN pre_process/post_process) — reproduce that at
    # the frames level so arbitrary source geometry (e.g. an 853-row crop)
    # works instead of dying in a reshape inside jit
    reorg_mod = 1
    for _l in graph.layers:
        if _l.type == "Reorg":
            reorg_mod = max(reorg_mod, _l.attr_i(0, 1))

    def forward(params: Dict[str, Dict[str, jnp.ndarray]], x: jnp.ndarray) -> jnp.ndarray:
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        mod_h = (-x.shape[1]) % reorg_mod
        mod_w = (-x.shape[2]) % reorg_mod
        in_h, in_w = x.shape[1], x.shape[2]
        if mod_h or mod_w:
            x = jnp.pad(x, ((0, 0), (0, mod_h), (0, mod_w), (0, 0)),
                        mode="edge")
        blobs: Dict[str, jnp.ndarray] = {input_blobs[0]: x.astype(compute_dtype)}
        # dense-scatter state: per-target lists of partial contributions
        piece_bufs: Dict[str, List[jnp.ndarray]] = {}
        # canvas-resident RDB chaining (round 4): id(plain tracer) ->
        # (plain tracer, canvas, geom).  Pinning the plain tracer keeps
        # its id unique for the lifetime of the cache; a consumer that
        # stays on the canvas leaves the plain extract dead, and XLA DCE
        # removes it from the compiled program.
        canvas_cache: Dict[int, tuple] = {}
        fused_eltwise: set = set()  # combines folded into RDB epilogues

        def _run_scatter(blob: str) -> None:
            """If ``blob`` is a dense-block source, compute its contribution
            to every downstream conv in one wide-N fused conv pass."""
            group = piece_groups.get(blob)
            if not group:
                return
            x_src = blobs[blob].astype(compute_dtype)
            ws = []
            for t in group:
                w = params[t["conv"]]["weight"]
                if t["promote1x1"]:
                    w = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
                if t["in_off"] is not None:
                    w = w[:, :, t["in_off"]:t["in_off"] + t["width"], :]
                ws.append(jnp.asarray(w, compute_dtype))
            wcat = jnp.concatenate(ws, axis=-1) if len(ws) > 1 else ws[0]
            y = jax.lax.conv_general_dilated(
                x_src, wcat,
                window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
                precision=conv_precision,
            )
            # pieces are stored in compute_dtype: in bf16 mode this halves
            # the piece-buffer HBM traffic (the dominant non-MXU cost at
            # large tiles — 480px A/B in NOTES.md); accumulation upcasts
            # back to f32 so only one extra rounding per piece is added.
            # UPSCALE_TPU_SCATTER_ACCUM=eager flips to a running f32
            # accumulator updated at scatter time (adds sit adjacent to
            # the producing conv, where XLA can fuse them into its output
            # fusion) — a round-3 A/B knob, deferred remains the default.
            eager = os.environ.get("UPSCALE_TPU_SCATTER_ACCUM") == "eager"
            if not eager:
                y = y.astype(compute_dtype)
            off = 0
            for t in group:
                piece = y[..., off:off + t["n_out"]]
                if eager:
                    prev = piece_bufs.get(t["conv"])
                    piece_bufs[t["conv"]] = (
                        [piece] if prev is None else [prev[0] + piece]
                    )
                else:
                    piece_bufs.setdefault(t["conv"], []).append(piece)
                off += t["n_out"]

        _run_scatter(input_blobs[0])
        for i, layer in enumerate(graph.layers):
            if layer.type == "Input":
                continue
            if layer.name in absorbed:
                continue  # PReLU fused into the preceding Pallas conv
            if layer.name in rdb_triggers:
                # fused RDB: the whole dense block in one pallas_call per
                # frame (HBM operands cannot be vmapped).  Consecutive
                # RDBs chain canvas-to-canvas (round 4): the per-call
                # zeros+embed+slice XLA glue (~19 ms of the 204 ms 480px
                # Valar tile, round-4 profile) only runs when a block's
                # input was produced outside the chain; the RRDB combine
                # Eltwises propagate canvases below, so a whole 23-RRDB
                # trunk embeds exactly once.
                from upscale_video_tpu.ops.rdb_pallas import (
                    canvas_geometry, rdb_apply_canvas, rdb_canvas_embed,
                    rdb_canvas_extract, resolve_tile_h)

                block = rdb_triggers[layer.name]
                x_val = blobs[layer.inputs[1]]  # the residual-skip alias
                h_in, w_in = int(x_val.shape[1]), int(x_val.shape[2])
                geom = canvas_geometry(h_in, w_in, resolve_tile_h(None))
                hit = canvas_cache.get(id(x_val))
                bufs = (hit[1] if hit is not None and hit[2] == geom
                        else rdb_canvas_embed(x_val, geom))
                if bufs.dtype != compute_dtype:
                    # mixed precision keeps combined canvases (the
                    # residual spine) in f32; the Mosaic kernel operand
                    # contract stays compute_dtype
                    bufs = bufs.astype(compute_dtype)
                # lookahead: if this block's SOLE consumer is a 2-input
                # sum Eltwise whose other operand has a live canvas on
                # the same grid (the ESRGAN RRDB combine, 0.2*r3 + in),
                # fuse the combine into the kernel epilogue — the whole
                # read-2/write-1 canvas pass disappears.  REFUTED on
                # hardware as a default (round-4 RRDB A/B,
                # .hwlogs/rdb_rrdb_ab_r4s3.log): 7.213 ms/RRDB fused vs
                # 7.040 with the separate canvas eltwise — the res-center
                # DMA + VMEM pressure cost more than the pass it saves,
                # and Mosaic's lowered multiply-add is not bit-identical
                # to the XLA combine (0.03% checksum drift).  Kept as an
                # opt-in for future Mosaic versions.
                fuse_next = None  # (layer_idx, eltwise layer, res canvases, comb_self, comb_res)
                cons = (consumers_map.get(block["out"], [])
                        if os.environ.get("UPSCALE_TPU_RDB_FUSE_COMBINE")
                        == "1" and not residual_f32 else [])
                # (the refuted fused-combine opt-in runs the combine in
                # the kernel epilogue at compute_dtype — incompatible
                # with the mixed-precision f32 spine, so mixed wins)
                if len(cons) == 1:
                    nxt = graph.layers[cons[0]]
                    if (nxt.type == "Eltwise" and nxt.attr_i(0, 0) == 1
                            and len(nxt.inputs) == 2
                            and nxt.name not in rdb_triggers):
                        pos = nxt.inputs.index(block["out"])
                        other = nxt.inputs[1 - pos]
                        hit2 = (canvas_cache.get(id(blobs[other]))
                                if other in blobs else None)
                        cf = list(nxt.attr(1, []))
                        if len(cf) < 2:
                            cf = [1.0, 1.0]
                        if hit2 is not None and hit2[2] == geom \
                                and cf[1 - pos] != 0.0:
                            fuse_next = (cons[0], nxt, hit2[1],
                                         float(cf[pos]),
                                         float(cf[1 - pos]))
                ws, bs_ = [], []
                for name in block["convs"]:
                    p = params[name]
                    w = p["weight"]
                    ws.append(w)
                    bs_.append(p.get("bias",
                                     jnp.zeros((w.shape[-1],), jnp.float32)))
                sp = params[block["skip_conv"]]
                interp = jax.default_backend() != "tpu"
                res_kw = {}
                if fuse_next is not None:
                    res_kw = dict(comb_self=fuse_next[3],
                                  comb_res=fuse_next[4])
                def _one(buf, res):
                    return rdb_apply_canvas(
                        buf, ws, bs_, geom, h_in, w_in,
                        slope=block["slope"],
                        skip_w=sp["weight"], skip_b=sp.get("bias"),
                        add_c2_to_c4=True, interpret=interp,
                        res_canvas=res, **res_kw,
                    )

                if x_val.shape[0] == 1:
                    # keep the single-frame program structurally identical
                    # to the historical unrolled form — depth 1 is the
                    # shipped `-m r` configuration whose timings are
                    # published, so it must not gain a loop wrapper
                    out_bufs = jnp.stack([
                        _one(bufs[0], fuse_next[2][0]
                             if fuse_next is not None else None)
                    ])
                elif fuse_next is not None:
                    out_bufs = jax.lax.map(
                        lambda br: _one(br[0], br[1]),
                        (bufs, fuse_next[2]),
                    )
                else:
                    # lax.map instead of a Python loop: one copy of the
                    # kernel program however long this leading dim.  NOTE
                    # this dim is the frame batch only on the UNTILED
                    # path; the tiled product path vmaps frames over the
                    # tile chunks (chunk dim 1 -> the branch above), and
                    # the round-5 2.2 GB depth-4 executable reproduced
                    # byte-for-byte under this rewrite — that size lives
                    # in XLA/Mosaic's lowering of the vmapped batch, not
                    # in per-frame trace duplication (NOTES round 5).
                    out_bufs = jax.lax.map(lambda b: _one(b, None), bufs)
                y = rdb_canvas_extract(out_bufs, h_in, w_in)
                y = y.astype(compute_dtype)
                out_blob = (fuse_next[1].outputs[0] if fuse_next is not None
                            else block["out"])
                blobs[out_blob] = y
                canvas_cache[id(y)] = (y, out_bufs, geom)
                _run_scatter(out_blob)
                if fuse_next is not None:
                    fused_eltwise.add(fuse_next[1].name)
                for b in layer.inputs:
                    if last_use.get(b) == i and b in blobs:
                        del blobs[b]
                continue
            if layer.name in fused_eltwise:
                # RRDB combine fused into the preceding RDB kernel's
                # epilogue: output blob already set at the trigger site
                for b in layer.inputs:
                    if last_use.get(b) == i and b in blobs:
                        del blobs[b]
                continue
            if layer.name in rdb_absorbed:
                # interior of a fused RDB block: never materialized; free
                # split aliases whose last (absorbed) consumer is here
                for b in layer.inputs:
                    if last_use.get(b) == i and b in blobs:
                        del blobs[b]
                continue
            if layer.name in dead_layers:
                # Concat consumed only by a scatter-rewritten conv: never
                # materialize it (saves the 96..192-channel HBM buffer)
                for b in layer.inputs:
                    if last_use.get(b) == i and b in blobs:
                        del blobs[b]
                continue
            if layer.name in dense_targets:
                t = dense_targets[layer.name]
                pieces = piece_bufs.pop(layer.name)
                acc = pieces[0].astype(jnp.float32)
                for extra in pieces[1:]:
                    acc = acc + extra.astype(jnp.float32)
                p = params.get(layer.name, {})
                if "bias" in p:
                    acc = acc + p["bias"].astype(jnp.float32)
                acc = _apply_activation(acc, t["act"], t["act_params"])
                blobs[t["out"]] = acc.astype(compute_dtype)
                _run_scatter(t["out"])
                for b in layer.inputs:
                    if last_use.get(b) == i and b in blobs:
                        del blobs[b]
                continue
            if xla_tail is not None and layer.name == xla_tail["conv"]:
                t_out = _op_convolution(
                    layer, [blobs[layer.inputs[0]]],
                    params.get(layer.name, {}), compute_dtype,
                )
                blobs[xla_tail["out"]] = _planar_tail_u8(
                    t_out, blobs[xla_tail["skip_blob"]],
                    xla_tail["scale"], channel_order,
                )
                for b in layer.inputs:
                    if last_use.get(b) == i and b in blobs:
                        del blobs[b]
                continue
            if layer.name in fusion_plans:
                plan = fusion_plans[layer.name]
                blobs[plan["out"]] = _run_pallas_conv(
                    layer, blobs[layer.inputs[0]], params, blobs
                )
                _run_scatter(plan["out"])
                b_in = layer.inputs[0]
                # strictly <= i: an absorbed PReLU consumes the conv's
                # OUTPUT, never b_in, so last_use[b_in] == i+1 always means
                # some OTHER layer still needs it (a +1 allowance here
                # deleted such blobs -> KeyError in forward)
                if last_use.get(b_in, -1) <= i \
                        and b_in in blobs and b_in != plan["out"]:
                    del blobs[b_in]
                continue
            if (layer.type == "Eltwise" and layer.attr_i(0, 0) == 1
                    and len(layer.inputs) >= 2 and canvas_cache):
                # canvas propagation through Eltwise sums (the ESRGAN
                # RRDB combine, 0.2*a + b): when every operand has a
                # live canvas on the same grid, combine the CANVASES —
                # elementwise ops commute with the center extract, so
                # the plain value is bit-identical to _op_eltwise on the
                # extracts, and the downstream RDB chain stays unbroken
                # (ring/grid-pad garbage is masked by every consumer).
                hits = [canvas_cache.get(id(blobs[b]))
                        for b in layer.inputs]
                if (all(h_ is not None for h_ in hits)
                        and len({h_[2] for h_ in hits}) == 1):
                    from upscale_video_tpu.ops.rdb_pallas import (
                        rdb_canvas_extract)

                    coeffs = layer.attr(1, [])
                    cb = [h_[1] for h_ in hits]
                    if residual_f32:
                        # mixed precision: the combine chain IS the
                        # residual spine on the canvas path — keep the
                        # combined canvases f32 (the kernel call site
                        # downcasts its input canvas to compute_dtype)
                        cb = _spine_cast(cb)
                    if coeffs:
                        ob = cb[0] * jnp.asarray(coeffs[0], cb[0].dtype)
                        for t_, c_ in zip(cb[1:], coeffs[1:]):
                            ob = ob + t_ * jnp.asarray(c_, t_.dtype)
                    else:
                        ob = cb[0]
                        for t_ in cb[1:]:
                            ob = ob + t_
                    ref = blobs[layer.inputs[0]]
                    h_in, w_in = int(ref.shape[1]), int(ref.shape[2])
                    y = rdb_canvas_extract(ob, h_in, w_in)
                    y = y.astype(compute_dtype)
                    blobs[layer.outputs[0]] = y
                    canvas_cache[id(y)] = (y, ob, hits[0][2])
                    _run_scatter(layer.outputs[0])
                    for b in layer.inputs:
                        if last_use.get(b) == i and b in blobs:
                            del blobs[b]
                    continue
            ins = [blobs[b] for b in layer.inputs]
            if residual_f32 and layer.type in ("Eltwise", "BinaryOp"):
                # mixed precision: the residual spine (Eltwise/BinaryOp
                # sums) accumulates in f32; convs re-cast their inputs to
                # compute_dtype themselves, so only the spine stays wide
                ins = _spine_cast(ins)
            p = params.get(layer.name, {})
            out = OP_REGISTRY[layer.type](layer, ins, p, compute_dtype)
            if isinstance(out, list):
                for name, t in zip(layer.outputs, out):
                    blobs[name] = t
            else:
                blobs[layer.outputs[0]] = out
            if layer.type != "Split":  # split aliases are never roots
                for b in layer.outputs:
                    _run_scatter(b)
            for b in layer.inputs:
                if last_use.get(b) == i and b in blobs:
                    del blobs[b]
        y = blobs[output_blobs[0]]
        if mod_h or mod_w:
            # crop the mod-pad back out at the program's own scale ratio
            # (the planar contract never coexists with Reorg: _match_
            # srvgg_tail only fires on SRVGG graphs)
            r = y.shape[1] // (in_h + mod_h)
            y = y[:, : in_h * r, : in_w * r]
        if emit_frames:
            if y.dtype != jnp.uint8:  # no fused tail: XLA epilogue
                from upscale_video_tpu.ops.pixel import model_to_frames

                y = model_to_frames(y.astype(jnp.float32), channel_order)
        else:
            y = y.astype(output_dtype)
        return y[0] if squeeze else y

    forward.planar_scale = xla_tail["scale"] if xla_tail is not None else None
    return forward

"""Pure-numpy reference executor for ncnn graphs (test oracle).

The reference validated numerics implicitly by shipping outputs from the
battle-tested ncnn engine; this framework instead carries an independent,
deliberately-naive numpy implementation of the same op semantics so that
the JAX/Pallas fast paths can be golden-tested without ncnn or a TPU
(see SURVEY.md §4 test strategy).  Everything here favours clarity over
speed — it only ever runs on tiny test tensors.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from upscale_video_tpu.models.param_parser import NcnnGraph, NcnnLayer


def _conv2d(x: np.ndarray, w: np.ndarray, bias, stride, pad, dilation) -> np.ndarray:
    """NHWC x HWIO direct convolution, float64 accumulation."""
    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    sh, sw = stride
    (pt, pb), (pl, pr) = pad
    dh, dw = dilation
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    eff_kh = (kh - 1) * dh + 1
    eff_kw = (kw - 1) * dw + 1
    oh = (h + pt + pb - eff_kh) // sh + 1
    ow = (wd + pl + pr - eff_kw) // sw + 1
    out = np.zeros((n, oh, ow, cout), dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i * dh : i * dh + oh * sh : sh, j * dw : j * dw + ow * sw : sw, :]
            out += np.einsum("nhwc,co->nhwo", patch.astype(np.float64), w[i, j].astype(np.float64))
    if bias is not None:
        out += bias.astype(np.float64)
    return out


def _activation(x, act_type, act_params):
    if act_type == 0:
        return x
    if act_type == 1:
        return np.maximum(x, 0)
    if act_type == 2:
        return np.where(x >= 0, x, x * act_params[0])
    if act_type == 3:
        return np.clip(x, act_params[0], act_params[1])
    if act_type == 4:
        return 1.0 / (1.0 + np.exp(-x))
    raise NotImplementedError(act_type)


def forward_numpy(graph: NcnnGraph, params: Dict[str, Dict[str, np.ndarray]], x: np.ndarray) -> np.ndarray:
    """Run the graph on an NHWC float array; returns float64 NHWC output."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    blobs: Dict[str, np.ndarray] = {graph.input_blobs[0]: x.astype(np.float64)}

    for layer in graph.layers:
        t = layer.type
        if t == "Input":
            continue
        ins = [blobs[b] for b in layer.inputs]
        if t == "Split":
            for out in layer.outputs:
                blobs[out] = ins[0]
            continue
        if t == "Convolution":
            p = params[layer.name]
            kw_ = layer.attr_i(1)
            kh_ = layer.attr_i(11, kw_)
            sw = layer.attr_i(3, 1)
            sh = layer.attr_i(13, sw)
            dw = layer.attr_i(2, 1)
            dh = layer.attr_i(12, dw)
            pl = layer.attr_i(4, 0)
            pt = layer.attr_i(14, pl)
            pr = layer.attr_i(15, pl)
            pb = layer.attr_i(16, pt)
            y = _conv2d(
                ins[0], p["weight"], p.get("bias"), (sh, sw), ((pt, pb), (pl, pr)), (dh, dw)
            )
            y = _activation(y, layer.attr_i(9, 0), layer.attr(10, []))
        elif t == "PReLU":
            slope = params[layer.name]["slope"]
            y = np.where(ins[0] >= 0, ins[0], ins[0] * slope)
        elif t == "PixelShuffle":
            r = layer.attr_i(0, 1)
            mode = layer.attr_i(1, 0)
            n, h, w, cin = ins[0].shape
            cout = cin // (r * r)
            y = np.zeros((n, h * r, w * r, cout), dtype=ins[0].dtype)
            for c in range(cout):
                for i in range(r):
                    for j in range(r):
                        src_c = c * r * r + i * r + j if mode == 0 else (i * r + j) * cout + c
                        y[:, i::r, j::r, c] = ins[0][..., src_c]
        elif t == "ReLU":
            slope = layer.attr_f(0, 0.0)
            y = (np.where(ins[0] >= 0, ins[0], ins[0] * slope) if slope
                 else np.maximum(ins[0], 0))
        elif t == "Clip":
            y = np.clip(ins[0], layer.attr_f(0, -3.4e38),
                        layer.attr_f(1, 3.4e38))
        elif t == "Sigmoid":
            y = 1.0 / (1.0 + np.exp(-ins[0]))
        elif t == "Dropout":
            scale = layer.attr_f(0, 1.0)
            y = ins[0] if scale == 1.0 else ins[0] * scale
        elif t == "Reorg":
            # space-to-depth, torch pixel_unshuffle order (inverse of
            # PixelShuffle mode 0; executor._op_reorg)
            r = layer.attr_i(0, 1)
            n, h, w, cin = ins[0].shape
            y = np.zeros((n, h // r, w // r, cin * r * r), ins[0].dtype)
            for c in range(cin):
                for i in range(r):
                    for j in range(r):
                        y[..., c * r * r + i * r + j] = ins[0][:, i::r, j::r, c]
        elif t == "Interp":
            rtype = layer.attr_i(0, 0)
            hs = layer.attr_f(1, 1.0)
            ws = layer.attr_f(2, 1.0)
            n, h, w, c = ins[0].shape
            oh = layer.attr_i(3, 0) or int(h * hs)
            ow = layer.attr_i(4, 0) or int(w * ws)
            if rtype in (0, 1):
                ys = np.clip((np.arange(oh) * h) // oh, 0, h - 1)
                xs = np.clip((np.arange(ow) * w) // ow, 0, w - 1)
                y = ins[0][:, ys][:, :, xs]
            else:
                raise NotImplementedError("numpy ref: nearest Interp only")
        elif t == "BinaryOp":
            ops = {
                0: np.add, 1: np.subtract, 2: np.multiply, 3: np.divide,
                4: np.maximum, 5: np.minimum, 6: np.power,
            }
            op = ops[layer.attr_i(0, 0)]
            if layer.attr_i(1, 0):
                y = op(ins[0], layer.attr_f(2))
            else:
                y = op(ins[0], ins[1])
        elif t == "Eltwise":
            op = layer.attr_i(0, 0)
            coeffs = layer.attr(1, [])
            if op == 1:
                if coeffs:
                    y = sum(t_ * c for t_, c in zip(ins, coeffs))
                else:
                    y = sum(ins)
            elif op == 0:
                y = ins[0]
                for t_ in ins[1:]:
                    y = y * t_
            elif op == 2:
                y = ins[0]
                for t_ in ins[1:]:
                    y = np.maximum(y, t_)
        elif t == "Concat":
            axis = {0: 3, 1: 1, 2: 2}[layer.attr_i(0, 0)]
            y = np.concatenate(ins, axis=axis)
        else:
            raise NotImplementedError(f"numpy ref: layer type {t}")
        blobs[layer.outputs[0]] = y

    out = blobs[graph.output_blobs[0]]
    return out[0] if squeeze else out

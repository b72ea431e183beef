"""Random-graph fuzz: the JAX executor (with its dense-scatter planner
active) vs the independent numpy oracle over the full op set.

test_dense_scatter.py fuzzes dense conv/concat patterns specifically; this
widens coverage to the relayout ops (PixelShuffle, Reorg, Interp), the
pointwise ops, and their interaction with the planners on arbitrary
chain-with-rejoining-branches graphs — the shapes the ncnn zoo could
legally contain (every non-output blob fully consumed, like real params).
"""

import numpy as np
import pytest

from upscale_video_tpu.models.bin_loader import synthesize_weights
from upscale_video_tpu.models.executor import build_forward
from upscale_video_tpu.models.numpy_ref import forward_numpy
from upscale_video_tpu.models.param_parser import NcnnGraph, NcnnLayer


def random_graph(rng) -> NcnnGraph:
    """A random op chain with branches that always rejoin, tracking
    (channels, upscale) so every layer stays shape-legal."""
    layers = [NcnnLayer("Input", "input", [], ["input"])]
    uid = [0]

    def fresh():
        uid[0] += 1
        return f"b{uid[0]}"

    tip, c, up = "input", 3, 1  # up: net spatial scale num/den as float

    def conv(src, cin, k=None):
        cout = int(rng.integers(2, 9))
        k = k or int(rng.choice([1, 3]))
        attrs = {0: cout, 1: k, 6: cout * cin * k * k}
        if k == 3:
            attrs[4] = 1
        if rng.random() < 0.7:
            attrs[5] = 1
        if rng.random() < 0.5:
            attrs[9] = 2
            attrs[10] = [0.2]
        out = fresh()
        layers.append(NcnnLayer("Convolution", f"conv{uid[0]}", [src], [out], attrs))
        return out, cout

    for _ in range(int(rng.integers(6, 13))):
        op = rng.choice(
            ["conv", "prelu", "relu", "clip", "branch_bin", "branch_cat",
             "shuffle", "reorg", "interp", "dropout"]
        )
        if op == "conv":
            tip, c = conv(tip, c)
        elif op == "prelu":
            out = fresh()
            layers.append(NcnnLayer("PReLU", f"p{uid[0]}", [tip], [out], {0: c}))
            tip = out
        elif op == "relu":
            out = fresh()
            layers.append(NcnnLayer("ReLU", f"r{uid[0]}", [tip], [out], {}))
            tip = out
        elif op == "clip":
            out = fresh()
            layers.append(NcnnLayer(
                "Clip", f"cl{uid[0]}", [tip], [out], {0: -1.0, 1: 1.0}))
            tip = out
        elif op == "branch_bin":
            # split the tip, transform one arm, add/mul the arms back
            a, b = fresh(), fresh()
            layers.append(NcnnLayer("Split", f"sp{uid[0]}", [tip], [a, b], {}))
            arm = fresh()
            layers.append(NcnnLayer("ReLU", f"ra{uid[0]}", [a], [arm], {}))
            out = fresh()
            layers.append(NcnnLayer(
                "BinaryOp", f"bo{uid[0]}", [arm, b], [out],
                {0: int(rng.choice([0, 2]))}))
            tip = out
        elif op == "branch_cat":
            a, b = fresh(), fresh()
            layers.append(NcnnLayer("Split", f"sp{uid[0]}", [tip], [a, b], {}))
            arm, ca = conv(a, c)  # conv arm keeps geometry (k1/k3 SAME)
            out = fresh()
            layers.append(NcnnLayer(
                "Concat", f"cc{uid[0]}", [arm, b], [out], {0: 0}))
            tip, c = out, ca + c
        elif op == "shuffle":
            if c % 4 or up >= 2:
                continue
            out = fresh()
            layers.append(NcnnLayer(
                "PixelShuffle", f"ps{uid[0]}", [tip], [out], {0: 2}))
            tip, c, up = out, c // 4, up * 2
        elif op == "reorg":
            if up <= 0.5:
                continue
            out = fresh()
            layers.append(NcnnLayer("Reorg", f"rg{uid[0]}", [tip], [out], {0: 2}))
            tip, c, up = out, c * 4, up / 2
        elif op == "interp":
            if up >= 2:
                continue
            out = fresh()
            layers.append(NcnnLayer(
                "Interp", f"ip{uid[0]}", [tip], [out], {0: 1, 1: 2.0, 2: 2.0}))
            tip, up = out, up * 2
        elif op == "dropout":
            out = fresh()
            layers.append(NcnnLayer("Dropout", f"dr{uid[0]}", [tip], [out], {}))
            tip = out

    tip, c = conv(tip, c, k=3)  # terminal conv
    layers[-1].outputs[0] = "output"
    blob_count = len({b for l in layers for b in l.outputs})
    return NcnnGraph(layers=layers, blob_count=blob_count)


@pytest.mark.parametrize("seed", range(20))
def test_random_graph_matches_numpy_oracle(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(1000 + seed)
    graph = random_graph(rng)
    params = synthesize_weights(graph, seed=seed)
    fwd = build_forward(graph, compute_dtype=jnp.float32)
    x = rng.uniform(0, 1, (1, 8, 12, 3)).astype(np.float32)
    a = np.asarray(fwd(params, jnp.asarray(x)))
    b = forward_numpy(graph, params, x)
    assert a.shape == b.shape, (seed, a.shape, b.shape)
    # relative bound: multiply-chains legally amplify magnitudes into the
    # hundreds, where f32 summation-order differences reach ~1e-4 absolute
    # (soak seed 50290: maxabs 4.7e-4 at |y|~1400, relmax 1.5e-5)
    tol = 1e-4 * max(1.0, float(np.abs(b).max()))
    assert np.abs(a - b).max() < tol, (
        f"seed {seed}: maxabs {np.abs(a - b).max()} (tol {tol})"
    )

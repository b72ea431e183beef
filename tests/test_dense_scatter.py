"""Dense-block scatter rewrite (models/executor.py:_plan_dense_scatter).

The reference's real-life model (4x_Valar_v1.param, ESRGAN RRDB) spends
its FLOPs in 32-output-channel convs over growing Concats — 25% MXU lane
fill.  The scatter rewrite computes each source's contribution to every
downstream conv in one wide-N pass (N=64..224) and must be numerically
equivalent to the direct (gather) evaluation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from upscale_video_tpu.models.bin_loader import synthesize_weights
from upscale_video_tpu.models.executor import (
    _infer_blob_channels,
    _plan_dense_scatter,
    build_forward,
)
from upscale_video_tpu.models.numpy_ref import forward_numpy
from upscale_video_tpu.models.param_parser import parse_param_file
from upscale_video_tpu.models.zoo import (
    make_rrdb_graph,
    make_srvgg_graph,
    make_synthetic_rrdb_model,
)
from tests.conftest import REFERENCE_MODELS, reference_models_available


def _consumers(graph):
    out = {}
    for idx, layer in enumerate(graph.layers):
        for b in layer.inputs:
            out.setdefault(b, []).append(idx)
    return out


def test_rrdb_builder_matches_valar_census():
    """make_rrdb_graph(num_rrdb=23) reproduces the real Valar layer census
    (modulo ncnn Split bookkeeping, which this executor does not need)."""
    g = make_rrdb_graph(num_rrdb=23)
    counts = g.count_types()
    assert counts["Convolution"] == 420
    assert counts["Concat"] == 276
    assert counts["BinaryOp"] == 139
    assert counts["Eltwise"] == 92
    assert counts["Interp"] == 2


def test_channel_inference_rrdb():
    g = make_rrdb_graph(num_rrdb=1)
    ch = _infer_blob_channels(g)
    # every concat output width must be derived
    for layer in g.layers:
        if layer.type == "Concat":
            assert ch[layer.outputs[0]] == sum(ch[b] for b in layer.inputs)


def test_plan_shapes_synthetic():
    g = make_rrdb_graph(num_rrdb=1)  # 3 RDBs
    groups, targets, dead = _plan_dense_scatter(g, _consumers(g))
    assert len(groups) == 3 * 5  # x0..x4 per RDB
    assert len(targets) == 3 * 6  # 5 dense 3x3 + promoted 1x1 per RDB
    assert len(dead) == 3 * 4  # all four concats per RDB eliminated
    sizes = sorted(sum(t["n_out"] for t in g_) for g_ in groups.values())
    assert sizes == sorted([224, 160, 128, 96, 64] * 3)
    promoted = [t for g_ in groups.values() for t in g_ if t["promote1x1"]]
    assert len(promoted) == 3


@pytest.mark.skipif(
    not reference_models_available(), reason="reference models not present"
)
def test_plan_shapes_real_valar():
    import os

    graph = parse_param_file(os.path.join(REFERENCE_MODELS, "4x_Valar_v1.param"))
    groups, targets, dead = _plan_dense_scatter(graph, _consumers(graph))
    assert len(groups) == 69 * 5
    assert len(targets) == 69 * 6  # == 414 of the 420 convs
    assert len(dead) == 276  # every Concat in the graph


def test_compact_unaffected():
    g = make_srvgg_graph(scale=2, num_conv=3, num_feat=8)
    groups, targets, dead = _plan_dense_scatter(g, _consumers(g))
    assert not groups and not targets and not dead


def test_scatter_matches_gather_f32(rng):
    m = make_synthetic_rrdb_model(num_rrdb=1, seed=3, compute_dtype=jnp.float32)
    x = rng.uniform(0, 1, (1, 16, 14, 3)).astype(np.float32)
    y_gather = np.asarray(
        build_forward(m.graph, jnp.float32, dense_scatter=False)(m.params, x)
    )
    y_scatter = np.asarray(
        build_forward(m.graph, jnp.float32, dense_scatter=True)(m.params, x)
    )
    assert y_scatter.shape == (1, 64, 56, 3)
    np.testing.assert_allclose(y_scatter, y_gather, atol=1e-4, rtol=1e-4)


def test_scatter_matches_numpy_oracle(rng):
    m = make_synthetic_rrdb_model(num_rrdb=1, seed=7, compute_dtype=jnp.float32)
    x = rng.uniform(0, 1, (1, 12, 12, 3)).astype(np.float32)
    got = np.asarray(
        build_forward(m.graph, jnp.float32, dense_scatter=True)(m.params, x)
    )
    want = forward_numpy(m.graph, m.params, x)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_scatter_bf16_tracks_f32(rng):
    """bf16 scatter must sit at the same distance from the f32 truth as the
    bf16 gather path (summation-order change only, no precision loss)."""
    m = make_synthetic_rrdb_model(num_rrdb=1, seed=1, compute_dtype=jnp.float32)
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    f32 = np.asarray(
        build_forward(m.graph, jnp.float32, dense_scatter=True)(m.params, x)
    )
    g16 = np.asarray(
        build_forward(m.graph, jnp.bfloat16, dense_scatter=False)(m.params, x)
    ).astype(np.float32)
    s16 = np.asarray(
        build_forward(m.graph, jnp.bfloat16, dense_scatter=True)(m.params, x)
    ).astype(np.float32)
    rms_g = np.sqrt(((g16 - f32) ** 2).mean())
    rms_s = np.sqrt(((s16 - f32) ** 2).mean())
    assert rms_s <= rms_g * 1.5 + 1e-6


def test_scatter_with_pallas_path(rng):
    """pallas_conv=True excludes scatter-claimed convs from the Pallas
    planner; the two rewrites coexist (trunk/upsample convs on Pallas,
    dense blocks on scatter) and still match the gather evaluation."""
    m = make_synthetic_rrdb_model(num_rrdb=1, seed=5, compute_dtype=jnp.float32)
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    y_ref = np.asarray(
        build_forward(m.graph, jnp.float32, dense_scatter=False)(m.params, x)
    )
    y_mix = np.asarray(
        build_forward(
            m.graph, jnp.float32, pallas_conv=False, dense_scatter=True
        )(m.params, x)
    )
    np.testing.assert_allclose(y_mix, y_ref, atol=1e-4, rtol=1e-4)
    y_pal = np.asarray(
        build_forward(
            m.graph, jnp.bfloat16, pallas_conv=True, dense_scatter=True
        )(m.params, x)
    ).astype(np.float32)
    np.testing.assert_allclose(y_pal, y_ref, atol=0.15, rtol=0.1)


def test_scatter_fuzz_random_dense_graphs(rng):
    """Property test: on randomized dense-block graphs (random source
    widths, random concat subsets/orders, direct convs sharing roots,
    promotable 1x1s, random activations), scatter execution must equal
    gather execution in f32.  Hardens the planner against shapes the
    hand-built Valar census doesn't cover."""
    from upscale_video_tpu.models.param_parser import NcnnGraph, NcnnLayer

    for trial in range(6):
        trng = np.random.default_rng(100 + trial)
        layers = [NcnnLayer("Input", "input", [], ["input"])]
        uid = [0]

        def conv(src, cin, cout, k=3, act=None):
            attrs = {0: cout, 1: k, 6: cout * cin * k * k, 5: 1}
            if k == 3:
                attrs[4] = 1
            if act is not None:
                attrs[9] = int(act)
                if act == 2:
                    attrs[10] = [0.2]
            out = f"t{uid[0]}"
            name = f"conv{uid[0]}"
            uid[0] += 1
            layers.append(NcnnLayer("Convolution", name, [src], [out], attrs))
            return out, cout

        def cat(srcs):
            out = f"t{uid[0]}"
            name = f"cat{uid[0]}"
            uid[0] += 1
            layers.append(NcnnLayer("Concat", name, list(srcs), [out], {0: 0}))
            return out

        # random dense chain: sources accumulate, each conv eats a concat
        # of a random subset (always including the newest source)
        sources = [("input", 3)]
        for step in range(int(trng.integers(2, 5))):
            k_sub = int(trng.integers(1, len(sources) + 1))
            idxs = sorted(trng.choice(len(sources), size=k_sub, replace=False))
            if len(sources) - 1 not in idxs:
                idxs[-1] = len(sources) - 1
            parts = [sources[i] for i in idxs]
            src = cat([p[0] for p in parts]) if len(parts) > 1 else parts[0][0]
            cin = sum(p[1] for p in parts)
            cout = int(trng.choice([4, 8, 12]))
            act = int(trng.choice([0, 1, 2]))
            out, cout = conv(src, cin, cout, act=act)
            sources.append((out, cout))
        # a direct conv reading an existing root (joins the scatter group)
        root, rw = sources[int(trng.integers(0, len(sources)))]
        d_out, d_c = conv(root, rw, 8, act=1)
        # a promotable 1x1 off another root
        root2, rw2 = sources[int(trng.integers(0, len(sources)))]
        s_out, s_c = conv(root2, rw2, 8, k=1)
        # combine everything into one output (eltwise-style adds)
        final = cat([sources[-1][0], d_out, s_out])
        out, _ = conv(final, sources[-1][1] + d_c + s_c, 4)

        g = NcnnGraph(layers, 2)
        params = synthesize_weights(g, seed=trial)
        x = rng.uniform(0, 1, (1, 6, 9, 3)).astype(np.float32)
        f_gather = build_forward(g, compute_dtype=jnp.float32,
                                 dense_scatter=False)
        f_scatter = build_forward(g, compute_dtype=jnp.float32,
                                  dense_scatter=True)
        y1 = np.asarray(f_gather(params, x))
        y2 = np.asarray(f_scatter(params, x))
        np.testing.assert_allclose(y1, y2, atol=2e-5, rtol=1e-5,
                                   err_msg=f"trial {trial}")

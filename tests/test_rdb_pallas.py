"""Fused RDB kernel vs XLA reference (interpret mode on CPU).

Hardware equality + timing live in tools/rdb_bench.py (NOTES.md records
them) — interpret equality alone is insufficient for Mosaic kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_video_tpu.ops.rdb_pallas import GC, NF, rdb_apply
from tests.conftest import reference_models_available


def _make_rdb_weights(rng):
    ws, bs = [], []
    for t in range(5):
        cin = NF + t * GC
        cout = NF if t == 4 else GC
        ws.append(jnp.asarray(rng.normal(0, 0.1, (3, 3, cin, cout)),
                              jnp.float32))
        bs.append(jnp.asarray(rng.normal(0, 0.05, (cout,)), jnp.float32))
    return ws, bs


def _xla_rdb(x, ws, bs, slope=0.2, act5=False, res_scale=0.2):
    """Direct dense-block reference with the kernel's rounding points
    (bf16 weights/inputs to each conv, f32 accumulation)."""

    def conv(v, w, b):
        y = jax.lax.conv_general_dilated(
            v.astype(jnp.bfloat16)[None], w.astype(jnp.bfloat16),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )[0]
        return y + b

    feats = [x.astype(jnp.float32)]
    for t in range(5):
        cat = jnp.concatenate(
            [f.astype(jnp.bfloat16).astype(jnp.float32) for f in feats],
            axis=-1,
        )
        y = conv(cat, ws[t], bs[t])
        if t < 4:
            y = jnp.where(y >= 0, y, y * slope)
        elif act5:
            y = jnp.where(y >= 0, y, y * slope)
        feats.append(y)
    return (feats[0] + res_scale * feats[5]).astype(jnp.bfloat16)


@pytest.mark.parametrize("hw", [(32, 40), (19, 37)])
def test_rdb_matches_xla(rng, hw):
    h, w_ = hw
    x = jnp.asarray(rng.normal(0, 0.5, (h, w_, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    got = np.asarray(
        rdb_apply(x, ws, bs, tile_h=16, tile_w=24, interpret=True)
    ).astype(np.float32)
    want = np.asarray(_xla_rdb(x, ws, bs)).astype(np.float32)
    assert got.shape == want.shape == (h, w_, NF)
    np.testing.assert_allclose(got, want, atol=0.05)


def _xla_valar_rdb(x, ws, bs, skip_w, slope=0.2):
    """The 4x_Valar_v1 dense-block variant: c2 += conv1x1(x) (Conv_6 +
    Add_7, no bias), c4 += c2 (Add_14), c5 linear, out = x + 0.2*c5."""

    def conv(v, w, b, k=3):
        pad = [(1, 1), (1, 1)] if k == 3 else [(0, 0), (0, 0)]
        y = jax.lax.conv_general_dilated(
            v.astype(jnp.bfloat16)[None], w.astype(jnp.bfloat16),
            (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )[0]
        return y if b is None else y + b

    def lrelu(v):
        return jnp.where(v >= 0, v, v * slope)

    bf = lambda v: v.astype(jnp.bfloat16).astype(jnp.float32)  # noqa: E731
    x = bf(x)
    c1 = lrelu(conv(x, ws[0], bs[0]))
    c2 = lrelu(conv(jnp.concatenate([bf(x), bf(c1)], -1), ws[1], bs[1]))
    c2 = c2 + conv(x, skip_w, None, k=1)
    c3 = lrelu(conv(jnp.concatenate([bf(x), bf(c1), bf(c2)], -1),
                    ws[2], bs[2]))
    c4 = lrelu(conv(jnp.concatenate([bf(x), bf(c1), bf(c2), bf(c3)], -1),
                    ws[3], bs[3]))
    c4 = c4 + c2
    c5 = conv(jnp.concatenate([bf(x), bf(c1), bf(c2), bf(c3), bf(c4)], -1),
              ws[4], bs[4])
    return (x + 0.2 * c5).astype(jnp.bfloat16)


def test_rdb_valar_variant(rng):
    """1x1 x-skip into c2 + c2-into-c4 residual (4x_Valar_v1.param
    Conv_6/Add_7/Add_14)."""
    h, w_ = 20, 28
    x = jnp.asarray(rng.normal(0, 0.5, (h, w_, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    skip_w = jnp.asarray(rng.normal(0, 0.1, (1, 1, NF, GC)), jnp.float32)
    got = np.asarray(rdb_apply(
        x, ws, bs, tile_h=16, tile_w=24, skip_w=skip_w,
        add_c2_to_c4=True, interpret=True,
    )).astype(np.float32)
    want = np.asarray(_xla_valar_rdb(x, ws, bs, skip_w)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.06)


def test_executor_rdb_integration(rng):
    """build_forward(rdb_kernel=True) matches the XLA scatter path on a
    full (small) RRDB graph: the planner claims every dense block, the
    scatter planner yields them, and the outputs agree."""
    from upscale_video_tpu.models.bin_loader import synthesize_weights
    from upscale_video_tpu.models.executor import (
        _plan_rdb_blocks, build_forward,
    )
    from upscale_video_tpu.models.zoo import make_rrdb_graph

    g = make_rrdb_graph(scale=4, num_rrdb=1)
    consumers = {}
    for i, layer in enumerate(g.layers):
        for b in layer.inputs:
            consumers.setdefault(b, []).append(i)
    blocks, absorbed = _plan_rdb_blocks(g, consumers)
    assert len(blocks) == 3  # 3 RDBs per RRDB
    assert all(len(b["convs"]) == 5 for b in blocks)

    params = synthesize_weights(g, seed=0)
    ref_fwd = build_forward(g, compute_dtype=jnp.bfloat16)
    rdb_fwd = build_forward(g, compute_dtype=jnp.bfloat16, rdb_kernel=True)
    x = jnp.asarray(rng.uniform(0, 1, (1, 18, 22, 3)), jnp.float32)
    a = np.asarray(ref_fwd(params, x)).astype(np.float32)
    b = np.asarray(rdb_fwd(params, x)).astype(np.float32)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=0.06)


def test_executor_rdb_honors_im2col_env(rng, monkeypatch):
    """UPSCALE_TPU_RDB_IM2COL reaches the executor's canvas-chain path
    (the product '-m r' route calls rdb_apply_canvas with no explicit
    im2col): a hardware winner ships by exporting the env var."""
    from upscale_video_tpu.models.bin_loader import synthesize_weights
    from upscale_video_tpu.models.executor import build_forward
    from upscale_video_tpu.models.zoo import make_rrdb_graph

    g = make_rrdb_graph(scale=4, num_rrdb=1)
    params = synthesize_weights(g, seed=0)
    ref_fwd = build_forward(g, compute_dtype=jnp.bfloat16)
    monkeypatch.setenv("UPSCALE_TPU_RDB_IM2COL", "pack12")
    rdb_fwd = build_forward(g, compute_dtype=jnp.bfloat16, rdb_kernel=True)
    x = jnp.asarray(rng.uniform(0, 1, (1, 14, 18, 3)), jnp.float32)
    a = np.asarray(ref_fwd(params, x)).astype(np.float32)
    b = np.asarray(rdb_fwd(params, x)).astype(np.float32)
    np.testing.assert_allclose(a, b, atol=0.06)


def _insert_ncnn_splits(g):
    """ncnn-ify a synthetic graph: every blob with more than one consumer
    gets a Split layer fanning out one alias per consumer — the exact
    bookkeeping the real .param files carry (4x_Valar_v1.param:6-19) and
    the synthetic builders omit."""
    from upscale_video_tpu.models.param_parser import NcnnGraph, NcnnLayer

    consumers = {}
    for layer in g.layers:
        for b in layer.inputs:
            consumers.setdefault(b, []).append(layer)
    new_layers = []
    for layer in g.layers:
        new_layers.append(layer)
        for b in layer.outputs:
            cs = consumers.get(b, [])
            if len(cs) <= 1:
                continue
            aliases = [f"{b}_split_{k}" for k in range(len(cs))]
            new_layers.append(
                NcnnLayer("Split", f"split_{b}", [b], aliases)
            )
            for k, c in enumerate(cs):
                c.inputs[c.inputs.index(b)] = aliases[k]
    return NcnnGraph(new_layers, g.magic if hasattr(g, "magic") else 2)


def test_executor_rdb_with_ncnn_splits(rng):
    """The real .param wraps every multi-consumer blob in a Split; interior
    Splits reference conv outputs the fused-RDB path never materializes, so
    the planner must absorb them with the block (regression: KeyError '774'
    on the real 4x_Valar_v1.param before the fix)."""
    from upscale_video_tpu.models.bin_loader import synthesize_weights
    from upscale_video_tpu.models.executor import (
        _plan_rdb_blocks, build_forward,
    )
    from upscale_video_tpu.models.zoo import make_rrdb_graph

    g = _insert_ncnn_splits(make_rrdb_graph(scale=4, num_rrdb=1))
    consumers = {}
    for i, layer in enumerate(g.layers):
        for b in layer.inputs:
            consumers.setdefault(b, []).append(i)
    blocks, absorbed = _plan_rdb_blocks(g, consumers)
    assert len(blocks) == 3
    assert any(name.startswith("split_") for name in absorbed)

    params = synthesize_weights(g, seed=0)
    ref_fwd = build_forward(g, compute_dtype=jnp.bfloat16)
    rdb_fwd = build_forward(g, compute_dtype=jnp.bfloat16, rdb_kernel=True)
    x = jnp.asarray(rng.uniform(0, 1, (1, 14, 18, 3)), jnp.float32)
    a = np.asarray(ref_fwd(params, x)).astype(np.float32)
    b = np.asarray(rdb_fwd(params, x)).astype(np.float32)
    np.testing.assert_allclose(a, b, atol=0.06)


def test_rdb_leak_guard(rng):
    """A dense block whose interior blob is consumed OUTSIDE the block must
    not be claimed (the fused kernel would leave that consumer's input
    unmaterialized)."""
    from upscale_video_tpu.models.executor import _plan_rdb_blocks
    from upscale_video_tpu.models.param_parser import NcnnLayer
    from upscale_video_tpu.models.zoo import make_rrdb_graph

    g = make_rrdb_graph(scale=4, num_rrdb=1)
    # find block 1's c1 conv output (32-ch leaky conv fed by the trunk)
    consumers = {}
    for i, layer in enumerate(g.layers):
        for b in layer.inputs:
            consumers.setdefault(b, []).append(i)
    baseline, _ = _plan_rdb_blocks(g, consumers)
    assert len(baseline) == 3
    c1_out = g.layers[
        [i for i, l in enumerate(g.layers)
         if l.type == "Convolution" and l.attr_i(0) == 32][0]
    ].outputs[0]
    g.layers.append(NcnnLayer("ReLU", "leak_probe", [c1_out], ["leaked"]))
    consumers = {}
    for i, layer in enumerate(g.layers):
        for b in layer.inputs:
            consumers.setdefault(b, []).append(i)
    blocks, absorbed = _plan_rdb_blocks(g, consumers)
    assert len(blocks) == 2  # the leaked block is declined
    assert "leak_probe" not in absorbed


def test_rdb_planner_rejects_non_same_geometry(rng):
    """A conv matching the block skeleton but with stride/dilation/pad
    outside the SAME/stride-1 class rdb_apply computes must NOT be claimed
    (it would be fused with the wrong semantics; the exact per-layer path
    handles it)."""
    from upscale_video_tpu.models.executor import _plan_rdb_blocks
    from upscale_video_tpu.models.zoo import make_rrdb_graph

    def consumers_of(g):
        out = {}
        for i, layer in enumerate(g.layers):
            for b in layer.inputs:
                out.setdefault(b, []).append(i)
        return out

    for attr, bad in ((3, 2), (2, 2), (4, 0)):  # stride, dilation, pad
        g = make_rrdb_graph(scale=4, num_rrdb=1)
        baseline, _ = _plan_rdb_blocks(g, consumers_of(g))
        assert len(baseline) == 3
        conv = next(l for l in g.layers
                    if l.type == "Convolution" and l.attr_i(0) == 32)
        conv.attrs[attr] = bad
        blocks, absorbed = _plan_rdb_blocks(g, consumers_of(g))
        assert len(blocks) == 2, f"attr {attr}={bad} not rejected"
        assert conv.name not in absorbed


@pytest.mark.skipif(
    not reference_models_available(), reason="reference zoo absent"
)
def test_real_valar_param_rdb_kernel():
    """The shipped ``auto`` path (rdb_kernel) on the REAL 1206-layer param:
    69 blocks (23 RRDB x 3) matched through the splitncnn bookkeeping, and
    the trace executes (regression for the interior-Split KeyError)."""
    import os

    from upscale_video_tpu.models.bin_loader import synthesize_weights
    from upscale_video_tpu.models.executor import (
        _plan_rdb_blocks, build_forward,
    )
    from upscale_video_tpu.models.param_parser import parse_param_file
    from tests.conftest import REFERENCE_MODELS

    g = parse_param_file(os.path.join(REFERENCE_MODELS, "4x_Valar_v1.param"))
    consumers = {}
    for i, layer in enumerate(g.layers):
        for b in layer.inputs:
            consumers.setdefault(b, []).append(i)
    blocks, absorbed = _plan_rdb_blocks(g, consumers)
    assert len(blocks) == 69
    assert any(name.startswith("splitncnn") for name in absorbed)
    params = synthesize_weights(g, seed=1, scale=0.01)
    fwd = build_forward(g, compute_dtype=jnp.bfloat16, rdb_kernel=True)
    x = np.random.default_rng(0).uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    y = np.asarray(fwd(params, x)).astype(np.float32)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(y).all()


def test_rdb_kernel_noop_on_compact(rng):
    """Compact graphs have no dense blocks: rdb_kernel must be a no-op."""
    from upscale_video_tpu.models.bin_loader import synthesize_weights
    from upscale_video_tpu.models.executor import build_forward
    from upscale_video_tpu.models.zoo import make_srvgg_graph

    g = make_srvgg_graph(scale=2, num_conv=2, num_feat=8)
    params = synthesize_weights(g, seed=0)
    a = build_forward(g, compute_dtype=jnp.bfloat16)(params, jnp.ones((1, 8, 8, 3)))
    b = build_forward(g, compute_dtype=jnp.bfloat16, rdb_kernel=True)(
        params, jnp.ones((1, 8, 8, 3))
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rdb_act5_and_scale(rng):
    x = jnp.asarray(rng.normal(0, 0.5, (16, 24, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    got = np.asarray(rdb_apply(
        x, ws, bs, tile_h=16, tile_w=24, act5=True, res_scale=1.0,
        interpret=True,
    )).astype(np.float32)
    want = np.asarray(
        _xla_rdb(x, ws, bs, act5=True, res_scale=1.0)
    ).astype(np.float32)
    # res_scale=1 amplifies the bf16 rounding of c5 vs the 0.2 default
    np.testing.assert_allclose(got, want, atol=0.2)


def test_tiled_engine_with_rdb_kernel(rng):
    """conv_impl=rdb composes with the tiled path (lax.map single-tile
    chunks; static unroll over the frame batch).

    2 RRDBs: with the full 23-block synthetic net the random (untrained,
    magnitude-exploding) weights amplify ordinary bf16 rounding into tens
    of u8 LSB for the XLA path vs itself too (PARITY.md: Valar-synth bf16
    is 34.7 dB vs the f32 oracle) — block count bounds compounding so the
    check pins the KERNEL, not synthetic-weight chaos."""
    from upscale_video_tpu.models.zoo import make_synthetic_rrdb_model
    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    def engine(impl):
        m = make_synthetic_rrdb_model(scale=4, num_rrdb=2)
        eng = ChainEngine(spec=ChainSpec(real_life=True), scale=4,
                          sr_model=m, tile=16, halo=4)
        m.rdb_kernel = impl == "rdb"
        return eng

    eng, ref = engine("rdb"), engine("xla")
    ref.sr_model.params = eng.sr_model.params
    x = rng.integers(0, 256, (1, 20, 24, 3), dtype=np.uint8)
    a = np.asarray(eng.step(x)).astype(np.int32)
    b = np.asarray(ref.step(x)).astype(np.int32)
    assert a.shape == b.shape == (1, 80, 96, 3)
    # same tiling geometry, bf16 kernels vs bf16 XLA: a few u8 LSB
    assert np.abs(a - b).max() <= 4


def test_tile_h_env_default(rng, monkeypatch):
    """UPSCALE_TPU_RDB_TILE_H sets the default tile height, so a
    geometry-specific tools/rdb_bench.py winner ships without a code
    change; an explicit tile_h always wins over the env."""
    x = jnp.asarray(rng.normal(0, 0.5, (32, 40, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    explicit = np.asarray(
        rdb_apply(x, ws, bs, tile_h=16, tile_w=24, interpret=True)
    )
    monkeypatch.setenv("UPSCALE_TPU_RDB_TILE_H", "16")
    via_env = np.asarray(
        rdb_apply(x, ws, bs, tile_w=24, interpret=True)
    )
    np.testing.assert_array_equal(explicit, via_env)
    monkeypatch.setenv("UPSCALE_TPU_RDB_TILE_H", "8")
    overridden = np.asarray(
        rdb_apply(x, ws, bs, tile_h=16, tile_w=24, interpret=True)
    )
    np.testing.assert_array_equal(explicit, overridden)


def test_auto_tile_h_exact_fit_policy():
    """Default tile_h prefers the largest measured-good height dividing
    the padded input exactly (round-4 hardware A/Bs: th=28 at 392 rows =
    1.92 ms/RDB vs th=32's 2.62; th=48 at 480 rows = 2.171 vs 2.462)."""
    from upscale_video_tpu.ops.rdb_pallas import auto_tile_h

    assert auto_tile_h(392) == 28   # shipped 1080p tiled geometry (14x28)
    assert auto_tile_h(480) == 48   # round-4 measured best at 480px (10x48)
    assert auto_tile_h(576) == 48   # 2x4-grid 1080p geometry (12x48)
    assert auto_tile_h(400) == 20
    assert auto_tile_h(16) == 16
    assert auto_tile_h(344) == 32   # no exact fit -> round-3 default


def test_tile_h_env_auto_matches_explicit(rng, monkeypatch):
    monkeypatch.setenv("UPSCALE_TPU_RDB_TILE_H", "auto")
    x = jnp.asarray(rng.normal(0, 0.5, (32, 40, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    via_auto = np.asarray(rdb_apply(x, ws, bs, tile_w=24, interpret=True))
    explicit = np.asarray(
        rdb_apply(x, ws, bs, tile_h=32, tile_w=24, interpret=True)
    )
    np.testing.assert_array_equal(via_auto, explicit)
    monkeypatch.setenv("UPSCALE_TPU_RDB_TILE_H", "banana")
    with pytest.raises(ValueError, match="UPSCALE_TPU_RDB_TILE_H"):
        rdb_apply(x, ws, bs, tile_w=24, interpret=True)


def test_vmem_estimate_rejects_observed_oom_geometry():
    """The round-4 hardware failure (th=56/tw=512 at 392x512: 129.7M of
    128M VMEM after an 18-minute compile) must be over the estimator's
    budget, while every measured-good config stays under it."""
    from upscale_video_tpu.ops import rdb_pallas as rp

    assert rp.est_vmem_bytes(56, 512) > rp.VMEM_LIMIT_BYTES
    # round-5 boundary calibration (VERDICT #4): the two largest ADMITTED
    # estimates (th=52/tw=528 at 110.0M, th=56/tw=488 at 108.7M) compiled
    # clean on hardware (.hwlogs/vmem_admit_*_r5.log) — a refit of the
    # spill factor must keep admitting them
    for th, tw in [(32, 512), (32, 256), (16, 24), (28, 512),
                   (48, 512), (52, 528), (56, 488)]:
        assert rp.est_vmem_bytes(th, tw) <= rp.VMEM_LIMIT_BYTES, (th, tw)


def test_vmem_clamp_warns_and_matches(rng, monkeypatch):
    """An over-budget tile_h is clamped down (with a warning) instead of
    compiling into RESOURCE_EXHAUSTED; the clamped kernel's output equals
    the explicitly-small-tile run."""
    from upscale_video_tpu.ops import rdb_pallas as rp

    # a shape no other test traces: the clamp runs at trace time, so a
    # jit-cache hit on a previously-traced signature would skip it
    x = jnp.asarray(rng.normal(0, 0.5, (32, 48, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    small = np.asarray(
        rdb_apply(x, ws, bs, tile_h=8, tile_w=24, interpret=True)
    )
    # shrink the budget so th=16 estimates over it but th=8 fits (the
    # kernel widens tw to the full 48-wide input)
    lim = rp.est_vmem_bytes(8, 48)
    monkeypatch.setattr(rp, "VMEM_LIMIT_BYTES", lim)
    assert rp.est_vmem_bytes(16, 48) > lim
    with pytest.warns(UserWarning, match="clamping tile_h to 8"):
        clamped = np.asarray(
            rdb_apply(x, ws, bs, tile_h=16, tile_w=24, interpret=True)
        )
    np.testing.assert_array_equal(small, clamped)


def test_vmem_limit_env_override(monkeypatch):
    """UPSCALE_TPU_RDB_VMEM_LIMIT overrides the budget (the boundary
    experiment knob): a raised limit admits a normally-clamped tile."""
    from upscale_video_tpu.ops import rdb_pallas as rp

    assert rp.vmem_limit_bytes() == rp.VMEM_LIMIT_BYTES
    monkeypatch.setenv("UPSCALE_TPU_RDB_VMEM_LIMIT", str(134217728))
    assert rp.vmem_limit_bytes() == 134217728
    # th=56/tw=512 is guard-rejected at the default 110M but admitted
    # at the chip's 128M (est 119.4M) — geometry resolution must now
    # keep th=56 instead of clamping
    th, tw, *_ = rp.canvas_geometry(56, 496, tile_h=56, tile_w=512)
    assert th == 56


def test_canvas_chain_bit_matches_plain(rng):
    """Canvas-resident chaining (embed once, N kernels canvas-to-canvas,
    extract once) is bit-identical to N plain rdb_apply calls — the
    executor's round-4 glue-elimination path."""
    from upscale_video_tpu.ops.rdb_pallas import (
        canvas_geometry, rdb_apply_canvas, rdb_canvas_embed,
        rdb_canvas_extract,
    )

    h, w = 27, 41
    geom = canvas_geometry(h, w, 16, 32)
    x = jnp.asarray(rng.normal(0, 0.5, (h, w, NF)), jnp.bfloat16)
    ws1, bs1 = _make_rdb_weights(rng)
    ws2, bs2 = _make_rdb_weights(rng)
    skw = jnp.asarray(rng.normal(0, 0.05, (1, 1, NF, GC)), jnp.float32)
    skb = jnp.asarray(rng.normal(0, 0.02, (GC,)), jnp.float32)
    kw = dict(skip_w=skw, skip_b=skb, add_c2_to_c4=True)

    a1 = rdb_apply(x, ws1, bs1, tile_h=16, tile_w=32, interpret=True, **kw)
    a2 = rdb_apply(jnp.asarray(a1, jnp.bfloat16), ws2, bs2, tile_h=16,
                   tile_w=32, interpret=True)

    buf = rdb_canvas_embed(x, geom)
    buf = rdb_apply_canvas(buf, ws1, bs1, geom, h, w, interpret=True, **kw)
    buf = rdb_apply_canvas(buf, ws2, bs2, geom, h, w, interpret=True)
    b2 = rdb_canvas_extract(buf, h, w)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))


def test_canvas_poisoned_ring_is_masked(rng):
    """Everything outside the true-frame data region of an input canvas
    (halo ring, grid padding, lanes 64..127) is dead: NaN-poisoning it
    must not change the extracted center — the invariant that makes the
    unwritten ring of a canvas-mode OUTPUT safe to chain."""
    from upscale_video_tpu.ops.rdb_pallas import (
        HALO, canvas_geometry, rdb_apply_canvas, rdb_canvas_embed,
        rdb_canvas_extract,
    )

    h, w = 27, 41
    geom = canvas_geometry(h, w, 16, 32)
    x = jnp.asarray(rng.normal(0, 0.5, (h, w, NF)), jnp.bfloat16)
    ws, bs = _make_rdb_weights(rng)
    buf = np.asarray(rdb_canvas_embed(x, geom)).copy()
    pois = buf.copy()
    mask = np.zeros_like(pois, dtype=bool)
    mask[HALO:HALO + h, 8:8 + w, :NF] = True
    pois[~mask] = np.nan
    a = np.asarray(rdb_canvas_extract(rdb_apply_canvas(
        jnp.asarray(buf), ws, bs, geom, h, w, interpret=True), h, w))
    b = np.asarray(rdb_canvas_extract(rdb_apply_canvas(
        jnp.asarray(pois), ws, bs, geom, h, w, interpret=True), h, w))
    assert np.isfinite(b.astype(np.float32)).all()
    np.testing.assert_array_equal(a, b)


def test_executor_canvas_chain_multi_rrdb(rng):
    """Two RRDBs: the combine Eltwise's canvas must feed the next RRDB's
    first RDB straight from the cache (one embed for the whole trunk),
    and the result still matches the XLA scatter path."""
    from upscale_video_tpu.models.bin_loader import synthesize_weights
    from upscale_video_tpu.models.executor import build_forward
    from upscale_video_tpu.models.zoo import make_rrdb_graph

    g = make_rrdb_graph(scale=4, num_rrdb=2)
    params = synthesize_weights(g, seed=1)
    ref_fwd = build_forward(g, compute_dtype=jnp.bfloat16)
    rdb_fwd = build_forward(g, compute_dtype=jnp.bfloat16, rdb_kernel=True)
    x = jnp.asarray(rng.uniform(0, 1, (1, 18, 22, 3)), jnp.float32)
    a = np.asarray(ref_fwd(params, x)).astype(np.float32)
    b = np.asarray(rdb_fwd(params, x)).astype(np.float32)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=0.06)


def test_executor_canvas_chain_batched_frames(rng):
    """Leading-dim batches >1 (the UNTILED kernel path) run the canvas
    stack through lax.map — program text once regardless of depth — and
    must match the vectorized XLA scatter oracle sample for sample.
    (The tiled product path vmaps frames instead; the round-5 2.2 GB
    depth-4 executable reproduced under this rewrite, so the size lives
    in the vmapped lowering, not per-frame trace duplication — NOTES.)"""
    from upscale_video_tpu.models.bin_loader import synthesize_weights
    from upscale_video_tpu.models.executor import build_forward
    from upscale_video_tpu.models.zoo import make_rrdb_graph

    g = make_rrdb_graph(scale=4, num_rrdb=2)
    params = synthesize_weights(g, seed=2)
    ref_fwd = build_forward(g, compute_dtype=jnp.bfloat16)
    rdb_fwd = build_forward(g, compute_dtype=jnp.bfloat16, rdb_kernel=True)
    x = jnp.asarray(rng.uniform(0, 1, (3, 18, 22, 3)), jnp.float32)
    a = np.asarray(ref_fwd(params, x)).astype(np.float32)
    b = np.asarray(rdb_fwd(params, x)).astype(np.float32)
    assert a.shape == b.shape == (3, 72, 88, 3)
    np.testing.assert_allclose(a, b, atol=0.06)
    # the mapped batch must equal running each sample alone (no
    # cross-sample mixing through the canvas cache)
    solo = np.asarray(rdb_fwd(params, x[1:2])).astype(np.float32)
    np.testing.assert_allclose(b[1:2], solo, atol=1e-5)


def test_executor_canvas_fused_combine_batched(rng, monkeypatch):
    """The refuted FUSE_COMBINE opt-in's (bufs, res) pair rides the same
    lax.map at batch >1 and still matches the scatter oracle."""
    from upscale_video_tpu.models.bin_loader import synthesize_weights
    from upscale_video_tpu.models.executor import build_forward
    from upscale_video_tpu.models.zoo import make_rrdb_graph

    monkeypatch.setenv("UPSCALE_TPU_RDB_FUSE_COMBINE", "1")
    g = make_rrdb_graph(scale=4, num_rrdb=2)
    params = synthesize_weights(g, seed=3)
    ref_fwd = build_forward(g, compute_dtype=jnp.bfloat16)
    rdb_fwd = build_forward(g, compute_dtype=jnp.bfloat16, rdb_kernel=True)
    x = jnp.asarray(rng.uniform(0, 1, (2, 18, 22, 3)), jnp.float32)
    a = np.asarray(ref_fwd(params, x)).astype(np.float32)
    b = np.asarray(rdb_fwd(params, x)).astype(np.float32)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=0.06)


def test_fused_res_combine_bit_matches_separate(rng):
    """comb_self*rdb(buf) + comb_res*res fused into the kernel epilogue
    is bit-identical to the canvas kernel followed by the executor's
    canvas-eltwise arithmetic (per-operand bf16 product rounding)."""
    from upscale_video_tpu.ops.rdb_pallas import (
        canvas_geometry, rdb_apply_canvas, rdb_canvas_embed,
        rdb_canvas_extract,
    )

    h, w = 27, 41
    geom = canvas_geometry(h, w, 16, 32)
    x = jnp.asarray(rng.normal(0, 0.5, (h, w, NF)), jnp.bfloat16)
    ws, bs = _make_rdb_weights(rng)
    buf = rdb_canvas_embed(x, geom)
    res = rdb_canvas_embed(
        jnp.asarray(rng.normal(0, 0.5, (h, w, NF)), jnp.bfloat16), geom)

    sep = rdb_apply_canvas(buf, ws, bs, geom, h, w, interpret=True)
    sep = sep * jnp.bfloat16(0.2) + res * jnp.bfloat16(1.0)
    fus = rdb_apply_canvas(buf, ws, bs, geom, h, w, interpret=True,
                           res_canvas=res, comb_self=0.2, comb_res=1.0)
    np.testing.assert_array_equal(
        np.asarray(rdb_canvas_extract(sep, h, w)),
        np.asarray(rdb_canvas_extract(fus, h, w)))


def test_executor_fuses_rrdb_combine(rng, monkeypatch):
    """The executor's lookahead folds the RRDB combine Eltwise into the
    third RDB kernel (sole-consumer, live canvas, sum op) and the result
    still matches the XLA path.  Opt-in: hardware-refuted as a default
    (.hwlogs/rdb_rrdb_ab_r4s3.log, NOTES.md round 4)."""
    from upscale_video_tpu.models.bin_loader import synthesize_weights
    from upscale_video_tpu.models.executor import build_forward
    from upscale_video_tpu.models.zoo import make_rrdb_graph

    monkeypatch.setenv("UPSCALE_TPU_RDB_FUSE_COMBINE", "1")
    g = make_rrdb_graph(scale=4, num_rrdb=1)
    params = synthesize_weights(g, seed=3)
    ref_fwd = build_forward(g, compute_dtype=jnp.bfloat16)
    rdb_fwd = build_forward(g, compute_dtype=jnp.bfloat16, rdb_kernel=True)
    x = jnp.asarray(rng.uniform(0, 1, (1, 14, 19, 3)), jnp.float32)
    a = np.asarray(ref_fwd(params, x)).astype(np.float32)
    b = np.asarray(rdb_fwd(params, x)).astype(np.float32)
    np.testing.assert_allclose(a, b, atol=0.06)


@pytest.mark.parametrize("im2col", ["row3", "row3h", "pack12"])
def test_rdb_im2col_variants_match(rng, im2col):
    """The row-grouped im2col formulations (3 accumulated K=3*cs dots per
    stage from ONE column-shift buffer — the round-5 VPU lever) compute
    the same taps as patch9's single K=9*cs dot; only the f32 partial-sum
    order differs, inside the bf16 rounding budget."""
    h, w_ = 19, 37
    x = jnp.asarray(rng.normal(0, 0.5, (h, w_, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    kw = dict(tile_h=16, tile_w=24, interpret=True)
    base = np.asarray(
        rdb_apply(x, ws, bs, im2col="patch9", **kw)).astype(np.float32)
    got = np.asarray(
        rdb_apply(x, ws, bs, im2col=im2col, **kw)).astype(np.float32)
    # one bf16 LSB of slack: the 3-dot partial sums reassociate f32
    # adds, and a value sitting on a rounding boundary may flip a ulp
    # (observed: 1/44992 elements at 0.03125 after 5 chained stages)
    np.testing.assert_allclose(got, base, atol=0.04)
    want = np.asarray(_xla_rdb(x, ws, bs)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.05)


@pytest.mark.parametrize("im2col", ["row3", "row3h", "pack12"])
def test_rdb_im2col_valar_variant(rng, im2col):
    """Valar hooks (1x1 x-skip into c2, c2-into-c4) under the row-grouped
    im2col modes."""
    h, w_ = 20, 28
    x = jnp.asarray(rng.normal(0, 0.5, (h, w_, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    skip_w = jnp.asarray(rng.normal(0, 0.1, (1, 1, NF, GC)), jnp.float32)
    got = np.asarray(rdb_apply(
        x, ws, bs, tile_h=16, tile_w=24, skip_w=skip_w,
        add_c2_to_c4=True, interpret=True, im2col=im2col,
    )).astype(np.float32)
    want = np.asarray(_xla_valar_rdb(x, ws, bs, skip_w)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.06)


def test_rdb_im2col_default_is_patch9(monkeypatch):
    """Decision record: patch9 stays the default im2col formulation.

    The round-5 reps=5 warm-cache head-to-head at the shipped
    576x512/th=48 geometry measured patch9 2.62 ms/RDB vs row3h 2.82,
    row3 3.05, pack12 2.98 (.hwlogs/rdb_p2b_combo_r5.log, NOTES r5s4) —
    every restructuring of the patch copies lost on hardware.  A flip
    of this default must come with a new same-session A/B."""
    monkeypatch.delenv("UPSCALE_TPU_RDB_IM2COL", raising=False)
    from upscale_video_tpu.ops.rdb_pallas import resolve_im2col

    assert resolve_im2col(None) == "patch9"


def test_rdb_im2col_env_knob(rng, monkeypatch):
    """UPSCALE_TPU_RDB_IM2COL selects the formulation (a hardware winner
    ships without a code change); bad values fail loudly."""
    x = jnp.asarray(rng.normal(0, 0.5, (19, 37, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    kw = dict(tile_h=16, tile_w=24, interpret=True)
    explicit = np.asarray(rdb_apply(x, ws, bs, im2col="row3h", **kw))
    monkeypatch.setenv("UPSCALE_TPU_RDB_IM2COL", "row3h")
    via_env = np.asarray(rdb_apply(x, ws, bs, **kw))
    np.testing.assert_array_equal(explicit, via_env)
    monkeypatch.setenv("UPSCALE_TPU_RDB_IM2COL", "banana")
    with pytest.raises(ValueError, match="UPSCALE_TPU_RDB_IM2COL"):
        rdb_apply(x, ws, bs, **kw)


@pytest.mark.parametrize("mode", ["row3h", "pack12"])
def test_rdb_canvas_chain_im2col_variant(rng, mode):
    """The canvas-resident chain (the product '-m r' path) accepts the
    im2col modes and matches the plain-call chain."""
    from upscale_video_tpu.ops.rdb_pallas import (
        canvas_geometry, rdb_apply_canvas, rdb_canvas_embed,
        rdb_canvas_extract,
    )

    h, w = 27, 41
    geom = canvas_geometry(h, w, 16, 32)
    x = jnp.asarray(rng.normal(0, 0.5, (h, w, NF)), jnp.bfloat16)
    ws1, bs1 = _make_rdb_weights(rng)
    ws2, bs2 = _make_rdb_weights(rng)

    a1 = rdb_apply(x, ws1, bs1, tile_h=16, tile_w=32, interpret=True,
                   im2col=mode)
    a2 = rdb_apply(jnp.asarray(a1, jnp.bfloat16), ws2, bs2, tile_h=16,
                   tile_w=32, interpret=True, im2col=mode)

    buf = rdb_canvas_embed(x, geom)
    buf = rdb_apply_canvas(buf, ws1, bs1, geom, h, w, interpret=True,
                           im2col=mode)
    buf = rdb_apply_canvas(buf, ws2, bs2, geom, h, w, interpret=True,
                           im2col=mode)
    b2 = rdb_canvas_extract(buf, h, w)
    np.testing.assert_array_equal(np.asarray(a1, np.float32).dtype,
                                  np.float32)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))


def test_rdb_frame_mask_ablation_knob(rng):
    """frame_mask=False (the rdb_bench ablation) still runs and agrees on
    the INTERIOR (frame borders are where the mask matters)."""
    h, w_ = 32, 40
    x = jnp.asarray(rng.normal(0, 0.5, (h, w_, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    kw = dict(tile_h=16, tile_w=24, interpret=True)
    a = np.asarray(rdb_apply(x, ws, bs, frame_mask=True, **kw),
                   dtype=np.float32)
    b = np.asarray(rdb_apply(x, ws, bs, frame_mask=False, **kw),
                   dtype=np.float32)
    np.testing.assert_allclose(a[6:-6, 6:-6], b[6:-6, 6:-6], atol=1e-6)


@pytest.mark.parametrize("hw,tile", [((32, 24), (16, 24)),
                                     ((32, 20), (16, 24)),
                                     ((48, 37), (16, 40))])
def test_rdb_slab_mask_bit_exact(rng, hw, tile):
    """The slab frame mask (static column pad + 4-row edge-strip row
    masking, the round-5 mask-cost lever) is BIT-exact vs the iota mask
    on exact-fit single-column grids, including valid_w < tw."""
    h, w_ = hw
    x = jnp.asarray(rng.normal(0, 0.5, (h, w_, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    kw = dict(tile_h=tile[0], tile_w=tile[1], interpret=True)
    a = np.asarray(rdb_apply(x, ws, bs, frame_mask="iota", **kw))
    b = np.asarray(rdb_apply(x, ws, bs, frame_mask="slab", **kw))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("im2col", ["patch9", "row3h", "pack12"])
def test_rdb_slab_mask_valar_variant(rng, im2col):
    """slab x im2col cross-product on the Valar dense-block variant
    (1x1 x-skip into c2, c2-into-c4): matches the XLA oracle."""
    h, w_ = 32, 28
    x = jnp.asarray(rng.normal(0, 0.5, (h, w_, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    skip_w = jnp.asarray(rng.normal(0, 0.1, (1, 1, NF, GC)), jnp.float32)
    got = np.asarray(rdb_apply(
        x, ws, bs, tile_h=16, tile_w=32, skip_w=skip_w,
        add_c2_to_c4=True, interpret=True, im2col=im2col,
        frame_mask="slab",
    )).astype(np.float32)
    want = np.asarray(_xla_valar_rdb(x, ws, bs, skip_w)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.06)


def test_rdb_slab_mask_ragged_fallback(rng):
    """An explicit slab request on a ragged grid (out-of-frame rows can
    reach past the edge strips there) warns and falls back to iota."""
    h, w_ = 30, 24  # gy=2, 2*16=32 != 30 -> ragged
    x = jnp.asarray(rng.normal(0, 0.5, (h, w_, NF)), jnp.float32)
    ws, bs = _make_rdb_weights(rng)
    kw = dict(tile_h=16, tile_w=24, interpret=True)
    a = np.asarray(rdb_apply(x, ws, bs, frame_mask="iota", **kw))
    with pytest.warns(UserWarning, match="slab frame mask"):
        b = np.asarray(rdb_apply(x, ws, bs, frame_mask="slab", **kw))
    np.testing.assert_array_equal(a, b)


def test_rdb_slab_mask_env_and_canvas(rng, monkeypatch):
    """UPSCALE_TPU_RDB_MASK engages slab on the canvas-chain path (the
    product '-m r' route) without a code change; auto picks slab only on
    exact-fit single-column grids."""
    from upscale_video_tpu.ops.rdb_pallas import (
        canvas_geometry, rdb_apply_canvas, rdb_canvas_embed,
        rdb_canvas_extract, resolve_mask_mode,
    )

    assert resolve_mask_mode("auto", 16, 24, 32, 24) == "slab"
    assert resolve_mask_mode("auto", 16, 24, 30, 24) == "iota"
    assert resolve_mask_mode("auto", 16, 24, 32, 50) == "iota"  # gx=3

    h, w = 32, 24
    geom = canvas_geometry(h, w, 16, 32)
    x = jnp.asarray(rng.normal(0, 0.5, (h, w, NF)), jnp.bfloat16)
    ws1, bs1 = _make_rdb_weights(rng)
    ws2, bs2 = _make_rdb_weights(rng)

    def chain():
        buf = rdb_canvas_embed(x, geom)
        buf = rdb_apply_canvas(buf, ws1, bs1, geom, h, w, interpret=True)
        buf = rdb_apply_canvas(buf, ws2, bs2, geom, h, w, interpret=True)
        return np.asarray(rdb_canvas_extract(buf, h, w))

    base = chain()
    monkeypatch.setenv("UPSCALE_TPU_RDB_MASK", "slab")
    np.testing.assert_array_equal(base, chain())
    monkeypatch.setenv("UPSCALE_TPU_RDB_MASK", "banana")
    with pytest.raises(ValueError, match="frame-mask mode"):
        chain()

"""Pallas fused conv3x3 kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_video_tpu.models.bin_loader import synthesize_weights
from upscale_video_tpu.models.executor import build_forward, _plan_pallas_fusion
from upscale_video_tpu.models.zoo import make_srvgg_graph
from upscale_video_tpu.ops.conv_pallas import (
    ACT_LEAKY,
    ACT_NONE,
    ACT_PRELU,
    ACT_RELU,
    conv3x3_fused,
)


def _xla_conv(x, w, b=None, precision=jax.lax.Precision.HIGHEST):
    y = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )[0]
    return y if b is None else y + b


@pytest.mark.parametrize("act", [ACT_NONE, ACT_PRELU, ACT_LEAKY, ACT_RELU])
def test_matches_xla(rng, act):
    H, W, C = 20, 40, 8
    x = jnp.asarray(rng.uniform(0, 1, (H, W, C)).astype(np.float32),
                    dtype=jnp.bfloat16).astype(jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C)).astype(np.float32),
                    dtype=jnp.bfloat16).astype(jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (C,)).astype(np.float32))
    if act == ACT_LEAKY:
        s = jnp.asarray([0.2], jnp.float32)
    else:
        s = jnp.asarray(rng.uniform(0.1, 0.3, (C,)).astype(np.float32))
    got = np.asarray(conv3x3_fused(
        x, w, b, s, act=act, tile_h=8, tile_w=16, interpret=True,
        out_dtype=jnp.float32,
    ))
    ref = _xla_conv(x, w, b)
    if act == ACT_PRELU:
        ref = jnp.where(ref >= 0, ref, ref * s)
    elif act == ACT_LEAKY:
        ref = jnp.where(ref >= 0, ref, ref * 0.2)
    elif act == ACT_RELU:
        ref = jnp.maximum(ref, 0)
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)


def test_ragged_geometry(rng):
    """Frame not a multiple of the tile grid pads with zeros and crops —
    identical to SAME conv semantics at the borders."""
    H, W, C = 19, 37, 8
    x = jnp.asarray(rng.uniform(0, 1, (H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, 4)).astype(np.float32))
    got = np.asarray(conv3x3_fused(
        x, w, act=ACT_NONE, tile_h=8, tile_w=16, interpret=True,
        out_dtype=jnp.float32,
    ))
    xb = x.astype(jnp.bfloat16).astype(jnp.float32)
    wb = w.astype(jnp.bfloat16).astype(jnp.float32)
    ref = np.asarray(_xla_conv(xb, wb))
    assert got.shape == (19, 37, 4)
    np.testing.assert_allclose(got, ref, atol=1e-5)


class TestFusionPlan:
    def test_compact_plan(self):
        g = make_srvgg_graph(scale=2, num_conv=2, num_feat=64)
        plans, absorbed = _plan_pallas_fusion(g)
        # the whole conv body (incl. the 3->64 input conv) runs as ONE
        # bordered chain — zero host glue between layers — and the SRVGG
        # tail (up conv + shuffle + interp skip + add) fuses INTO the
        # chain plan, reading the ring layout directly
        assert set(plans) == {"conv_0"}
        plan = plans["conv_0"]
        assert plan["kind"] == "chain"
        names = [i["name"] for i in plan["items"]]
        assert names == ["conv_0", "conv_1", "conv_2"]
        assert [i["prelu"] for i in plan["items"]] == [
            "prelu_0", "prelu_1", "prelu_2"
        ]
        assert plan["tail"]["conv"] == "conv_up"
        assert plan["tail"]["scale"] == 2
        assert plan["out"] == "output"
        assert absorbed == {"prelu_0", "prelu_1", "prelu_2", "conv_1",
                            "conv_2", "conv_up", "shuffle", "skip_up",
                            "residual"}

    def test_skinny_channels_chain_without_tail(self):
        """Narrow nets still chain (lane padding is paid once), but the
        tail kernel needs a solo-profitable up conv, so shuffle/skip stay
        on XLA."""
        g = make_srvgg_graph(scale=2, num_conv=2, num_feat=8)
        plans, absorbed = _plan_pallas_fusion(g)
        assert set(plans) == {"conv_0"}
        assert plans["conv_0"]["kind"] == "chain"
        names = [i["name"] for i in plans["conv_0"]["items"]]
        # conv_up (8->12ch) joins the chain; shuffle consumes its output
        assert names == ["conv_0", "conv_1", "conv_2", "conv_up"]
        assert "shuffle" not in absorbed

    def test_forward_matches_xla_path(self, rng):
        g = make_srvgg_graph(scale=2, num_conv=2, num_feat=64)
        params = synthesize_weights(g, seed=3)
        x = rng.uniform(0, 1, (1, 16, 24, 3)).astype(np.float32)
        f_xla = build_forward(g, compute_dtype=jnp.bfloat16)
        f_pal = build_forward(g, compute_dtype=jnp.bfloat16, pallas_conv=True)
        y1 = np.asarray(f_xla(params, x)).astype(np.float32)
        y2 = np.asarray(f_pal(params, x)).astype(np.float32)
        np.testing.assert_allclose(y1, y2, atol=2e-2)  # bf16 reassociation

    def test_frames_contract_matches(self, rng):
        """emit_frames=True: the u8 epilogue fused into the Pallas tail
        must agree with the XLA path's epilogue (uint8 RGB, <=1 lsb)."""
        g = make_srvgg_graph(scale=2, num_conv=2, num_feat=64)
        params = synthesize_weights(g, seed=3)
        x = rng.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)
        f_xla = build_forward(g, compute_dtype=jnp.bfloat16, emit_frames=True)
        f_pal = build_forward(g, compute_dtype=jnp.bfloat16, pallas_conv=True,
                              emit_frames=True)
        y1 = np.asarray(f_xla(params, x))
        y2 = np.asarray(f_pal(params, x))
        assert y1.dtype == y2.dtype == np.uint8
        assert y1.shape == y2.shape == (2, 32, 48, 3)
        assert np.abs(y1.astype(int) - y2.astype(int)).max() <= 1


def test_conv_impl_auto_selection():
    """auto: XLA convs for both families (round-2 A/B: the dense-scatter
    rewrite makes XLA the Valar winner at 32.5 ms/192px-tile vs 40.8 for
    the round-1 Pallas path; mixed Pallas+scatter regresses 4x)."""
    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    compact = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                                conv_impl="auto")
    assert compact.sr_model.pallas_conv is False
    valar = ChainEngine.build(ChainSpec.parse("r"), 2, synthetic=True,
                              conv_impl="auto")
    assert valar.sr_model.pallas_conv is False
    assert valar.scale == 4
    # the Valar stand-in must be architecture-faithful (RRDB, not Compact)
    assert valar.sr_model.graph.count_types()["Concat"] == 276


def test_build_wires_pallas_and_tiling():
    """ChainEngine.build must deliver conv_impl='pallas' + tile settings to
    the model (the flag plumbing the numeric test below bypasses), and the
    documented f32 downgrade must NOT fire in bf16."""
    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    eng = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                            compute_dtype=jnp.bfloat16, conv_impl="pallas",
                            tile=16, halo=18)
    assert eng.sr_model.pallas_conv
    assert (eng.tile, eng.halo) == (16, 18)
    assert eng.kernel_impl == "pallas"
    assert eng.planar_scale is None  # pallas path fuses its own tail


def test_tiled_engine_with_pallas_convs(rng):
    """tile_size + conv_impl=pallas (the HBM-bounded Valar path at high
    resolutions): must match the whole-frame XLA engine away from borders."""
    from upscale_video_tpu.models.zoo import make_synthetic_model
    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    # small model (4 convs, 32 feat): interpret-mode Pallas over tiles is
    # ~10x the cost of the ops under test at full synthetic size
    def small():
        return make_synthetic_model(num_conv=3, num_feat=32,
                                    compute_dtype=jnp.bfloat16)

    ref = ChainEngine(spec=ChainSpec(), scale=2, sr_model=small())
    tiled = ChainEngine(spec=ChainSpec(), scale=2, sr_model=small(),
                        tile=16, halo=18, kernel_impl="pallas")
    tiled.sr_model.pallas_conv = True
    frames = rng.integers(0, 256, (1, 40, 48, 3), dtype=np.uint8)
    a = ref.process(frames)
    b = tiled.process(frames)
    m = 2 * 18
    diff = np.abs(a[:, m:-m, m:-m].astype(int) - b[:, m:-m, m:-m].astype(int))
    assert diff.max() <= 2  # interior equal up to bf16+uint8 rounding

"""Shuffle-planar output contract (models/executor.py:_planar_tail_u8).

The device program can skip the SRVGG tail's pixel-shuffle interleave —
measured as ~6.5 ms/frame of tile-boundary-hostile relayout at 1080p->4K
(bf16; 14 ms in uint8) — by emitting uint8 ``(N, H, W, 3*s*s)`` planes;
the host interleaves on the sink thread (ops/pixel.planar_to_frames).
Parity contract: identical pixels in f32; <=1 u8 LSB in bf16 (XLA's
excess-precision pass may elide the f32->bf16->f32 convert pair around
the skip add differently between the two formulations).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from upscale_video_tpu.models.bin_loader import synthesize_weights
from upscale_video_tpu.models.executor import build_forward
from upscale_video_tpu.models.zoo import make_srvgg_graph
from upscale_video_tpu.ops.pixel import model_to_frames, planar_to_frames
from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec


def _shuffle_ref(p: np.ndarray, s: int) -> np.ndarray:
    """Independent numpy pixel-shuffle of an (i, j, c)-ordered planar map."""
    h, w, c = p.shape
    co = c // (s * s)
    out = np.zeros((h * s, w * s, co), p.dtype)
    for i in range(s):
        for j in range(s):
            out[i::s, j::s, :] = p[:, :, (i * s + j) * co:(i * s + j + 1) * co]
    return out


def test_planar_to_frames_matches_loop_reference(rng):
    for s in (2, 4):
        p = rng.integers(0, 255, (5, 7, 3 * s * s)).astype(np.uint8)
        np.testing.assert_array_equal(planar_to_frames(p, s), _shuffle_ref(p, s))
    # batched form
    p = rng.integers(0, 255, (2, 5, 7, 12)).astype(np.uint8)
    got = planar_to_frames(p, 2)
    assert got.shape == (2, 10, 14, 3)
    np.testing.assert_array_equal(got[1], _shuffle_ref(p[1], 2))
    # batched form must fill a caller-provided buffer (the hot-path
    # contract: AsyncSink reuses one buffer to avoid per-frame allocs)
    out = np.zeros((2, 10, 14, 3), np.uint8)
    ret = planar_to_frames(p, 2, out=out)
    assert ret is out
    np.testing.assert_array_equal(out[0], _shuffle_ref(p[0], 2))
    np.testing.assert_array_equal(out[1], _shuffle_ref(p[1], 2))


class TestExecutorPlanarTail:
    @pytest.mark.parametrize("scale", [2, 4])
    @pytest.mark.parametrize("order", ["bgr", "rgb"])
    def test_f32_bit_identical_to_standard_emit(self, rng, scale, order):
        g = make_srvgg_graph(scale=scale, num_conv=2, num_feat=16)
        params = synthesize_weights(g, seed=3)
        x = rng.uniform(0, 1, (2, 8, 10, 3)).astype(np.float32)
        f_std = build_forward(g, compute_dtype=jnp.float32, emit_frames=True,
                              channel_order=order)
        f_pl = build_forward(g, compute_dtype=jnp.float32, emit_frames=True,
                             channel_order=order, planar_tail=True)
        assert f_std.planar_scale is None
        assert f_pl.planar_scale == scale
        y_std = np.asarray(f_std(params, x))
        y_pl = np.asarray(f_pl(params, x))
        assert y_pl.shape == (2, 8, 10, 3 * scale * scale)
        assert y_pl.dtype == np.uint8
        np.testing.assert_array_equal(planar_to_frames(y_pl, scale), y_std)

    def test_bf16_within_one_lsb(self, rng):
        g = make_srvgg_graph(scale=2, num_conv=2, num_feat=16)
        params = synthesize_weights(g, seed=3)
        x = rng.uniform(0, 1, (1, 8, 10, 3)).astype(np.float32)
        f_std = build_forward(g, compute_dtype=jnp.bfloat16, emit_frames=True)
        f_pl = build_forward(g, compute_dtype=jnp.bfloat16, emit_frames=True,
                             planar_tail=True)
        y_std = np.asarray(f_std(params, x)).astype(int)
        y_il = planar_to_frames(np.asarray(f_pl(params, x)), 2).astype(int)
        assert np.abs(y_std - y_il).max() <= 1

    def test_planar_matches_plain_forward_epilogue(self, rng):
        """planar path == model_to_frames(plain forward) in f32 (the
        no-emit forward is the numpy-oracle-tested ground truth)."""
        g = make_srvgg_graph(scale=2, num_conv=2, num_feat=16)
        params = synthesize_weights(g, seed=5)
        x = rng.uniform(0, 1, (1, 8, 10, 3)).astype(np.float32)
        f_plain = build_forward(g, compute_dtype=jnp.float32)
        f_pl = build_forward(g, compute_dtype=jnp.float32, emit_frames=True,
                             planar_tail=True)
        want = np.asarray(model_to_frames(f_plain(params, x)))
        got = planar_to_frames(np.asarray(f_pl(params, x)), 2)
        np.testing.assert_array_equal(got, want)

    def test_pallas_path_declines_planar(self):
        g = make_srvgg_graph(scale=2, num_conv=2, num_feat=64)
        f = build_forward(g, compute_dtype=jnp.bfloat16, emit_frames=True,
                          planar_tail=True, pallas_conv=True)
        assert f.planar_scale is None


class TestEnginePlanar:
    def test_planar_scale_and_fallbacks(self):
        eng = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True)
        assert eng.planar_scale == 2
        # Valar's Interp-based tail doesn't match the SRVGG pattern
        assert ChainEngine.build(
            ChainSpec.parse("r"), 2, synthetic=True
        ).planar_scale is None
        # tiled path keeps the full-frame contract
        assert ChainEngine.build(
            ChainSpec.parse(None), 2, synthetic=True, tile=8
        ).planar_scale is None

    def test_planar_step_matches_step(self, rng):
        x = rng.integers(0, 255, (2, 8, 12, 3)).astype(np.uint8)
        for models in (None, "a,n=3"):
            eng = ChainEngine.build(
                ChainSpec.parse(models), 2, synthetic=True,
                compute_dtype=jnp.float32,
            )
            y_std = np.asarray(eng.step(x))
            y_pl = np.asarray(eng.planar_step(x))
            assert y_pl.shape == (2, 8, 12, 12)
            np.testing.assert_array_equal(planar_to_frames(y_pl, 2), y_std)

    def test_planar_step_dp_sharded(self, rng):
        """The planar program under a -g dp mesh (virtual 8-device CPU)."""
        eng = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                                compute_dtype=jnp.float32)
        x = rng.integers(0, 255, (4, 8, 12, 3)).astype(np.uint8)
        y_single = np.asarray(eng.planar_step(jnp.asarray(x)))
        n = eng.configure_chips("0,1", 4)
        assert n >= 4
        y_sharded = np.asarray(eng.planar_step(jnp.asarray(x)))
        assert y_sharded.shape == (4, 8, 12, 12)
        np.testing.assert_array_equal(y_sharded, y_single)


def test_async_sink_applies_transform():
    from upscale_video_tpu.parallel.executor import AsyncSink

    class ListSink:
        def __init__(self):
            self.frames = []

        def write(self, f):
            self.frames.append(f)

        def close(self):
            pass

    inner = ListSink()
    sink = AsyncSink(inner, transform=lambda p: planar_to_frames(p, 2))
    p = np.arange(2 * 3 * 12, dtype=np.uint8).reshape(2, 3, 12)
    sink.write(p)
    sink.close()
    assert len(inner.frames) == 1
    np.testing.assert_array_equal(inner.frames[0], _shuffle_ref(p, 2))

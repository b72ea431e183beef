"""Fused SR tail kernel vs the XLA composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from upscale_video_tpu.ops.conv_pallas import ACT_PRELU
import pytest

from upscale_video_tpu.ops.tail_pallas import sr_tail_fused


def _xla_tail(u, rgb, w, b, scale):
    """conv -> pixel-shuffle (ncnn mode 0) -> nearest skip -> add."""
    ub = u.astype(jnp.bfloat16).astype(jnp.float32)
    wb = w.astype(jnp.bfloat16).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        ub[None], wb, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )[0] + b
    h, wd, c = y.shape
    cout = c // (scale * scale)
    y = y.reshape(h, wd, cout, scale, scale)
    y = y.transpose(0, 3, 1, 4, 2).reshape(h * scale, wd * scale, cout)
    rgbb = rgb.astype(jnp.bfloat16).astype(jnp.float32)
    skip = jnp.repeat(jnp.repeat(rgbb, scale, 0), scale, 1)
    return y + skip


@pytest.mark.parametrize("scale", [2, 4])
def test_matches_xla_tail(rng, scale):
    H, W, C = 16, 24, 8
    u = jnp.asarray(rng.uniform(-0.5, 0.5, (H, W, C)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, 3 * scale * scale)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.05, (3 * scale * scale,)).astype(np.float32))
    got = np.asarray(sr_tail_fused(u, rgb, w, b, scale=scale,
                                   tile_h=8, tile_w=16, interpret=True))
    want = np.asarray(_xla_tail(u, rgb, w, b, scale))
    assert got.shape == (H * scale, W * scale, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ragged_geometry(rng):
    H, W, C = 13, 21, 8
    u = jnp.asarray(rng.uniform(-0.5, 0.5, (H, W, C)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, 12)).astype(np.float32))
    b = jnp.asarray(np.zeros(12, np.float32))
    got = np.asarray(sr_tail_fused(u, rgb, w, b, scale=2,
                                   tile_h=8, tile_w=16, interpret=True))
    want = np.asarray(_xla_tail(u, rgb, w, b, 2))
    assert got.shape == (26, 42, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


class TestChainTail:
    """Tail consuming the conv-chain ring layout directly (no crop/re-pad
    between body and tail — the round-1 boundary-glue gap)."""

    def _setup(self, rng, H=13, W=19, C=8, scale=2):
        from upscale_video_tpu.ops.conv_chain import conv3x3_chain

        x = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
        body = [
            {"weight": rng.normal(0, 0.2, (3, 3, 3, C)).astype(np.float32),
             "bias": rng.normal(0, 0.05, C).astype(np.float32), "act": ACT_PRELU,
             "slope": rng.uniform(0.1, 0.3, C).astype(np.float32)},
            {"weight": rng.normal(0, 0.2, (3, 3, C, C)).astype(np.float32),
             "bias": rng.normal(0, 0.05, C).astype(np.float32), "act": ACT_PRELU,
             "slope": rng.uniform(0.1, 0.3, C).astype(np.float32)},
        ]
        w = jnp.asarray(
            rng.normal(0, 0.1, (3, 3, C, 3 * scale * scale)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.05, (3 * scale * scale,)).astype(np.float32))
        arr = conv3x3_chain(x, body, tile_h=8, tile_w=16, interpret=True,
                            crop=False)
        u = conv3x3_chain(x, body, tile_h=8, tile_w=16, interpret=True)
        return x, arr, u, w, b

    def test_matches_standard_tail(self, rng):
        from upscale_video_tpu.ops.tail_pallas import sr_tail_fused_chain

        x, arr, u, w, b = self._setup(rng)
        got = np.asarray(sr_tail_fused_chain(
            arr, x, w, b, scale=2, hgt=13, wid=19, tile_h=8, tile_w=16,
            interpret=True))
        want = np.asarray(_xla_tail(u.astype(jnp.float32), x, w, b, 2))
        assert got.shape == (26, 38, 3)
        np.testing.assert_allclose(got, want, atol=2e-2)

    def test_emit_u8_matches_epilogue(self, rng):
        """u8 emission must equal model_to_frames(XLA tail) exactly
        (same x255 + round-half-even + clamp + channel flip)."""
        from upscale_video_tpu.ops.pixel import model_to_frames
        from upscale_video_tpu.ops.tail_pallas import sr_tail_fused_chain

        x, arr, u, w, b = self._setup(rng)
        got = np.asarray(sr_tail_fused_chain(
            arr, x, w, b, scale=2, hgt=13, wid=19, tile_h=8, tile_w=16,
            emit_u8=True, reverse_channels=True, interpret=True))
        assert got.dtype == np.uint8
        yf = sr_tail_fused_chain(
            arr, x, w, b, scale=2, hgt=13, wid=19, tile_h=8, tile_w=16,
            interpret=True)
        want = np.asarray(model_to_frames(yf, "bgr"))
        # identical float epilogue; allow 1 lsb for bf16 skip rounding
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

"""Fused SR tail kernel vs the XLA composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
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

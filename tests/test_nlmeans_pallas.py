"""Pallas NL-means kernel vs. the XLA reference implementation.

Runs in Pallas interpreter mode (CPU test platform per conftest).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from upscale_video_tpu.ops.nlmeans import nl_means_denoise
from upscale_video_tpu.ops.nlmeans_pallas import nl_means_denoise_pallas


def _ref(x, h, sigma=0.0):
    return np.asarray(nl_means_denoise(jnp.asarray(x), h, sigma))


def _pallas(x, h, sigma=0.0, **kw):
    return np.asarray(
        nl_means_denoise_pallas(jnp.asarray(x), h, sigma, interpret=True, **kw)
    )


def test_matches_xla_single_tile(rng):
    x = rng.uniform(0, 1, (16, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(_pallas(x, 10.0), _ref(x, 10.0), atol=2e-6)


def test_matches_xla_multi_tile(rng):
    """Frame larger than one tile: seam pixels must match exactly too."""
    x = rng.uniform(0, 1, (40, 80, 3)).astype(np.float32)
    got = _pallas(x, 12.0, tile_h=16, tile_w=32)
    want = _ref(x, 12.0)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_ragged_geometry(rng):
    """Non-multiple-of-tile frames pad+crop without artifacts."""
    x = rng.uniform(0, 1, (19, 45, 3)).astype(np.float32)
    got = _pallas(x, 8.0, tile_h=16, tile_w=32)
    want = _ref(x, 8.0)
    assert got.shape == (19, 45, 3)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_sigma_offset(rng):
    x = rng.uniform(0, 1, (16, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        _pallas(x, 10.0, sigma=5.0), _ref(x, 10.0, sigma=5.0), atol=2e-6
    )


def test_constant_fixed_point():
    x = np.full((16, 32, 3), 0.37, np.float32)
    np.testing.assert_allclose(_pallas(x, 20.0), 0.37, atol=1e-5)


def test_engine_denoise_backend_selection(rng):
    """ChainEngine routes denoise through the backend conv_impl selects;
    both backends produce the same uint8 stage output (pipeline/chain.py
    _denoise; reference denoise pool at upscale_processing.py:350-361)."""
    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    frames = rng.integers(0, 256, (2, 24, 40, 3)).astype(np.uint8)
    outs = {}
    for impl in ("xla", "pallas"):
        eng = ChainEngine.build(
            ChainSpec.parse("n=7"), 1, synthetic=True, conv_impl=impl,
        )
        assert eng.kernel_impl == impl
        outs[impl] = np.asarray(eng.stage_fn("denoise")(jnp.asarray(frames)))
    np.testing.assert_array_equal(outs["xla"], outs["pallas"])

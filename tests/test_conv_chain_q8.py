"""Interpret-mode equality for the int8 bordered-chain kernel.

The integer conv is exact (int8 x int8 -> int32); the f32 epilogue is
deterministic up to FMA association, so the kernel must match the XLA int
oracle within 1 bf16 ULP (and bit-for-bit on >99.9% of elements).  The
NL-means roll lesson (NOTES.md) means hardware equality is ALSO required
before any shipped use — tools/q8_bench.py carries that check.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from upscale_video_tpu.ops.conv_pallas import ACT_NONE, ACT_PRELU, ACT_RELU
from upscale_video_tpu.ops.conv_chain_q8 import conv3x3_chain_q8, q8_oracle


def make_q8_layers(rng, specs):
    layers = []
    for cin, cout, act in specs:
        layers.append({
            "wq": rng.integers(-127, 128, (3, 3, cin, cout)).astype(np.int8),
            "scale": rng.uniform(1e-4, 3e-4, (cout,)).astype(np.float32),
            "bias": rng.normal(0, 0.05, (cout,)).astype(np.float32),
            "slope": rng.uniform(0.1, 0.3, (cout,)).astype(np.float32),
            "inv_out": np.float32(rng.uniform(80.0, 130.0)),
            "act": act,
        })
    return layers


@pytest.mark.parametrize(
    "h,w,specs",
    [
        (16, 24, [(64, 64, ACT_PRELU)] * 3),
        (20, 40, [(3, 32, ACT_RELU), (32, 64, ACT_PRELU),
                  (64, 48, ACT_NONE)]),
        # geometry not divisible by the tile: grid padding + stale-byte
        # masking must reproduce conv zero padding exactly
        (13, 19, [(64, 64, ACT_PRELU)] * 2),
    ],
)
def test_q8_chain_matches_int_oracle(h, w, specs):
    rng = np.random.default_rng(42)
    layers = make_q8_layers(rng, specs)
    cin0 = specs[0][0]
    x8 = jnp.asarray(
        rng.integers(-127, 128, (h, w, cin0)).astype(np.int8)
    )
    got = conv3x3_chain_q8(x8, layers, tile_h=8, tile_w=16, interpret=True)
    want = q8_oracle(x8, layers)
    assert got.shape == want.shape
    g = np.asarray(got, np.float32)
    e = np.asarray(want, np.float32)
    # integer conv is exact; the f32 epilogue's FMA association is not
    # pinned, so the final bf16 value may differ by 1 ULP on rounding
    # boundaries (observed 1/38400 elements)
    np.testing.assert_allclose(g, e, rtol=2**-7, atol=2**-6)
    exact = np.mean(g == e)
    assert exact > 0.999, f"only {exact:.4%} bit-equal"


def test_q8_chain_rejects_non_int8():
    rng = np.random.default_rng(0)
    layers = make_q8_layers(rng, [(64, 64, ACT_PRELU)])
    x = jnp.zeros((8, 8, 64), jnp.bfloat16)
    with pytest.raises(ValueError):
        conv3x3_chain_q8(x, layers, interpret=True)


def test_q8_requant_saturates():
    """Weights/scales chosen so pre-requant values exceed +-127: the clip
    must saturate instead of wrapping through the int8 cast."""
    rng = np.random.default_rng(7)
    layers = make_q8_layers(rng, [(64, 64, ACT_NONE), (64, 64, ACT_NONE)])
    layers[0]["scale"] = np.full((64,), 1.0, np.float32)  # huge dequant
    layers[0]["inv_out"] = np.float32(1.0)
    x8 = jnp.asarray(rng.integers(-127, 128, (8, 16, 64)).astype(np.int8))
    got = np.asarray(
        conv3x3_chain_q8(x8, layers, tile_h=8, tile_w=16, interpret=True),
        np.float32,
    )
    want = np.asarray(q8_oracle(x8, layers), np.float32)
    np.testing.assert_array_equal(got, want)

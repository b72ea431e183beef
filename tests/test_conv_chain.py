"""Bordered-chain conv stack vs sequential XLA convs (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_video_tpu.ops.conv_chain import conv3x3_chain
from upscale_video_tpu.ops.conv_pallas import (
    ACT_LEAKY, ACT_PRELU, ACT_RELU,
)


def _xla_stack(x, layers):
    y = x.astype(jnp.bfloat16)
    for l in layers:
        w = jnp.asarray(l["weight"], jnp.bfloat16)
        out = jax.lax.conv_general_dilated(
            y[None].astype(jnp.bfloat16), w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )[0]
        if l.get("bias") is not None:
            out = out + l["bias"]
        act = l.get("act", 0)  # conv_pallas encoding (shared)
        if act == ACT_RELU:
            out = jnp.maximum(out, 0)
        elif act == ACT_LEAKY:
            out = jnp.where(out >= 0, out, out * l["slope"][0])
        elif act == ACT_PRELU:
            out = jnp.where(out >= 0, out, out * l["slope"])
        y = out.astype(jnp.bfloat16)
    return y


def _layers(rng, specs):
    out = []
    for cin, cout, act in specs:
        l = {
            "weight": rng.normal(0, 0.15, (3, 3, cin, cout)).astype(np.float32),
            "bias": rng.normal(0, 0.05, (cout,)).astype(np.float32),
            "act": act,
        }
        if act == ACT_LEAKY:
            l["slope"] = np.asarray([0.2], np.float32)
        elif act == ACT_PRELU:
            l["slope"] = rng.uniform(0.1, 0.3, (cout,)).astype(np.float32)
        out.append(l)
    return out


def test_single_layer_matches(rng):
    x = jnp.asarray(rng.uniform(0, 1, (16, 24, 8)).astype(np.float32))
    layers = _layers(rng, [(8, 8, ACT_PRELU)])
    got = np.asarray(conv3x3_chain(x, layers, tile_h=8, tile_w=16,
                                   interpret=True)).astype(np.float32)
    want = np.asarray(_xla_stack(x, layers)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_three_layer_chain_matches(rng):
    """Multi-layer: the border blocks must behave exactly like conv zero
    padding at EVERY layer (the whole point of the bordered layout)."""
    x = jnp.asarray(rng.uniform(0, 1, (24, 32, 8)).astype(np.float32))
    layers = _layers(rng, [(8, 16, ACT_PRELU), (16, 16, ACT_LEAKY), (16, 4, 0)])
    got = np.asarray(conv3x3_chain(x, layers, tile_h=8, tile_w=16,
                                   interpret=True)).astype(np.float32)
    want = np.asarray(_xla_stack(x, layers)).astype(np.float32)
    assert got.shape == want.shape == (24, 32, 4)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=2e-2)


def test_ragged_geometry(rng):
    """Frame not a tile multiple: grid padding inside the data region must
    be masked to zero at every layer (not leak bias garbage inward)."""
    x = jnp.asarray(rng.uniform(0, 1, (13, 19, 8)).astype(np.float32))
    layers = _layers(rng, [(8, 8, ACT_PRELU), (8, 8, ACT_PRELU)])
    got = np.asarray(conv3x3_chain(x, layers, tile_h=8, tile_w=16,
                                   interpret=True)).astype(np.float32)
    want = np.asarray(_xla_stack(x, layers)).astype(np.float32)
    assert got.shape == (13, 19, 8)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=2e-2)

"""Row-wise Winograd F(2,3) chain kernel vs XLA reference (interpret mode).

Interpret-mode equality is necessary but NOT sufficient for Mosaic kernels
(NOTES.md NL-means roll lesson) — the hardware equality run lives in the
round's on-chip parity sweep (tools/wino_bench.py, recorded in NOTES.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_video_tpu.ops.conv_pallas import (
    ACT_LEAKY, ACT_NONE, ACT_PRELU, ACT_RELU,
)
from upscale_video_tpu.ops.conv_winograd import transform_weights, winograd_chain


def _xla_stack(x, layers):
    """Direct-conv reference with the kernel's own bf16 rounding points:
    bf16 activations between layers, Winograd-transformed-then-rounded
    weights reconstructed exactly (U is linear in w, so comparing against
    bf16(w) direct conv would conflate weight-transform rounding with
    kernel bugs — instead both paths use f32 math on bf16-rounded
    operands and only activation-edge rounding differs)."""
    y = x.astype(jnp.bfloat16).astype(jnp.float32)
    for l in layers:
        w = l["weight"].astype(jnp.bfloat16).astype(jnp.float32)
        out = jax.lax.conv_general_dilated(
            y[None], w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )[0]
        if l.get("bias") is not None:
            out = out + l["bias"]
        act = l.get("act", ACT_NONE)
        s = l.get("slope")
        if act == ACT_PRELU:
            out = jnp.where(out >= 0, out, out * s)
        elif act == ACT_LEAKY:
            out = jnp.where(out >= 0, out, out * s[0])
        elif act == ACT_RELU:
            out = jnp.maximum(out, 0)
        y = out.astype(jnp.bfloat16).astype(jnp.float32)
    return y


def _layers(rng, n, cin, feats, act=ACT_PRELU):
    out = []
    c = cin
    for f in feats:
        l = {
            "weight": jnp.asarray(rng.normal(0, 0.2, (3, 3, c, f)), jnp.float32),
            "bias": jnp.asarray(rng.normal(0, 0.1, (f,)), jnp.float32),
            "act": act,
        }
        if act == ACT_PRELU:
            l["slope"] = jnp.asarray(rng.uniform(0.1, 0.3, (f,)), jnp.float32)
        elif act == ACT_LEAKY:
            l["slope"] = jnp.asarray([0.2], jnp.float32)
        out.append(l)
        c = f
    return out


def test_weight_transform_reconstructs_conv():
    """U = G w: y0/y1 from the transformed weights equal the direct conv
    (pure numpy check of the algebra, no kernel involved)."""
    rng = np.random.default_rng(0)
    w = rng.normal(0, 1, (3, 3, 2, 3))
    u = transform_weights(w)  # (4, 6, 3)
    d = rng.normal(0, 1, (4, 5, 2))  # rows 2i-1..2i+2 for one output pair
    v = np.stack([d[0] - d[2], d[1] + d[2], d[2] - d[1], d[1] - d[3]])
    patches = np.concatenate([v[:, dx : 3 + dx] for dx in range(3)], -1)
    m = np.einsum("apk,ako->apo", patches, u)
    y0 = m[0] + m[1] + m[2]
    y1 = m[1] - m[2] - m[3]
    ref = np.zeros((2, 3, 3))
    for r in range(2):
        for x_ in range(3):
            for dy in range(3):
                for dx in range(3):
                    ref[r, x_] += np.einsum(
                        "i,io->o", d[r + dy, x_ + dx], w[dy, dx]
                    )
    np.testing.assert_allclose(np.stack([y0, y1]), ref, atol=1e-5)


@pytest.mark.parametrize("act", [ACT_NONE, ACT_PRELU, ACT_LEAKY, ACT_RELU])
def test_single_layer_matches_xla(rng, act):
    H, W, C = 20, 40, 8
    x = jnp.asarray(rng.uniform(0, 1, (H, W, C)), jnp.float32)
    layers = _layers(rng, 1, C, [8], act)
    got = np.asarray(
        winograd_chain(x, layers, tile_h=8, tile_w=16, interpret=True)
    ).astype(np.float32)
    ref = np.asarray(_xla_stack(x, layers))
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_stack_matches_xla(rng):
    """Multi-layer chain with channel changes and ragged geometry."""
    H, W = 19, 37
    x = jnp.asarray(rng.uniform(0, 1, (H, W, 6)), jnp.float32)
    layers = _layers(rng, 3, 6, [8, 16, 4])
    got = np.asarray(
        winograd_chain(x, layers, tile_h=8, tile_w=16, interpret=True)
    ).astype(np.float32)
    assert got.shape == (H, W, 4)
    ref = np.asarray(_xla_stack(x, layers))
    # bf16 edges per layer; tolerance scales with depth
    np.testing.assert_allclose(got, ref, atol=0.15)


def test_matches_direct_chain_kernel(rng):
    """The two chain kernels (im2col direct vs row-Winograd) agree on the
    same layout contract — they must be interchangeable conv-body
    backends."""
    from upscale_video_tpu.ops.conv_chain import conv3x3_chain

    H, W = 24, 32
    x = jnp.asarray(rng.uniform(0, 1, (H, W, 8)), jnp.float32)
    layers = _layers(rng, 2, 8, [8, 8])
    a = np.asarray(
        winograd_chain(x, layers, tile_h=8, tile_w=16, interpret=True)
    ).astype(np.float32)
    b = np.asarray(
        conv3x3_chain(x, layers, tile_h=8, tile_w=16, interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(a, b, atol=0.05)

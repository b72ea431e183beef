"""Fused RDB kernel vs XLA reference (interpret mode on CPU).

Hardware equality + timing live in tools/rdb_bench.py (NOTES.md records
them) — interpret equality alone is insufficient for Mosaic kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upscale_video_tpu.ops.rdb_pallas import GC, NF, rdb_apply


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
    np.testing.assert_allclose(got, want, atol=0.12)

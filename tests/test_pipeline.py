"""End-to-end pipeline tests on tiny synthetic videos (hermetic backend).

Models the reference's implicit runtime verifications as real tests
(SURVEY.md §4): geometry, frame counts, resume fast-forward, sentinels,
batch fragmentation, both data planes.
"""

import os
from fractions import Fraction

import numpy as np
import pytest

from upscale_video_tpu.pipeline.chain import BatchedStepper, ChainEngine, ChainSpec
from upscale_video_tpu.pipeline.process import (
    default_output_name,
    prepare_workdir,
    process_file,
)
from upscale_video_tpu.video.io import Y4MSink, Y4MSource


def make_test_video(path: str, n_frames: int = 12, w: int = 32, h: int = 24,
                    rate=Fraction(24, 1), seed: int = 0):
    rng = np.random.default_rng(seed)
    frames = []
    with Y4MSink(path, w, h, rate) as sink:
        for i in range(n_frames):
            f = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            f[:, : 2 + i % 5] = (i * 10) % 256  # frame-varying structure
            frames.append(f)
            sink.write(f)
    return frames


class TestChainSpec:
    def test_default_frames_per_step_per_family(self):
        """--frames_per_step default is a per-family policy: depth 4 for
        Compact (measured-best, round-4 batch A/B) but 1 for '-m r' —
        the tiled fused-RDB executable's size scales with the vmapped
        frame batch, and depth 4 at 1080p compiled to a 2.2 GB
        executable exceeding the backend's 2 GB proto limit (NOTES
        round 5, incl. the lax.map control)."""
        from upscale_video_tpu.pipeline.chain import default_frames_per_step

        assert default_frames_per_step(ChainSpec.parse(None)) == 4
        assert default_frames_per_step(ChainSpec.parse("a,n=3")) == 4
        assert default_frames_per_step(ChainSpec.parse("r")) == 1
        assert default_frames_per_step(ChainSpec.parse("a,n=3,r")) == 1

    def test_deep_kernel_batch_warns(self, caplog):
        """An explicit --frames_per_step >= 4 on the tiled '-m r' kernel
        path logs the 2 GB executable-limit heads-up BEFORE the
        multi-minute compile; the Compact family never warns."""
        import logging

        from upscale_video_tpu.pipeline.chain import ChainEngine

        eng = ChainEngine.build(
            ChainSpec.parse("r"), 4, synthetic=True, tile=16, halo=4,
        )
        with caplog.at_level(logging.WARNING):
            eng.configure_chips(None, 4)
        assert any("2 GB" in r.message for r in caplog.records)
        caplog.clear()
        with caplog.at_level(logging.WARNING):
            eng.configure_chips(None, 2)  # measured-clean depth: silent
        assert not any("2 GB" in r.message for r in caplog.records)
        compact = ChainEngine.build(ChainSpec.parse(None), 2, synthetic=True)
        with caplog.at_level(logging.WARNING):
            compact.configure_chips(None, 8)
        assert not any("2 GB" in r.message for r in caplog.records)

    def test_parse_full(self):
        s = ChainSpec.parse("a,n=3,r")
        assert s.anime and s.real_life and s.denoise == 3
        assert s.effective_scale(2) == 4  # 'r' forces 4

    def test_parse_denoise_clamp(self):
        assert ChainSpec.parse("n=99").denoise == 30
        assert ChainSpec.parse("n=0").denoise is None
        assert ChainSpec.parse("n=-5").denoise is None

    def test_parse_empty(self):
        s = ChainSpec.parse(None)
        assert not s.anime and not s.real_life and s.denoise is None

    def test_parse_unknown(self):
        with pytest.raises(ValueError, match="unknown"):
            ChainSpec.parse("a,z")


class TestBatchedStepper:
    def test_order_and_padding(self):
        def step(x):
            return x + 1  # identity-ish marker

        s = BatchedStepper(step, 4)
        outs = []
        for i in range(10):
            frame = np.full((2, 2, 3), i, np.uint8)
            outs.extend(s.feed(frame))
        outs.extend(s.flush())
        assert len(outs) == 10
        for i, o in enumerate(outs):
            assert o[0, 0, 0] == i + 1  # order preserved, padding dropped

    def test_mid_batch_shape_change_raises(self):
        """A frame-geometry change mid-batch must fail loudly — a silent
        buffer reallocation would ship the frames already copied in as
        uninitialized memory."""
        s = BatchedStepper(lambda x: x, 4)
        s.feed(np.zeros((2, 2, 3), np.uint8))
        with pytest.raises(ValueError, match="shape changed mid-batch"):
            s.feed(np.zeros((4, 2, 3), np.uint8))
        # at a batch boundary (count == 0) a new geometry is fine
        s2 = BatchedStepper(lambda x: x, 1)
        s2.feed(np.zeros((2, 2, 3), np.uint8))
        s2.feed(np.zeros((4, 2, 3), np.uint8))
        assert len(s2.flush()) == 1


class TestProcessFile:
    def test_stream_plane_end_to_end(self, tmp_path):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=10)
        out = str(tmp_path / "out.y4m")
        res = process_file(
            vid, output_file=out, scale=2, temp_dir=str(tmp_path / "t"),
            batch_size=-3,  # split into 3 parts
            synthetic_models=True, precision="f32", frames_per_step=4,
        )
        assert res.frames_processed == 10
        with Y4MSource(out) as src:
            got = list(src)
        assert len(got) == 10
        assert got[0].shape == (48, 64, 3)
        # workdir cleaned up when not resuming
        assert not os.path.exists(str(tmp_path / "t" / "upscale_video"))

    def test_resume_skips_fragments(self, tmp_path):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=8)
        out = str(tmp_path / "out.y4m")
        tdir = str(tmp_path / "t")
        # first run with resume keeps the workdir + sentinel
        r1 = process_file(
            vid, output_file=out, scale=2, temp_dir=tdir, batch_size=-2,
            synthetic_models=True, precision="f32", resume_processing=True,
        )
        assert r1.frames_processed == 8
        # second run short-circuits on completed.txt
        r2 = process_file(
            vid, output_file=out, scale=2, temp_dir=tdir, batch_size=-2,
            synthetic_models=True, precision="f32", resume_processing=True,
        )
        assert r2 is None

    def test_png_plane_end_to_end(self, tmp_path):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=6)
        out = str(tmp_path / "out.y4m")
        res = process_file(
            vid, output_file=out, scale=2, temp_dir=str(tmp_path / "t"),
            batch_size=10, synthetic_models=True, precision="f32",
            data_plane="png",
        )
        assert res.frames_processed == 6
        with Y4MSource(out) as src:
            assert len(list(src)) == 6

    def test_planes_agree(self, tmp_path):
        """Streaming and PNG planes must produce identical pixels."""
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=5)
        o1 = str(tmp_path / "o1.y4m")
        o2 = str(tmp_path / "o2.y4m")
        process_file(vid, output_file=o1, scale=2, temp_dir=str(tmp_path / "t1"),
                     synthetic_models=True, precision="f32")
        process_file(vid, output_file=o2, scale=2, temp_dir=str(tmp_path / "t2"),
                     synthetic_models=True, precision="f32", data_plane="png")
        with Y4MSource(o1) as a, Y4MSource(o2) as b:
            for fa, fb in zip(list(a), list(b)):
                np.testing.assert_array_equal(fa, fb)

    def test_extract_only(self, tmp_path):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=4)
        tdir = str(tmp_path / "t")
        res = process_file(
            vid, scale=2, temp_dir=tdir, extract_only=True,
            resume_processing=True, synthetic_models=True,
        )
        assert res is None
        workdir = os.path.join(tdir, "upscale_video")
        for i in range(1, 5):
            assert os.path.exists(os.path.join(workdir, f"{i}.extract.png"))

    def test_denoise_chain(self, tmp_path):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=4)
        out = str(tmp_path / "out.y4m")
        res = process_file(
            vid, output_file=out, scale=2, temp_dir=str(tmp_path / "t"),
            models="n=5", synthetic_models=True, precision="f32",
        )
        assert res.frames_processed == 4

    def test_scale_1_passthrough_denoise(self, tmp_path):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=4)
        out = str(tmp_path / "out.y4m")
        res = process_file(
            vid, output_file=out, scale=1, temp_dir=str(tmp_path / "t"),
            models="n=10", synthetic_models=True, precision="f32",
        )
        with Y4MSource(out) as src:
            got = list(src)
        assert got[0].shape == (24, 32, 3)  # unscaled

    def test_invalid_scale(self, tmp_path):
        with pytest.raises(ValueError, match="scale"):
            process_file("nope.y4m", scale=3)

    def test_missing_input(self):
        with pytest.raises(FileNotFoundError):
            process_file("/does/not/exist.y4m", scale=2)

    def test_default_output_name(self):
        assert default_output_name("movie.mkv", 2) == "movie.2x.mkv"
        assert default_output_name("/a/b/clip.test.mp4", 4) == "/a/b/clip.test.4x.mp4"


class TestPngDirInput:
    def test_png_directory_as_source(self, tmp_path):
        """The reference-compatible {n}.png directory works as an input
        container end-to-end (hermetic backend)."""
        import numpy as np
        from upscale_video_tpu.video.io import PngDirSink

        d = str(tmp_path / "frames")
        rng = np.random.default_rng(3)
        with PngDirSink(d, tag="") as sink:
            for _ in range(5):
                sink.write(rng.integers(0, 256, (20, 30, 3), dtype=np.uint8))
        out = str(tmp_path / "out.y4m")
        res = process_file(
            d, output_file=out, scale=2, temp_dir=str(tmp_path / "t"),
            synthetic_models=True, precision="f32",
        )
        assert res.frames_processed == 5
        with Y4MSource(out) as src:
            frames = list(src)
        assert frames[0].shape == (40, 60, 3)


class TestRealModelPipeline:
    def test_end_to_end_with_pretrained_weights(self, tmp_path):
        """Gated: full pipeline with the real 2x_Compact_Pretrain weights
        (CPU), checking output geometry and that the SR output correlates
        with a nearest-upscale of the input (sanity on real weights)."""
        from tests.conftest import REFERENCE_MODELS, reference_models_available

        if not reference_models_available():
            pytest.skip("reference zoo absent")
        vid = str(tmp_path / "in.y4m")
        frames = make_test_video(vid, n_frames=2, w=48, h=32, seed=7)
        out = str(tmp_path / "out.y4m")
        res = process_file(
            vid, output_file=out, scale=2, temp_dir=str(tmp_path / "t"),
            model_path=REFERENCE_MODELS, precision="f32", frames_per_step=2,
        )
        assert res.frames_processed == 2
        with Y4MSource(out) as src:
            got = list(src)
        assert got[0].shape == (64, 96, 3)
        up = np.repeat(np.repeat(frames[0].astype(float), 2, 0), 2, 1)
        corr = np.corrcoef(got[0].ravel().astype(float), up.ravel())[0, 1]
        assert corr > 0.9


def test_keep_awake_is_noop_without_wakepy():
    """Sleep-inhibit shim: the one reference capability dropped in round 1
    (upscale_processing.py:847) — a no-op on servers, real when wakepy
    exists, and never raises either way."""
    from upscale_video_tpu.utils.wake import keep_awake

    with keep_awake():
        pass
    # exceptions from the body must propagate untouched
    with pytest.raises(RuntimeError, match="boom"):
        with keep_awake():
            raise RuntimeError("boom")

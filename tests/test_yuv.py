"""The 4:2:0 output contract (ops/yuv.py + --pipe_pix yuv420p): conversion
numerics vs a numpy oracle, host I420 assembly (native == numpy), and the
end-to-end stream plane in both backends."""

import os

import numpy as np
import pytest

from upscale_video_tpu.ops.pixel import planar_to_frames
from upscale_video_tpu.ops.yuv import (
    i420_frame_bytes,
    packed_to_i420,
    yuv420_from_frames,
    yuv420_from_planar,
)

RNG = np.random.default_rng(11)


def oracle_i420(frames, full_range):
    """Independent numpy reference: BT.601 from uint8 RGB, convert then
    2x2 box-average chroma, round-half-even."""
    f = frames.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * (0.5 / (1 - 0.114))
    cr = (r - y) * (0.5 / (1 - 0.299))
    if not full_range:
        y = 16 + y * 219 / 255
        cb = cb * 224 / 255
        cr = cr * 224 / 255
    n, h, w = y.shape

    def sub(u):
        return u.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    q = lambda v: np.clip(np.round(v), 0, 255).astype(np.uint8)  # noqa: E731
    return q(y), q(sub(cb) + 128), q(sub(cr) + 128)


def unpack(flat, oh, ow):
    y = flat[: oh * ow].reshape(oh, ow)
    c = (oh // 2) * (ow // 2)
    cb = flat[oh * ow: oh * ow + c].reshape(oh // 2, ow // 2)
    cr = flat[oh * ow + c:].reshape(oh // 2, ow // 2)
    return y, cb, cr


@pytest.mark.parametrize("full_range", [False, True])
@pytest.mark.parametrize("s", [2, 4])
def test_planar_packed_matches_oracle(s, full_range):
    import jax.numpy as jnp

    p = RNG.integers(0, 256, (2, 5, 7, 3 * s * s)).astype(np.uint8)
    frames = planar_to_frames(p, s)
    packed = np.asarray(yuv420_from_planar(jnp.asarray(p), s, full_range))
    assert packed.shape == (2, 5, 7, s * s + 2 * (s // 2) ** 2)
    yo, cbo, cro = oracle_i420(frames, full_range)
    for i in range(2):
        y, cb, cr = unpack(packed_to_i420(packed[i], s), 5 * s, 7 * s)
        # jnp vs np f32 reduction order can flip a half-even rounding
        assert np.abs(y.astype(int) - yo[i].astype(int)).max() <= 1
        assert np.abs(cb.astype(int) - cbo[i].astype(int)).max() <= 1
        assert np.abs(cr.astype(int) - cro[i].astype(int)).max() <= 1


@pytest.mark.parametrize("full_range", [False, True])
def test_frames_packed_matches_oracle(full_range):
    import jax.numpy as jnp

    f = RNG.integers(0, 256, (2, 6, 8, 3)).astype(np.uint8)
    packed = np.asarray(yuv420_from_frames(jnp.asarray(f), full_range))
    assert packed.shape == (2, 3, 4, 6)
    yo, cbo, cro = oracle_i420(f, full_range)
    for i in range(2):
        y, cb, cr = unpack(packed_to_i420(packed[i], 2), 6, 8)
        assert np.abs(y.astype(int) - yo[i].astype(int)).max() <= 1
        assert np.abs(cb.astype(int) - cbo[i].astype(int)).max() <= 1
        assert np.abs(cr.astype(int) - cro[i].astype(int)).max() <= 1


def test_packed_to_i420_out_reuse_and_validation():
    p = RNG.integers(0, 256, (4, 6, 6)).astype(np.uint8)
    buf = np.empty((i420_frame_bytes(12, 8),), np.uint8)
    got = packed_to_i420(p, 2, out=buf)
    assert got is buf
    assert np.array_equal(got, packed_to_i420(p, 2))
    with pytest.raises(ValueError, match="mismatch"):
        packed_to_i420(p, 2, out=np.empty((7,), np.uint8))
    with pytest.raises(ValueError, match="channels"):
        packed_to_i420(RNG.integers(0, 256, (4, 6, 5)).astype(np.uint8), 2)
    with pytest.raises(ValueError, match="even"):
        i420_frame_bytes(7, 4)


def _smooth_clip(path, n=6, h=20, w=28):
    from upscale_video_tpu.video.io import Y4MSink

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.clip(np.stack([
        np.stack([100 + 80 * np.sin(yy / 5 + t), 120 + 60 * np.cos(xx / 7),
                  xx * 255 / w], axis=-1)
        for t in range(n)
    ]), 0, 255).astype(np.uint8)
    with Y4MSink(path, w, h, "24/1") as sink:
        for f in frames:
            sink.write(f)
    return frames


class TestPipelineYuv420:
    def _run(self, tmp_path, out_name, **kw):
        from upscale_video_tpu.pipeline.process import process_file

        out = str(tmp_path / out_name)
        kw.setdefault("scale", 2)
        process_file(
            str(tmp_path / "in.y4m"), out, temp_dir=str(tmp_path / out_name[:4]),
            synthetic_models=True, precision="f32", **kw,
        )
        return out

    def test_yuv_output_matches_rgb_path(self, tmp_path):
        from upscale_video_tpu.video.io import Y4MSource, _ycbcr_to_rgb_full

        _smooth_clip(str(tmp_path / "in.y4m"))
        rgb = self._run(tmp_path, "rgb.y4m")
        yuv = self._run(tmp_path, "yuv.y4m", pipe_pix="yuv420p")
        # C420 fragment/output is half the plane bytes of C444
        assert os.path.getsize(yuv) < 0.6 * os.path.getsize(rgb)
        # the yuv output must equal the ORACLE-simulated 4:2:0 round trip
        # of the rgb output (chroma subsample loss itself is genuine —
        # synthetic weights emit noisy chroma — so raw PSNR is the wrong
        # gate; the plumbing must be LSB-exact modulo the C444 baseline's
        # own +-1 round trip)
        with Y4MSource(rgb) as ra, Y4MSource(yuv) as rb:
            n = 0
            for fa, fb in zip(ra, rb):
                yo, cbo, cro = oracle_i420(fa[None], full_range=True)
                up = lambda u: np.repeat(np.repeat(u[0], 2, 0), 2, 1)  # noqa: E731
                sim = _ycbcr_to_rgb_full(
                    np.stack([yo[0], up(cbo), up(cro)], axis=-1)
                )
                assert np.abs(
                    sim.astype(int) - fb.astype(int)
                ).max() <= 3
                n += 1
        assert n == 6

    def test_yuv_multi_fragment_concat(self, tmp_path):
        from upscale_video_tpu.video.io import Y4MSource

        # negative -b carries the reference's +100 fudge
        # (upscale_processing.py:860): 160 frames / -3 -> 153/batch ->
        # TWO fragments, so the byte-level C420 concat really runs
        _smooth_clip(str(tmp_path / "in.y4m"), n=160, h=8, w=12)
        out = self._run(tmp_path, "frag.y4m", pipe_pix="yuv420p",
                        batch_size=-3)
        with Y4MSource(out) as src:
            assert src.colorspace.startswith("C420")
            n = sum(1 for _ in src)
        assert n == 160

    def test_odd_geometry_falls_back_to_rgb(self, tmp_path, capsys):
        from upscale_video_tpu.video.io import Y4MSource

        _smooth_clip(str(tmp_path / "in.y4m"), h=21, w=27)
        # scale 1 => odd output; must warn and ship rgb24 (C444).
        # (setup_logging reconfigures root with force=True, evicting
        # caplog's handler — assert on the console stream instead)
        out = self._run(tmp_path, "odd.y4m", pipe_pix="yuv420p", scale=1,
                        models="n=2")
        assert "falling back to rgb24" in capsys.readouterr().out
        with Y4MSource(out) as src:
            assert src.colorspace.startswith("C444")


def test_ffmpeg_pipe_sink_yuv420_mode(tmp_path):
    """The rawvideo pipe in yuv420p mode: half-size frames reach the
    encoder process intact (fake ffmpeg validates framing)."""
    from tests.test_ffmpeg_pipes import FAKE_FFMPEG
    from upscale_video_tpu.video.io import FfmpegPipeSink

    fake = tmp_path / "ffmpeg"
    fake.write_text(FAKE_FFMPEG)
    fake.chmod(0o755)
    out = str(tmp_path / "frag.raw")
    sink = FfmpegPipeSink(str(fake), out, width=8, height=6,
                          frame_rate="24/1", input_pix_fmt="yuv420p")
    n = i420_frame_bytes(8, 6)
    payload = [RNG.integers(0, 256, (n,)).astype(np.uint8) for _ in range(3)]
    for f in payload:
        sink.write(f)
    sink.close()
    with open(out, "rb") as f:
        data = f.read()
    assert data == b"".join(p.tobytes() for p in payload)
    with pytest.raises(ValueError, match="geometry"):
        sink.write(np.zeros((6, 8, 3), np.uint8))


def test_concat_rejects_mismatched_fragment_headers(tmp_path):
    from upscale_video_tpu.video.backend import HermeticBackend
    from upscale_video_tpu.video.io import Y4MSink

    b = HermeticBackend()
    for batch, w in ((1, 8), (2, 10)):  # different geometry
        with Y4MSink(str(tmp_path / f"{batch}.y4m"), w, 6, "24/1") as s:
            s.write(np.zeros((6, w, 3), np.uint8))
    with pytest.raises(ValueError, match="cannot concat"):
        b.concat(2, str(tmp_path / "out.y4m"), str(tmp_path))


def test_planar_interleave_view_matches_copy_path():
    """Zero-copy strided-view interleave (native) == the contiguous-copy
    numpy path, for the exact slices packed_to_i420 takes."""
    from upscale_video_tpu.native.imgproc import (
        native_available, planar_interleave_view,
    )

    if not native_available():
        pytest.skip("no compiler for the native library")
    for s in (2, 4):
        cs = s // 2
        c = s * s + 2 * cs * cs
        packed = RNG.integers(0, 256, (5, 7, c)).astype(np.uint8)
        for off, k, f in ((0, s * s, s), (s * s, cs * cs, cs),
                          (s * s + cs * cs, cs * cs, cs)):
            if f == 1:
                continue
            view = packed[..., off:off + k]
            out = np.empty((5 * f, 7 * f, 1), np.uint8)
            planar_interleave_view(view, f, 1, out=out)
            ref = np.ascontiguousarray(view).reshape(5, 7, f, f, 1)
            ref = ref.transpose(0, 2, 1, 3, 4).reshape(5 * f, 7 * f, 1)
            assert np.array_equal(out, ref), (s, off)


class TestContractGuards:
    def test_resume_adopts_existing_fragment_contract(self, tmp_path, capsys):
        """Run 1 rgb24 crashes mid-movie; run 2 with --pipe_pix yuv420p
        must adopt the existing C444 contract instead of failing at the
        final concat."""
        import os as _os

        from upscale_video_tpu.pipeline.process import process_file
        from upscale_video_tpu.video.io import Y4MSink, Y4MSource

        # 160 frames / -3 -> 153/batch (the reference's +100 fudge) ->
        # two fragments
        _smooth_clip(str(tmp_path / "in.y4m"), n=160, h=8, w=12)
        tdir = str(tmp_path / "t")
        out = str(tmp_path / "out.y4m")
        # handcraft the mid-run state: fragment 1 (frames 1..153) already
        # encoded under the rgb24 contract (C444) by the crashed run
        work = _os.path.join(tdir, "upscale_video")
        _os.makedirs(work)
        with Y4MSink(_os.path.join(work, "1.y4m"), 24, 16, "24/1") as s:
            for _ in range(153):
                s.write(np.zeros((16, 24, 3), np.uint8))
        # resume with the CONFLICTING contract request
        process_file(str(tmp_path / "in.y4m"), out, temp_dir=tdir, scale=2,
                     synthetic_models=True, precision="f32", batch_size=-3,
                     resume_processing=True, pipe_pix="yuv420p")
        assert "existing fragments use the rgb24 contract" in \
            capsys.readouterr().out
        with Y4MSource(out) as src:
            assert src.colorspace.startswith("C444")
            assert sum(1 for _ in src) == 160

    def test_sp_mesh_frames_contract_falls_back(self, tmp_path, capsys):
        """--parallel sp + yuv420p without the planar contract (scale-1
        chain) must warn and ship rgb24 instead of dying in the sp pad."""
        from upscale_video_tpu.pipeline.process import process_file
        from upscale_video_tpu.video.io import Y4MSource

        _smooth_clip(str(tmp_path / "in.y4m"), h=20, w=28)
        out = str(tmp_path / "out.y4m")
        process_file(str(tmp_path / "in.y4m"), out,
                     temp_dir=str(tmp_path / "t"), scale=1, models="n=2",
                     synthetic_models=True, precision="f32",
                     chips="0,1,2", parallel_mode="sp", pipe_pix="yuv420p")
        assert "needs the planar contract" in capsys.readouterr().out
        with Y4MSource(out) as src:
            assert src.colorspace.startswith("C444")

    def test_png_plane_warns_pipe_pix_ignored(self, tmp_path, capsys):
        from upscale_video_tpu.pipeline.process import process_file

        _smooth_clip(str(tmp_path / "in.y4m"))
        process_file(str(tmp_path / "in.y4m"), str(tmp_path / "o.y4m"),
                     temp_dir=str(tmp_path / "t"), scale=2,
                     synthetic_models=True, precision="f32",
                     data_plane="png", pipe_pix="yuv420p")
        assert "stream plane only" in capsys.readouterr().out


def test_sp_mesh_planar_yuv_contract(tmp_path):
    """The ALLOWED sp+yuv combination: planar packed grid over a 4-chip
    sp mesh (virtual CPU devices) — output C420 and frame-complete, with
    an H that needs the sp pad (20 rows over 4 chips divides; use 18/3
    chips for a pad)."""
    from upscale_video_tpu.pipeline.process import process_file
    from upscale_video_tpu.video.io import Y4MSource

    _smooth_clip(str(tmp_path / "in.y4m"), n=4, h=18, w=28)  # 18 % 4 != 0
    out = str(tmp_path / "out.y4m")
    process_file(str(tmp_path / "in.y4m"), out, temp_dir=str(tmp_path / "t"),
                 scale=2, synthetic_models=True, precision="f32",
                 chips="0,1,2,3", parallel_mode="sp", pipe_pix="yuv420p")
    with Y4MSource(out) as src:
        assert src.colorspace.startswith("C420")
        assert (src.height, src.width) == (36, 56)
        assert sum(1 for _ in src) == 4


def test_i420_to_model_matches_host_reader():
    """Device-side I420 input conversion == the hermetic Y4MSource host
    read path (nearest chroma + full-range BT.601), within the double-
    rounding the host path adds."""
    import jax.numpy as jnp

    from upscale_video_tpu.ops.yuv import i420_to_model
    from upscale_video_tpu.video.io import Y4MSink, Y4MSource
    import io as _io

    h, w = 6, 8
    frames = RNG.integers(0, 256, (2, h, w, 3)).astype(np.uint8)
    packed = np.asarray(yuv420_from_frames(jnp.asarray(frames), True))
    buf = _io.BytesIO()
    sink = Y4MSink(buf, w, h, "24/1", colorspace="C420jpeg")
    for i in range(2):
        sink.write(packed_to_i420(packed[i], 2))
    sink.close()

    buf.seek(0)
    host = Y4MSource(buf)
    host_frames = [host.read() for _ in range(2)]
    buf.seek(0)
    raw = Y4MSource(buf, raw_i420=True)
    assert raw.i420_full_range
    flats = np.stack([raw.read() for _ in range(2)])
    dev = np.asarray(i420_to_model(jnp.asarray(flats), h, w,
                                   full_range=True, channel_order="rgb"))
    host_f = np.stack(host_frames).astype(np.float32) / 255.0
    assert np.abs(dev - host_f).max() <= 1.5 / 255.0


def test_pipeline_i420_input_contract(tmp_path, capsys):
    """A C420 y4m source under --pipe_pix yuv420p engages the raw input
    contract end to end (flat I420 to the device, no host conversion
    either way) and matches the RGB-input run within rounding."""
    import jax.numpy as jnp

    from upscale_video_tpu.pipeline.process import process_file
    from upscale_video_tpu.ops.yuv import packed_to_i420 as p2i
    from upscale_video_tpu.video.io import Y4MSink, Y4MSource

    frames = _smooth_clip(str(tmp_path / "unused.y4m"))
    packed = np.asarray(yuv420_from_frames(jnp.asarray(frames), True))
    with Y4MSink(str(tmp_path / "in420.y4m"), 28, 20, "24/1",
                 colorspace="C420jpeg") as s:
        for i in range(len(frames)):
            s.write(p2i(packed[i], 2))

    out = str(tmp_path / "out.y4m")
    process_file(str(tmp_path / "in420.y4m"), out,
                 temp_dir=str(tmp_path / "t1"), scale=2,
                 synthetic_models=True, precision="f32",
                 pipe_pix="yuv420p")
    assert "i420 input" in capsys.readouterr().out
    with Y4MSource(out) as src:
        assert src.colorspace.startswith("C420")
        assert sum(1 for _ in src) == 6


def test_sp_mesh_keeps_rgb_input_with_c420_source(tmp_path):
    """sp shards the input's H axis — a flat I420 buffer has no row axis,
    so under sp the pipeline keeps RGB input even for a C420 source (and
    still ships the planar yuv OUTPUT contract)."""
    import jax.numpy as jnp

    from upscale_video_tpu.pipeline.process import process_file
    from upscale_video_tpu.ops.yuv import packed_to_i420 as p2i
    from upscale_video_tpu.video.io import Y4MSink, Y4MSource

    frames = _smooth_clip(str(tmp_path / "unused.y4m"), n=4, h=20, w=28)
    packed = np.asarray(yuv420_from_frames(jnp.asarray(frames[:4]), True))
    with Y4MSink(str(tmp_path / "in420.y4m"), 28, 20, "24/1",
                 colorspace="C420jpeg") as s:
        for i in range(4):
            s.write(p2i(packed[i], 2))
    out = str(tmp_path / "out.y4m")
    process_file(str(tmp_path / "in420.y4m"), out,
                 temp_dir=str(tmp_path / "t"), scale=2,
                 synthetic_models=True, precision="f32",
                 chips="0,1,2,3", parallel_mode="sp", pipe_pix="yuv420p")
    with Y4MSource(out) as src:
        assert src.colorspace.startswith("C420")
        assert sum(1 for _ in src) == 4


def test_dp_mesh_i420_input(tmp_path, capsys):
    """dp shards the batch dim — rank-agnostic, so the flat I420 input
    contract rides the mesh."""
    import jax.numpy as jnp

    from upscale_video_tpu.pipeline.process import process_file
    from upscale_video_tpu.ops.yuv import packed_to_i420 as p2i
    from upscale_video_tpu.video.io import Y4MSink, Y4MSource

    frames = _smooth_clip(str(tmp_path / "unused.y4m"), n=4, h=20, w=28)
    packed = np.asarray(yuv420_from_frames(jnp.asarray(frames[:4]), True))
    with Y4MSink(str(tmp_path / "in420.y4m"), 28, 20, "24/1",
                 colorspace="C420jpeg") as s:
        for i in range(4):
            s.write(p2i(packed[i], 2))
    out = str(tmp_path / "out.y4m")
    process_file(str(tmp_path / "in420.y4m"), out,
                 temp_dir=str(tmp_path / "t"), scale=2,
                 synthetic_models=True, precision="f32",
                 chips="0,1", parallel_mode="dp", pipe_pix="yuv420p",
                 frames_per_step=2)
    assert "i420 input" in capsys.readouterr().out
    with Y4MSource(out) as src:
        assert src.colorspace.startswith("C420")
        assert sum(1 for _ in src) == 4


def test_y4m_limited_range_c420_read():
    """Bare C420/C420mpeg2 streams carry studio levels (what ffmpeg
    writes): the host reader must expand them — and agree with the
    device-side i420_to_model at limited range."""
    import io as _io

    import jax.numpy as jnp

    from upscale_video_tpu.ops.yuv import i420_to_model
    from upscale_video_tpu.video.io import Y4MSource

    h, w = 4, 6
    rng = np.random.default_rng(5)
    # studio-level planes: Y 16..235, C 16..240
    y = rng.integers(16, 236, (h, w), dtype=np.uint8)
    cb = rng.integers(16, 241, (h // 2, w // 2), dtype=np.uint8)
    cr = rng.integers(16, 241, (h // 2, w // 2), dtype=np.uint8)
    buf = _io.BytesIO()
    buf.write(f"YUV4MPEG2 W{w} H{h} F24:1 Ip A1:1 C420mpeg2\n".encode())
    buf.write(b"FRAME\n" + y.tobytes() + cb.tobytes() + cr.tobytes())
    buf.seek(0)
    src = Y4MSource(buf)
    assert not src.i420_full_range
    host = src.read().astype(np.float32) / 255.0

    flat = np.concatenate([y.ravel(), cb.ravel(), cr.ravel()])[None]
    dev = np.asarray(i420_to_model(jnp.asarray(flat), h, w,
                                   full_range=False, channel_order="rgb"))[0]
    # host path: expand-to-u8 (one extra rounding) + convert-round;
    # device path: float all the way — within 2 LSB
    assert np.abs(host - dev).max() <= 2.5 / 255.0

    # a mid-grey studio frame must decode to mid-grey, not washed out
    buf2 = _io.BytesIO()
    buf2.write(f"YUV4MPEG2 W{w} H{h} F24:1 Ip A1:1 C420\n".encode())
    grey_y = np.full((h, w), 126, np.uint8)       # (235-16)/2+16
    grey_c = np.full((h // 2, w // 2), 128, np.uint8)
    buf2.write(b"FRAME\n" + grey_y.tobytes() + grey_c.tobytes() * 2)
    buf2.seek(0)
    g = Y4MSource(buf2).read()
    assert abs(int(g[0, 0, 0]) - 128) <= 1  # expanded, not 126-ish dim

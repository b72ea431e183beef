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

        _smooth_clip(str(tmp_path / "in.y4m"))
        out = self._run(tmp_path, "frag.y4m", pipe_pix="yuv420p",
                        batch_size=-3)  # 3 fragments, byte-level concat
        with Y4MSource(out) as src:
            assert src.colorspace.startswith("C420")
            n = sum(1 for _ in src)
        assert n == 6

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

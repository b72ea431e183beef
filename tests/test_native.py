"""Tests for the native C++ pipe transport (native/pipeio.cpp via ctypes).

Uses raw OS pipes so no media binaries are needed; validates framing,
ordering, EOF, backpressure, and writer flush semantics.
"""

import os
import threading

import numpy as np
import pytest

from upscale_video_tpu.native.pipeio import (
    NativePipeReader,
    NativePipeWriter,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ compiler for native pipeio"
)

FRAME = 64 * 48 * 3


def test_reader_frames_in_order():
    r_fd, w_fd = os.pipe()
    frames = [np.full(FRAME, i, np.uint8) for i in range(10)]

    def feeder():
        with os.fdopen(w_fd, "wb") as f:
            for fr in frames:
                f.write(fr.tobytes())

    t = threading.Thread(target=feeder)
    t.start()
    got = []
    with NativePipeReader(r_fd, FRAME, n_buffers=3) as reader:
        while True:
            f = reader.read()
            if f is None:
                break
            got.append(f)
    t.join()
    os.close(r_fd)
    assert len(got) == 10
    for i, f in enumerate(got):
        assert f.shape == (FRAME,)
        assert (f == i).all()


def test_reader_eof_mid_stream():
    r_fd, w_fd = os.pipe()

    def feeder():
        with os.fdopen(w_fd, "wb") as f:
            f.write(np.full(FRAME, 7, np.uint8).tobytes())
            f.write(b"\x01" * (FRAME // 2))  # truncated frame then EOF

    t = threading.Thread(target=feeder)
    t.start()
    with NativePipeReader(r_fd, FRAME, n_buffers=2) as reader:
        first = reader.read()
        assert first is not None and (first == 7).all()
        with pytest.raises(IOError):
            while True:
                if reader.read() is None:
                    raise AssertionError("EOF instead of error on truncation")
    t.join()
    os.close(r_fd)


def test_writer_roundtrip():
    r_fd, w_fd = os.pipe()
    frames = [np.full(FRAME, i * 3, np.uint8) for i in range(8)]
    received = []

    def drain():
        with os.fdopen(r_fd, "rb") as f:
            while True:
                buf = f.read(FRAME)
                if not buf:
                    break
                received.append(np.frombuffer(buf, np.uint8))

    t = threading.Thread(target=drain)
    t.start()
    writer = NativePipeWriter(w_fd, FRAME, n_buffers=3)
    for fr in frames:
        writer.write(fr)
    writer.flush()
    writer.close()
    os.close(w_fd)
    t.join()
    assert len(received) == 8
    for want, got in zip(frames, received):
        np.testing.assert_array_equal(want, got)


def test_writer_backpressure():
    """Ring smaller than the burst: submits must block, not drop."""
    r_fd, w_fd = os.pipe()
    n = 50
    received = []
    done = threading.Event()

    def drain():
        with os.fdopen(r_fd, "rb") as f:
            while len(received) < n:
                buf = f.read(FRAME)
                if not buf:
                    break
                received.append(buf[0])
        done.set()

    t = threading.Thread(target=drain)
    t.start()
    writer = NativePipeWriter(w_fd, FRAME, n_buffers=2)
    for i in range(n):
        writer.write(np.full(FRAME, i % 251, np.uint8))
    writer.close()
    os.close(w_fd)
    t.join()
    assert received == [i % 251 for i in range(n)]


def test_writer_wrong_size():
    r_fd, w_fd = os.pipe()
    writer = NativePipeWriter(w_fd, FRAME, n_buffers=2)
    with pytest.raises(ValueError, match="bytes"):
        writer.write(np.zeros(10, np.uint8))
    writer.close()
    os.close(w_fd)
    os.close(r_fd)


def test_reader_close_while_blocked():
    """Closing a reader waiting on a silent pipe must not hang."""
    r_fd, w_fd = os.pipe()
    reader = NativePipeReader(r_fd, FRAME, n_buffers=2)
    reader.close()  # worker is poll-looping; close must join promptly
    os.close(w_fd)
    os.close(r_fd)


class TestImgproc:
    """Native YCbCr converter must be bit-identical to the numpy reference
    (same float op order, round-half-to-even) — it only changes speed."""

    def test_parity_both_directions(self, rng):
        from upscale_video_tpu.native import imgproc
        from upscale_video_tpu.video.io import (
            _rgb_to_ycbcr_full, _ycbcr_to_rgb_full,
        )

        if not imgproc.native_available():
            pytest.skip("no compiler")
        rgb = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        ycc_np = _rgb_to_ycbcr_full(rgb)
        ycc_nat = imgproc.rgb_to_ycbcr444(rgb)
        np.testing.assert_array_equal(ycc_np.transpose(2, 0, 1), ycc_nat)
        rgb_np = _ycbcr_to_rgb_full(ycc_np)
        rgb_nat = imgproc.ycbcr444_to_rgb(
            ycc_np[..., 0], ycc_np[..., 1], ycc_np[..., 2]
        )
        np.testing.assert_array_equal(rgb_np, rgb_nat)

    def test_full_range_sweep(self):
        """Every uint8 Y/Cb/Cr combination class: gray ramps + extremes."""
        from upscale_video_tpu.native import imgproc
        from upscale_video_tpu.video.io import _rgb_to_ycbcr_full

        if not imgproc.native_available():
            pytest.skip("no compiler")
        lut = np.arange(256, dtype=np.uint8)
        grid = np.stack(np.meshgrid(lut[::8], lut[::8], lut[::8],
                                    indexing="ij"), -1).reshape(32, -1, 3)
        got = imgproc.rgb_to_ycbcr444(np.ascontiguousarray(grid))
        want = _rgb_to_ycbcr_full(grid).transpose(2, 0, 1)
        np.testing.assert_array_equal(got, want)


class TestPlanarInterleave:
    def test_matches_numpy_path(self, rng):
        """Native strided-memcpy interleave == the numpy transpose path
        (the host half of the shuffle-planar output contract)."""
        from upscale_video_tpu.native import imgproc

        if not imgproc.native_available():
            pytest.skip("no compiler")
        for s, (h, w) in [(2, (9, 14)), (4, (5, 6)), (2, (48, 64))]:
            p = rng.integers(0, 256, (h, w, 3 * s * s), dtype=np.uint8)
            want = np.ascontiguousarray(
                p.reshape(h, w, s, s, 3).transpose(0, 2, 1, 3, 4)
            ).reshape(h * s, w * s, 3)
            got = imgproc.planar_interleave(p, s)
            np.testing.assert_array_equal(got, want)

    def test_routed_through_planar_to_frames(self, rng):
        """ops.pixel.planar_to_frames picks the native path for uint8 RGB
        planes and stays bit-identical to the numpy fallback."""
        from upscale_video_tpu.ops.pixel import planar_to_frames

        p = rng.integers(0, 256, (2, 6, 10, 12), dtype=np.uint8)
        got = planar_to_frames(p, 2)
        want = np.stack([
            np.ascontiguousarray(
                f.reshape(6, 10, 2, 2, 3).transpose(0, 2, 1, 3, 4)
            ).reshape(12, 20, 3) for f in p
        ])
        np.testing.assert_array_equal(got, want)


def test_writer_surfaces_lost_frames():
    """When the consumer vanishes (EPIPE), submitted frames can't all be
    delivered — write() or close() must raise instead of silently
    dropping the ring tail (round-2 review: a short fragment would be
    trusted as complete by resume+concat)."""
    import os

    from upscale_video_tpu.native.pipeio import NativePipeWriter

    r, w = os.pipe()
    writer = NativePipeWriter(w, 1 << 16, n_buffers=2)
    os.close(r)  # no reader: writes hit EPIPE
    frame = np.zeros(1 << 16, np.uint8)
    raised = False
    try:
        for _ in range(6):
            writer.write(frame)
    except IOError:
        raised = True
    if not raised:
        with pytest.raises(IOError):
            writer.close()
    else:
        try:
            writer.close()
        except IOError:
            pass
    os.close(w)

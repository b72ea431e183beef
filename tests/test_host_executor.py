"""Tests for the host pipelining wrappers (PrefetchSource / AsyncSink)."""

import time
from fractions import Fraction

import numpy as np
import pytest

from upscale_video_tpu.parallel.executor import AsyncSink, PrefetchSource
from upscale_video_tpu.video.io import FrameSink, FrameSource


class ListSource(FrameSource):
    def __init__(self, frames, delay=0.0, fail_at=None):
        self.frames = list(frames)
        self.width = frames[0].shape[1]
        self.height = frames[0].shape[0]
        self.frame_rate = Fraction(24, 1)
        self.num_frames = len(frames)
        self._i = 0
        self.delay = delay
        self.fail_at = fail_at
        self.closed = False

    def read(self):
        if self.fail_at is not None and self._i == self.fail_at:
            raise IOError("synthetic decode failure")
        if self._i >= len(self.frames):
            return None
        if self.delay:
            time.sleep(self.delay)
        f = self.frames[self._i]
        self._i += 1
        return f

    def close(self):
        self.closed = True


class ListSink(FrameSink):
    def __init__(self, delay=0.0, fail_at=None):
        self.frames = []
        self.delay = delay
        self.fail_at = fail_at
        self.closed = False

    def write(self, frame):
        if self.fail_at is not None and len(self.frames) == self.fail_at:
            raise IOError("synthetic encode failure")
        if self.delay:
            time.sleep(self.delay)
        self.frames.append(frame.copy())

    def close(self):
        self.closed = True


def _frames(n):
    return [np.full((4, 6, 3), i, np.uint8) for i in range(n)]


class TestPrefetchSource:
    def test_order_and_eof(self):
        src = PrefetchSource(ListSource(_frames(20)), depth=4)
        got = list(src)
        src.close()
        assert len(got) == 20
        for i, f in enumerate(got):
            assert f[0, 0, 0] == i

    def test_propagates_metadata(self):
        inner = ListSource(_frames(3))
        src = PrefetchSource(inner, depth=2)
        assert (src.width, src.height) == (6, 4)
        assert src.num_frames == 3
        src.close()
        assert inner.closed

    def test_error_propagation(self):
        src = PrefetchSource(ListSource(_frames(10), fail_at=3), depth=2)
        got = []
        with pytest.raises(IOError, match="decode"):
            while True:
                f = src.read()
                if f is None:
                    break
                got.append(f)
        assert len(got) == 3
        src.close()

    def test_close_mid_stream(self):
        src = PrefetchSource(ListSource(_frames(100), delay=0.01), depth=2)
        assert src.read() is not None
        src.close()  # must not hang on the full queue


class TestAsyncSink:
    def test_ordered_writes(self):
        inner = ListSink()
        sink = AsyncSink(inner, depth=3)
        for f in _frames(15):
            sink.write(f)
        sink.close()
        assert inner.closed
        assert [f[0, 0, 0] for f in inner.frames] == list(range(15))

    def test_error_surfaces(self):
        inner = ListSink(fail_at=2)
        sink = AsyncSink(inner, depth=2)
        with pytest.raises(IOError, match="encode"):
            for f in _frames(10):
                sink.write(f)
                time.sleep(0.01)
            sink.close()

    def test_slow_sink_backpressure(self):
        inner = ListSink(delay=0.005)
        sink = AsyncSink(inner, depth=2)
        for f in _frames(10):
            sink.write(f)
        sink.close()
        assert len(inner.frames) == 10


class TestHostPlaneSustain:
    """The stream plane's host side must sustain the device rate (round-3
    verdict item 3): PrefetchSource -> BatchedStepper(stub) -> AsyncSink
    (planar interleave, reused buffer) at 4K geometry.  tools/
    host_loadtest.py measures the full-resolution numbers recorded in
    NOTES.md; this is the hermetic regression guard at reduced frame count
    with a conservative floor (CI hosts are small and noisy)."""

    def test_planar_loadtest_floor(self):
        import argparse

        from upscale_video_tpu.native.imgproc import native_available
        from tools.host_loadtest import run

        native_available()  # build the C library OUTSIDE the timed region
        args = argparse.Namespace(
            height=1080, width=1920, scale=2, frames=24, batch=4
        )
        # Throughput CAPABILITY check: best of three attempts.  Ambient
        # load on a shared 1-core CI host can fake a failure (measured
        # 4-22 fps for the SAME build across minutes) but cannot fake a
        # pass; an O(N) regression (pre-fix state: 3.9-8.3 fps) fails all
        # three.  Measured capability 21-58 fps across round-3 hosts.
        best = 0.0
        for _ in range(3):
            best = max(best, run(args, "null"))
            if best > 10.0:
                break
        assert best > 10.0, f"host plane sustained only {best:.1f} fps"

"""Host-plane load test: can the stream plane's host side sustain the
device rate?  (VERDICT round-3 item 3a.)

Replicates _run_stream_plane's host loop with the device stubbed out to an
instant step: synthetic 1080p source -> PrefetchSource -> BatchedStepper
(stub planar step) -> AsyncSink(planar interleave on the writer thread) ->
sink.  What remains is exactly the host work the pipeline must overlap
with device compute: queue hops, the 4K planar interleave
(native/imgproc), and the sink's own encode cost.

Sinks:
- ``null``: swallow interleaved frames (isolates interleave + plumbing —
  the production ffmpeg pipe sink writes raw RGB bytes to a pipe, so this
  plus a memcpy is its host cost);
- ``y4m``: hermetic Y4M encode incl. RGB->YCbCr conversion (an UPPER
  bound: the ffmpeg plane does its own colour conversion in the encoder
  process, not on our threads);
- ``shm``: y4m into /dev/shm (adds the page-cache write).

Prints per-config fps; NOTES.md records the measured numbers next to the
device rate they must match.
"""

import argparse
import time

import numpy as np

from upscale_video_tpu.parallel.executor import AsyncSink, PrefetchSource
from upscale_video_tpu.pipeline.chain import BatchedStepper
from upscale_video_tpu.ops.pixel import planar_to_frames
from upscale_video_tpu.video.io import FrameSink, FrameSource


class SyntheticSource(FrameSource):
    """Yields preallocated 1080p frames (rotating over a few buffers so
    cache effects resemble real decode output, not one hot buffer)."""

    def __init__(self, n_frames, h, w):
        rng = np.random.default_rng(0)
        self._bufs = [
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(4)
        ]
        self.width, self.height = w, h
        self.frame_rate = 24
        self.num_frames = n_frames
        self._i = 0

    def read(self):
        if self._i >= self.num_frames:
            return None
        b = self._bufs[self._i % len(self._bufs)]
        self._i += 1
        return b

    def close(self):
        pass


class NullSink(FrameSink):
    def __init__(self):
        self.frames = 0

    def write(self, frame):
        # touch one byte per page-ish to keep the array materialized
        assert frame.dtype == np.uint8
        self.frames += 1

    def close(self):
        pass


def _build_pipeline(args, sink_kind, chip: int):
    """One stub-chip pipeline: source -> stepper -> transform -> sink.
    The multi-chip-per-host deployment runs one of these per chip on a
    shared host (each chip serving its own video/fragment — the -g
    workflow shape); their host-side costs (queue hops, interleave/I420
    assembly, sink encode) contend for the same cores."""
    h, w, s = args.height, args.width, args.scale
    n = args.frames
    yuv = getattr(args, "pipe_pix", "rgb24") == "yuv420p"
    src = PrefetchSource(SyntheticSource(n, h, w), depth=2 * args.batch)

    if sink_kind == "null":
        inner = NullSink()
    else:
        from fractions import Fraction

        from upscale_video_tpu.video.io import Y4MSink

        path = (f"/dev/shm/loadtest{chip}.y4m" if sink_kind == "shm"
                else "/dev/null")
        inner = Y4MSink(path, w * s, h * s, Fraction(24, 1),
                        colorspace="C420jpeg" if yuv else "C444")
    if yuv:
        # 4:2:0 contract (ops/yuv.py): the device hands over packed
        # [Y|Cb|Cr] on the LR grid; the host assembles flat I420 — HALF
        # the transform bytes of the RGB interleave, and the y4m sink
        # skips its RGB->YCbCr conversion entirely
        from upscale_video_tpu.ops.yuv import packed_to_i420

        ybuf = np.empty((h * s * w * s * 3 // 2,), np.uint8)
        transform = lambda p: packed_to_i420(p, s, out=ybuf)  # noqa: E731
        cs = s // 2
        out = np.random.default_rng(1).integers(
            0, 256, (args.batch, h, w, s * s + 2 * cs * cs), dtype=np.uint8
        )
    else:
        ibuf = np.empty((h * s, w * s, 3), np.uint8)
        transform = lambda p: planar_to_frames(p, s, out=ibuf)  # noqa: E731
        out = np.random.default_rng(1).integers(
            0, 256, (args.batch, h, w, 3 * s * s), dtype=np.uint8
        )
    sink = AsyncSink(inner, depth=2 * args.batch, transform=transform)

    # stub device: instant output of the right geometry
    stub = lambda chunk: out  # noqa: E731

    stepper = BatchedStepper(stub, args.batch)
    return src, stepper, sink


def _drive(src, stepper, sink) -> int:
    """Pump one pipeline to exhaustion; returns frames written."""
    wrote = 0
    try:
        while True:
            f = src.read()
            if f is None:
                break
            for o in stepper.feed(f):
                sink.write(o)
                wrote += 1
        for o in stepper.flush():
            sink.write(o)
            wrote += 1
    finally:
        sink.close()
        src.close()
    return wrote


def run(args, sink_kind):
    import threading

    h, w, s = args.height, args.width, args.scale
    yuv = getattr(args, "pipe_pix", "rgb24") == "yuv420p"
    chips = getattr(args, "chips", 1)

    # untimed warmup pipeline: fault in transform buffers, thread spin-up,
    # page-cache state (the first config otherwise absorbs it, ~3x low)
    wsrc, wstep, wsink = _build_pipeline(args, sink_kind, chip=0)
    for o in (list(wstep.feed(wsrc.read())) or []) + list(wstep.flush()):
        wsink.write(o)
    wsink.close()
    wsrc.close()

    pipes = [_build_pipeline(args, sink_kind, chip=c) for c in range(chips)]
    wrote = [0] * chips
    t0 = time.perf_counter()
    if chips == 1:
        wrote[0] = _drive(*pipes[0])
    else:
        ts = [threading.Thread(target=lambda i=i: wrote.__setitem__(
                  i, _drive(*pipes[i])), daemon=True)
              for i in range(chips)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    dt = time.perf_counter() - t0
    total = sum(wrote)
    print(
        f"[{sink_kind}/{'yuv420p' if yuv else 'rgb24'}/chips={chips}] "
        f"{total} frames in {dt:.2f}s = "
        f"{total/dt:.1f} fps aggregate host-plane "
        f"({total/dt/chips:.1f}/chip, {h}x{w} -> {h*s}x{w*s})",
        flush=True,
    )
    return total / dt


def main():
    # the device is a STUB here — this tool measures the host plane only
    # and must never touch the real backend (BatchedStepper's dispatch
    # device_puts the input batch, which would initialize the tunneled TPU
    # and hang ~20 min during an outage; one-TPU-process rule otherwise).
    # The env var is ignored by this image's plugin; the config API wins.
    import jax

    jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--scale", type=int, default=2)
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--sinks", default="null,y4m,shm")
    p.add_argument("--pipe_pix", choices=["rgb24", "yuv420p"],
                   default="rgb24")
    p.add_argument("--chips", type=int, default=1,
                   help="N concurrent stub-chip pipelines on this host "
                        "(the multi-chip-per-host deployment shape); "
                        "reports aggregate and per-chip fps.")
    args = p.parse_args()
    for kind in args.sinks.split(","):
        run(args, kind)


if __name__ == "__main__":
    main()

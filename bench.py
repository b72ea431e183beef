"""Benchmark: upscaled frames/sec/chip, 1080p -> 4K via 2x Compact.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline anchor: the reference's published 1.4 fps for a 2x upscale of a
1920x800 Blu-ray on an Intel Arc A750 (README.md:149; BASELINE.md).

Two modes:

- ``--mode device`` (default, the headline): times the EXACT device
  program the shipped pipeline dispatches per batch — ChainEngine's fused
  uint8 -> uint8 step (normalize + model + requantize), the program built
  at pipeline/chain.py:step — by chaining K applications inside one jitted
  ``lax.fori_loop`` (each iteration strided-downsamples its uint8 output
  back to the input shape; ~0.05 ms/iter, removed by differencing) and
  fetching a scalar reduction.  Chaining + differencing two chain lengths
  is required because on the remote ("axon") TPU platform
  ``block_until_ready`` returns before execution finishes AND host<->device
  transfers run ~25-50 MB/s through the tunnel, so any per-frame-transfer
  timing measures the tunnel, not the chip:
  ``per_step = (t(K2) - t(K1)) / (K2 - K1)``.

- ``--mode pipeline``: runs the REAL ``process_file`` stream plane end to
  end (generated y4m source -> PrefetchSource -> fused step ->
  AsyncSink -> fragment -> concat) and reports sustained fps with
  decode/encode overlap.  On a co-located TPU VM this is the honest
  end-to-end number; on THIS tunneled host it is transport-bound at
  ~1 fps (6.2 MB up + 24.9 MB down per frame at 25-50 MB/s), which
  measures the tunnel, not the framework — hence not the headline here.
"""

import argparse
import json
import os
import statistics
import sys
import tempfile
import time


PEAK_TFLOPS_BF16 = 197.0  # TPU v5e (v5 lite) chip peak, bf16


def _step_flops(step_fn, x) -> float:
    """XLA's own FLOP count for the exact shipped step program (whole
    batch).  0.0 when the platform exposes no cost analysis."""
    import jax

    try:
        lowered = jax.jit(step_fn).lower(x)
        try:
            # pre-compile cost analysis where available (avoids a second
            # full XLA compile of the step program just for metadata)
            analysis = lowered.cost_analysis()
        except Exception:
            analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):  # older jax returns [dict]
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return 0.0


def _frame_flops(engine, args) -> tuple:
    """Per-frame FLOPs for the step under test + provenance tag.

    The bench contract carries tflops/mfu ALWAYS (round-3 verdict: the
    round-2 artifact silently dropped them when cost analysis failed on
    this platform).  Source precedence: XLA's own count of the exact
    program where it's cheap and works; the analytic conv-MAC walk of the
    graph (models/flops.py) otherwise — for Valar always, because lowering
    the 1,206-layer program a second time just for metadata costs minutes.
    Returns (flops_per_frame, source) with source in "xla" | "analytic" |
    "failed".
    """
    from upscale_video_tpu.models.flops import chain_step_flops

    if not engine.spec.real_life:
        import numpy as np

        step_fn = (engine.raw_planar_step if engine.planar_scale
                   else engine.raw_step)
        x = np.zeros((args.batch, args.height, args.width, 3), dtype=np.uint8)
        flops = _step_flops(step_fn, x)
        if flops > 1e9:  # pallas custom calls report ~0 to cost_analysis
            return flops / args.batch, "xla"
    try:
        flops = chain_step_flops(engine, args.height, args.width)
        if flops > 1e9:
            return flops, "analytic"
    except Exception:
        pass
    return 0.0, "failed"


def build_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["device", "pipeline"], default="device")
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--chain", type=int, default=None,
                   help="short chain length K1 (default 5; 1 for -m r)")
    p.add_argument("--chain2", type=int, default=None,
                   help="long chain length K2 (default 20; 3 for -m r)")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--batch", type=int, default=None,
                   help="frames per chained step (the pipeline's default "
                        "frames_per_step; batch>=2 amortizes per-dispatch "
                        "overheads exactly like the shipped stepper)")
    p.add_argument("--frames", type=int, default=96,
                   help="pipeline mode: timed clip length")
    p.add_argument("--frames_per_step", type=int, default=4,
                   help="pipeline mode: device batch depth")
    p.add_argument("--pipe_pix", choices=["auto", "rgb24", "yuv420p"],
                   default="auto",
                   help="pipeline mode: output contract (yuv420p = the "
                        "device emits 4:2:0 — half the D2H bytes; auto, "
                        "the product default, resolves to yuv420p for "
                        "this bench's C420 clip)")
    p.add_argument("--precision", choices=["bf16", "mixed", "f32"],
                   default="bf16")
    p.add_argument("--models", default=None,
                   help="chain DSL for the step under test (e.g. 'n=3')")
    p.add_argument("--conv_impl", choices=["auto", "xla", "pallas", "rdb"],
                   default="auto")
    p.add_argument("--valar_tile", default=None,
                   help="override the '-m r' tile size: a budget int or "
                        "an HxW pair (default: the shipped product "
                        "policy, pipeline/chain.default_tile; "
                        "tools/valar_tile_ab.py is the same-session A/B)")
    p.add_argument("--verbose", action="store_true")
    return p


def make_engine(args):
    import jax.numpy as jnp

    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    from upscale_video_tpu.pipeline.chain import precision_dtypes

    dtype, residual_dtype = precision_dtypes(args.precision)
    spec = ChainSpec.parse(args.models)
    # Valar at 1080p whole-frame overflows HBM (measured 15.9/15.75 G);
    # production '-m r' runs tiled like the reference (tile 960 default,
    # upscale_processing.py:489) — bench the SHIPPED tiled config
    # (pipeline/chain.default_tile, the measured winner ledger).
    if args.valar_tile is not None and spec.real_life:
        from upscale_video_tpu.cli.common import tile_spec

        tile = tile_spec(args.valar_tile)
    else:
        tile = None  # ChainEngine.build applies the product policy
    return ChainEngine.build(
        spec, 2, compute_dtype=dtype,
        synthetic=True, conv_impl=args.conv_impl, tile=tile,
        residual_dtype=residual_dtype,
    )


def run_device_mode(args) -> float:
    """Frames/sec of the shipped fused step via the chained protocol."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    engine = make_engine(args)
    scale = engine.scale
    planar = engine.planar_scale
    if planar:
        # the program the stream plane actually dispatches: shuffle-planar
        # uint8 output, host interleave on the sink thread (overlapped —
        # pipeline mode times it included)
        step_fn = engine.raw_planar_step
        link = lambda y: y[:, :, :, :3]  # noqa: E731 — plane (0,0), RGB
    else:
        step_fn = engine.raw_step
        link = lambda y: y[:, ::scale, ::scale, :]  # noqa: E731

    rng = np.random.default_rng(0)
    x = rng.integers(
        0, 256, (args.batch, args.height, args.width, 3), dtype=np.uint8
    )

    def make_chained(K):
        @jax.jit
        def chained(v):
            def body(i, u):
                y = step_fn(u)  # uint8 -> uint8, the pipeline's program
                return link(y)  # dependent next input

            out = jax.lax.fori_loop(0, K, body, v)
            return jnp.sum(out.astype(jnp.uint32))

        return chained

    k1, k2 = args.chain, args.chain2
    c1, c2 = make_chained(k1), make_chained(k2)
    int(c1(x))  # compile + warm + absorb any first-transfer stall
    int(c2(x))
    # interleaved paired reps: each rep yields one differenced per-frame
    # estimate, so non-stationary tunnel congestion biases t1 and t2 the
    # same way within a pair instead of across the whole run; the artifact
    # publishes the median AND the min/max spread (round-3 verdict: one
    # number inside a documented +-25% envelope cannot distinguish
    # regression from noise)
    per_rep = []
    for _ in range(args.reps):
        t1 = _timed(lambda: int(c1(x)))
        t2 = _timed(lambda: int(c2(x)))
        per_rep.append((t2 - t1) / ((k2 - k1) * args.batch))
    per_frame = statistics.median(per_rep)
    fps_reps = sorted(1.0 / p for p in per_rep)

    flops, flops_source = _frame_flops(engine, args)
    extras = {
        "spread_fps": [round(fps_reps[0], 3), round(fps_reps[-1], 3)],
        "reps": len(fps_reps),
        "flops_source": flops_source,
        "tflops": (round(flops / per_frame / 1e12, 1)
                   if flops_source != "failed" else None),
        "mfu": (round(flops / per_frame / 1e12 / PEAK_TFLOPS_BF16, 3)
                if flops_source != "failed" and args.precision != "f32"
                else None),
    }
    if args.verbose:
        print(
            f"per-rep ms/frame: {[f'{p*1e3:.1f}' for p in per_rep]} -> "
            f"median {per_frame*1000:.2f} ms/frame "
            f"({args.height}x{args.width} -> {args.height*2}x{args.width*2}, "
            f"{args.precision}, conv_impl={args.conv_impl}); extras={extras}",
            file=sys.stderr,
        )
    return 1.0 / per_frame, extras


def _make_clip(path: str, height: int, width: int, n_frames: int,
               c420: bool = False) -> None:
    import numpy as np
    from fractions import Fraction

    from upscale_video_tpu.video.io import Y4MSink

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
    if c420:
        # a C420 source engages the symmetric 4:2:0 INPUT contract
        # (flat I420 straight to the device; ops/yuv.i420_to_model).
        # ONE batched device call + ONE fetch: per-frame dispatches would
        # each risk this tunnel's 100-550s D2H stalls (CLAUDE.md)
        import jax.numpy as jnp

        from upscale_video_tpu.ops.yuv import packed_to_i420, yuv420_from_frames

        frames = np.stack([np.roll(base, 7 * i, axis=1)
                           for i in range(n_frames)])
        packed = np.asarray(yuv420_from_frames(jnp.asarray(frames), True))
        with Y4MSink(path, width, height, Fraction(24, 1),
                     colorspace="C420jpeg") as sink:
            for i in range(n_frames):
                sink.write(packed_to_i420(packed[i], 2))
        return
    with Y4MSink(path, width, height, Fraction(24, 1)) as sink:
        for i in range(n_frames):
            sink.write(np.roll(base, 7 * i, axis=1))


def run_pipeline_mode(args) -> float:
    """Sustained fps of the real stream plane (decode || infer || encode)."""
    import logging

    from upscale_video_tpu.pipeline.process import process_file

    engine = make_engine(args)
    tmp = tempfile.mkdtemp(prefix="bench_pipeline_")
    logging.disable(logging.INFO)  # keep stdout to the one JSON line
    try:
        # warm clip: same geometry + batch so the timed run reuses the
        # compiled program and has absorbed the first-transfer stall
        warm = os.path.join(tmp, "warm.y4m")
        c420 = args.pipe_pix != "rgb24"  # auto resolves to yuv420p here
        _make_clip(warm, args.height, args.width, 2 * args.frames_per_step,
                   c420=c420)
        process_file(
            warm, output_file=os.path.join(tmp, "warm_out.y4m"),
            temp_dir=os.path.join(tmp, "tw"), engine=engine,
            frames_per_step=args.frames_per_step, scale=2,
            pipe_pix=args.pipe_pix,
        )
        clip = os.path.join(tmp, "clip.y4m")
        _make_clip(clip, args.height, args.width, args.frames, c420=c420)
        res = process_file(
            clip, output_file=os.path.join(tmp, "out.y4m"),
            temp_dir=os.path.join(tmp, "tt"), engine=engine,
            frames_per_step=args.frames_per_step, scale=2,
            pipe_pix=args.pipe_pix,
        )
        if args.verbose:
            print(
                f"pipeline: {res.frames_processed} frames in "
                f"{res.elapsed_seconds:.1f}s", file=sys.stderr,
            )
        flops, flops_source = _frame_flops(engine, args)
        extras = {
            "flops_source": flops_source,
            "tflops": (round(flops * res.frames_per_second / 1e12, 1)
                       if flops_source != "failed" else None),
            "mfu": (round(flops * res.frames_per_second / 1e12
                          / PEAK_TFLOPS_BF16, 3)
                    if flops_source != "failed"
                    and args.precision != "f32" else None),
            "pipe_pix": res.pipe_pix,  # the RESOLVED contract
        }
        return res.frames_per_second, extras
    finally:
        logging.disable(logging.NOTSET)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


VALAR_SIDECAR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_valar.json")


def _backend_reachable(timeout: float = 120.0) -> bool:
    """Bounded device probe: during a remote-backend outage an in-process
    jax.devices() hangs ~20 minutes before raising UNAVAILABLE (observed
    round 3) — probe in a subprocess instead of eating the driver's whole
    timeout in-process."""
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout,
        )
        return probe.returncode == 0
    except Exception:
        return False


def _await_backend() -> bool:
    """Retry the bounded probe for up to UPSCALE_TPU_BENCH_WAIT_S seconds
    (default 15 min): round-3 saw a multi-hour remote outage — if the
    measurement run lands near its tail, a bounded wait converts a lost
    round artifact into a number. 0 disables the wait (single probe)."""
    budget = float(os.environ.get("UPSCALE_TPU_BENCH_WAIT_S", "900"))
    deadline = time.monotonic() + budget
    while True:
        if _backend_reachable():
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        print(
            f"bench: backend unreachable, retrying for another "
            f"{remaining:.0f}s ...",
            file=sys.stderr,
        )
        time.sleep(min(60.0, max(1.0, remaining)))


def main() -> int:
    args = build_args().parse_args()
    if not _await_backend():
        print(
            "bench: accelerator backend unreachable (remote TPU outage?) — "
            "no measurement possible",
            file=sys.stderr,
        )
        return 1
    from upscale_video_tpu.pipeline.chain import ChainSpec

    # the engine's OWN parse decides the family — a hand-rolled split here
    # desynchronized on whitespace ('a, r') and mislabeled the run
    valar = ChainSpec.parse(args.models).real_life
    # Valar (1206 layers) traces/compiles for minutes and runs ~60x slower
    # per frame — the chained protocol needs far shorter chains
    if args.chain is None:
        args.chain = 1 if valar else 5
    if args.chain2 is None:
        args.chain2 = 3 if valar else 20
    if args.batch is None:
        args.batch = 1 if valar else 4

    if args.mode == "device":
        fps, extras = run_device_mode(args)
    else:
        fps, extras = run_pipeline_mode(args)

    baseline_fps = 1.4  # README.md:149 (Arc A750, 1920x800 2x)
    suffix = "" if args.mode == "device" else "_pipeline"
    family = "4x_valar" if valar else "2x_compact"
    # 4x of 1080p is 8K (7680x4320), not 4K — name the unit of work right
    geom = "1080p_to_8k" if valar else "1080p_to_4k"
    if valar:
        # persist for the headline run's artifact: the driver invokes the
        # default bench only, and a cold Valar compile there would risk its
        # timeout — the sidecar carries the last measured Valar number
        with open(VALAR_SIDECAR, "w") as f:
            json.dump({"valar_fps": round(fps, 3), **extras}, f)
    elif os.path.exists(VALAR_SIDECAR):
        with open(VALAR_SIDECAR) as f:
            side = json.load(f)
        extras["valar_fps"] = side.get("valar_fps")
    print(json.dumps({
        "metric": (
            f"upscaled_frames_per_sec_per_chip_{geom}_{family}{suffix}"
        ),
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline_fps, 2),
        **extras,
    }))
    return 0


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())

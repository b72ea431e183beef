"""``vsr-warmup``: pre-compile the device programs of a planned run.

First-run UX for the big models (round-3 verdict): a cold `-m r` compile
sits silent for ~7-10 minutes (the 1,206-layer Valar graph + its Mosaic
RDB kernels).  The persistent compilation cache (utils/compcache.py,
default-on, measured cold 3.64s -> warm 0.014s per program on this
backend) makes that a once-per-machine cost — this tool pays it up front,
with progress, for the exact configuration a planned ``upscale-video``
run will dispatch.  The reference has no analog because ncnn loads
pre-built engines in seconds (upscale_processing.py:70-71) — this is the
gap it papers over.

The compile cache keys on the FULL program: model chain, precision,
tile/halo, conv_impl, chip mesh, geometry, and the stream contract all
change the executable, so warmup mirrors upscale-video's flags and
resolves the stream contract with the same policy (process.py:
_auto_pipe_pix + the i420 decode gate at video/backend.py:137).
Programs compile via ``jit(...).lower(x).compile()`` — no frame data
moves to or from the device.
"""

from __future__ import annotations

import argparse
import sys
import time

from upscale_video_tpu.cli.common import (
    add_compute_args,
    add_model_chain_args,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vsr-warmup",
        description="Pre-compile (and persistently cache) the device "
                    "programs a planned upscale-video run will use, with "
                    "progress — a cold 'r'-family compile otherwise sits "
                    "silent for ~10 minutes on first run.",
    )
    p.add_argument(
        "--size", default="1920x1080",
        help="Planned input geometry WxH AFTER cropping (default "
             "1920x1080).  Programs are shape-specialized: warm the size "
             "the run will actually feed.",
    )
    add_model_chain_args(p)
    p.add_argument(
        "-p", "--pix_fmt", default="yuv420p",
        help="The planned run's encode pixel format (its -p flag): "
             "decides what --pipe_pix auto resolves to.",
    )
    p.add_argument(
        "--pipe_pix", choices=["auto", "rgb24", "yuv420p"], default="auto",
        help="Stream contract of the planned run (same default/policy as "
             "upscale-video).",
    )
    p.add_argument(
        "--source_pix_fmt", default="yuv420p",
        help="The planned input's probed pixel format (ffprobe "
             "vocabulary): gates the flat-I420 decode contract exactly "
             "like the pipeline (4:4:4/10-bit sources decode as rgb24).",
    )
    p.add_argument(
        "--range", choices=["limited", "full"], default="limited",
        dest="yuv_range",
        help="YCbCr level range of the planned backend: ffmpeg rawvideo "
             "pipes are limited/studio (default); the hermetic y4m "
             "backend is full (C420jpeg).",
    )
    add_compute_args(p)
    return p


def _resolve_contract(args, engine, width: int, height: int):
    """The stream-plane contract the planned run will pick — same policy
    as process.py (_auto_pipe_pix gates + the i420 decode gate of
    video/backend.py:137), against a planning-only ffmpeg backend (its
    gate functions never invoke the binary)."""
    from upscale_video_tpu.pipeline.process import _auto_pipe_pix
    from upscale_video_tpu.video.backend import FfmpegBackend

    backend = FfmpegBackend("ffmpeg", pix_fmt=args.pix_fmt)
    info = {"height": height, "width": width,
            "pix_fmt": args.source_pix_fmt}
    pipe_pix = args.pipe_pix
    if pipe_pix == "auto":
        pipe_pix = _auto_pipe_pix(backend, engine, info, "", "stream")
    planar = engine.planar_scale
    yuv420 = (pipe_pix == "yuv420p"
              and not (height * engine.scale % 2 or width * engine.scale % 2))
    if yuv420 and getattr(engine, "_mesh_mode", "dp") == "sp" and not (
        planar and planar % 2 == 0
    ):
        yuv420 = False
    i420_in = None
    if (yuv420 and height % 2 == 0 and width % 2 == 0
            and engine.input_rank_flexible
            and args.source_pix_fmt in ("yuv420p", "yuvj420p")):
        i420_in = (height, width, args.yuv_range == "full")
    return pipe_pix, yuv420, bool(planar), i420_in


def _compile_one(name: str, fn, x) -> float:
    """Compile ``fn`` for ``x``'s shape (populating the persistent cache)
    without moving frame data; returns seconds.  Mesh-wrapped steps that
    expose no .lower compile by executing one zero batch instead."""
    import numpy as np

    t0 = time.perf_counter()
    try:
        fn.lower(x).compile()
    except AttributeError:
        np.asarray(fn(x)).ravel()[:1]  # execute + fetch one byte
    return time.perf_counter() - t0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        width, height = (int(v) for v in args.size.lower().split("x"))
    except ValueError:
        print(f"--size must be WxH (e.g. 1920x1080), got {args.size!r}",
              file=sys.stderr)
        return 2

    import jax.numpy as jnp
    import numpy as np

    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec
    from upscale_video_tpu.utils.compcache import cache_dir_in_use

    spec = ChainSpec.parse(args.models)
    from upscale_video_tpu.pipeline.chain import precision_dtypes

    dtype, residual_dtype = precision_dtypes(args.precision, spec)
    print(f"building engine ({spec.describe() if hasattr(spec, 'describe') else args.models or 'sr'} "
          f"scale={spec.effective_scale(args.scale)} {args.precision})...",
          flush=True)
    engine = ChainEngine.build(
        spec, args.scale, model_path=args.model_path, compute_dtype=dtype,
        tile=args.tile_size, halo=args.halo, synthetic=args.synthetic_models,
        conv_impl=args.conv_impl, tta=args.tta, residual_dtype=residual_dtype,
    )
    if args.frames_per_step is None:
        # resolve the per-family depth policy so the warmed program IS
        # the one the pipeline will dispatch (chain.default_frames_per_step)
        from upscale_video_tpu.pipeline.chain import default_frames_per_step

        args.frames_per_step = default_frames_per_step(spec)
    frames_per_step = engine.configure_chips(
        args.chips, args.frames_per_step, args.parallel
    )

    pipe_pix, yuv420, planar, i420_in = _resolve_contract(
        args, engine, width, height
    )
    if yuv420:
        use_planar = planar and engine.planar_scale % 2 == 0
        step_fn = engine.yuv_step(args.yuv_range == "full",
                                  planar=use_planar, i420_in=i420_in)
        contract = ("yuv420p" + (", planar" if use_planar else "")
                    + (", i420 input" if i420_in else ""))
    elif planar:
        step_fn = engine.planar_step
        contract = f"rgb24, planar s={engine.planar_scale}"
    else:
        step_fn = engine.step
        contract = "rgb24, full-frame"
    if i420_in:
        x = np.zeros((frames_per_step, height * width * 3 // 2), np.uint8)
    else:
        x = np.zeros((frames_per_step, height, width, 3), np.uint8)

    d = cache_dir_in_use()
    print(f"contract: {contract} @ {width}x{height} batch {frames_per_step}"
          f" (pipe_pix {args.pipe_pix} -> {pipe_pix})", flush=True)
    if d is None:
        print("WARNING: persistent compile cache is DISABLED "
              "(UPSCALE_TPU_COMPILATION_CACHE_DIR) — this warmup only "
              "helps the current machine state", flush=True)
    if spec.real_life:
        print("compiling the 'r'-family program: a COLD compile may take "
              "~10 minutes (then cached persistently)...", flush=True)
    dt = _compile_one("step", step_fn, x)
    print(f"compiled step program in {dt:.1f}s"
          + (f" (cache: {d})" if d else ""), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""``upscale-video``: full-pipeline CLI (reference upscale_video.py:9-91)."""

from __future__ import annotations

import argparse

from upscale_video_tpu.cli.common import (
    add_compute_args,
    add_io_args,
    add_logging_args,
    add_model_chain_args,
)
from upscale_video_tpu.pipeline.process import process_file


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="upscale-video", description="Upscale Video 2x or 4x on TPU",
    )
    p.add_argument("-i", "--input_file", required=True, help="Input video file.")
    p.add_argument(
        "-o", "--output_file",
        help="Output file (default: input_file + '.2x.' or '.4x.').",
    )
    add_io_args(p)
    p.add_argument(
        "-e", "--ffmpeg_encoder", default="libx264",
        help="ffmpeg encoder for fragments (reference default av1_qsv is "
             "Intel-specific; libx264 here).",
    )
    p.add_argument(
        "-p", "--pix_fmt", default="yuv420p",
        help="Pixel format for encoding (e.g. p010le for 10-bit).",
    )
    add_model_chain_args(p)
    p.add_argument(
        "-b", "--batch_size", type=int, default=10,
        help="Minutes per fragment batch (negative = split into |b| parts).",
    )
    add_compute_args(p)
    p.add_argument(
        "-r", "--resume_processing", action="store_true",
        help="Keep temp_dir state and fast-forward completed work.",
    )
    p.add_argument(
        "-x", "--extract_only", action="store_true",
        help="Exit after frame extraction (sampling checkpoint; rerun with -r).",
    )
    add_logging_args(p)
    p.add_argument(
        "--global_quality", type=int, default=20,
        help="Encoder -global_quality (reference hardcoded 20).",
    )
    p.add_argument(
        "--data_plane", choices=["stream", "png"], default="stream",
        help="stream = zero-spill pipes (default); png = reference-layout "
             "per-frame files (needed before test-images/fix-frames).",
    )
    p.add_argument(
        "--pipe_pix", choices=["auto", "rgb24", "yuv420p"], default="auto",
        help="Stream-plane device contract: yuv420p (4:2:0 in AND out on "
             "the TPU: transport halves both ways, no host/decoder/encoder "
             "colour conversion) or rgb24 (the encoder converts — "
             "byte-identical input to the reference's).  The default auto "
             "picks yuv420p exactly when it is lossless for this run "
             "(stream plane, even output geometry, 4:2:0 8-bit encode "
             "target; under sp only with the planar contract) and rgb24 "
             "otherwise; 4:4:4/10-bit SOURCES are never downsampled on "
             "the decode side regardless.",
    )
    p.add_argument(
        "--copy_audio", action="store_true",
        help="Mux the source's audio/subtitle streams into the output "
             "(the reference pipeline silently drops them). Needs -f.",
    )
    p.add_argument(
        "--trace_dir",
        help="Capture a jax.profiler device trace of the run into this "
             "directory (view with TensorBoard/Perfetto).",
    )
    return p


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.copy_audio and not args.ffmpeg:
        # fail up front, not silently after a multi-hour run
        parser.error("--copy_audio requires -f/--ffmpeg (audio mux is an "
                     "ffmpeg stream copy)")
    from upscale_video_tpu.utils.profiling import trace

    with trace(args.trace_dir):
        _run(args)
    return 0


def _run(args) -> None:
    process_file(
        input_file=args.input_file,
        output_file=args.output_file,
        ffmpeg=args.ffmpeg,
        ffmpeg_encoder=args.ffmpeg_encoder,
        pix_fmt=args.pix_fmt,
        scale=args.scale,
        temp_dir=args.temp_dir,
        batch_size=args.batch_size,
        chips=args.chips,
        resume_processing=args.resume_processing,
        extract_only=args.extract_only,
        models=args.models,
        log_level=args.log_level,
        log_dir=args.log_dir,
        model_path=args.model_path,
        precision=args.precision,
        tile_size=args.tile_size,
        halo=args.halo,
        frames_per_step=args.frames_per_step,
        global_quality=args.global_quality,
        data_plane=args.data_plane,
        synthetic_models=args.synthetic_models,
        conv_impl=args.conv_impl,
        tta=args.tta,
        parallel_mode=args.parallel,
        copy_audio=args.copy_audio,
        pipe_pix=args.pipe_pix,
    )


if __name__ == "__main__":
    raise SystemExit(main())

"""``fix-frames``: corrupted-frame repair CLI (reference fix_frames.py:280-327)."""

from __future__ import annotations

import argparse

from upscale_video_tpu.cli.common import (
    add_compute_args,
    add_io_args,
    add_logging_args,
    add_model_chain_args,
)
from upscale_video_tpu.pipeline.workflows import fix_frames


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="fix-frames", description="Repair corrupted frames in the temp store",
    )
    p.add_argument("-i", "--input_file", required=True, help="Input file.")
    p.add_argument(
        "-b", "--bad_frames", required=True,
        help="Bad frame list like 1,3,5-7,10-12,15.",
    )
    add_io_args(p)
    add_model_chain_args(p)
    add_compute_args(p)
    add_logging_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    fix_frames(
        input_file=args.input_file,
        bad_frames=args.bad_frames,
        ffmpeg=args.ffmpeg,
        scale=args.scale,
        temp_dir=args.temp_dir,
        chips=args.chips,
        models=args.models,
        log_level=args.log_level,
        log_dir=args.log_dir,
        model_path=args.model_path,
        precision=args.precision,
        tile_size=args.tile_size,
        halo=args.halo,
        frames_per_step=args.frames_per_step,
        synthetic_models=args.synthetic_models,
        conv_impl=args.conv_impl,
        tta=args.tta,
        parallel_mode=args.parallel,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

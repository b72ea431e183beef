"""``test-chips``: TPU enumeration + calibration CLI (reference test_gpus.py:115-127)."""

from __future__ import annotations

import argparse

from upscale_video_tpu.pipeline.calibrate import run_calibration
from upscale_video_tpu.utils.logsetup import setup_logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="test-chips", description="List TPU chips and calibrate batch depth",
    )
    p.add_argument(
        "-g", "--chips",
        help="Chips to test, e.g. 0,0,1 (repetition deepens the batch).",
    )
    p.add_argument("-s", "--scale", type=int, default=2, help="Scale 2 or 4.")
    p.add_argument("-r", "--runs", type=int, default=10, help="Timed runs per point.")
    p.add_argument(
        "--batch_depths", default="1,2,4,8",
        help="Comma-separated frames-per-step candidates.",
    )
    p.add_argument("--height", type=int, default=540)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--model_path")
    p.add_argument("--synthetic_models", action="store_true")
    p.add_argument("--precision", choices=["bf16", "f32"], default="bf16")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_logging(None, None, None)
    run_calibration(
        chips=args.chips,
        scale=args.scale,
        runs=args.runs,
        batch_depths=[int(x) for x in args.batch_depths.split(",")],
        height=args.height,
        width=args.width,
        model_path=args.model_path,
        synthetic_models=args.synthetic_models,
        precision=args.precision,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Shared argparse option groups for the CLI tools."""

from __future__ import annotations

import argparse


def add_model_chain_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "-m", "--models",
        help="Additional processing: 'a' for anime deblur, 'n={level}' for "
             "denoise (1-30), 'r' for real-life 4x model. Example: -m a,n=3,r. "
             "Also 'sr={stem}' to use a custom SR model file "
             "{scale}{stem}.param/.bin (e.g. from vsr-import).",
    )
    p.add_argument(
        "-s", "--scale", type=int, default=2,
        help="Scale 1, 2 or 4 (default 2; 'r' forces 4).",
    )
    p.add_argument(
        "--model_path",
        help="Directory with ncnn .param/.bin model files "
             "(default: $UPSCALE_TPU_MODEL_PATH or ./models).",
    )
    p.add_argument(
        "--synthetic_models", action="store_true",
        help="Use random-weight stand-in models (benchmarks/tests).",
    )


def add_compute_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "-g", "--chips",
        help="TPU chips to use, e.g. 0,1 (repetition deepens the per-chip "
             "frame batch, like the reference's workers-per-GPU).",
    )
    p.add_argument(
        "--precision", choices=["bf16", "f32"], default="bf16",
        help="bf16 = fast MXU path (default); f32 = max quality.",
    )
    p.add_argument(
        "--tile_size", type=int, default=0,
        help="Spatial tile budget for HBM-bounded frames (0 = whole "
             "frame; the reference hardcoded 960).  Tiles are "
             "geometry-fit: the budget sets the grid, each tile shrinks "
             "to just cover the frame (ops/tiling.fit_tile_grid).",
    )
    p.add_argument(
        "--halo", type=int, default=16,
        help="Tile context border in pixels (the reference hardcoded 10).",
    )
    p.add_argument(
        "--frames_per_step", type=int, default=4,
        help="Frames per device step (on-chip batch).",
    )
    p.add_argument(
        "--parallel", choices=["dp", "sp", "tp"], default="dp",
        help="Multi-chip mode for -g: dp = frames across chips "
             "(throughput), sp = each frame's rows across chips (latency), "
             "tp = conv channels across chips (latency; per-layer ICI "
             "collectives — only wins on channel-heavy models like Valar).",
    )
    p.add_argument(
        "--tta", action="store_true",
        help="x8 self-ensemble: average the SR stage over the 8 dihedral "
             "transforms of each frame (quality knob, ~8x the SR compute; "
             "beyond the reference and its upstream runner).",
    )
    p.add_argument(
        "--conv_impl", choices=["auto", "xla", "pallas", "rdb"], default="auto",
        help="Convolution backend. auto (default) = XLA conv fusions for "
             "the Compact family + the fused residual-dense-block kernel "
             "for -m r (1.36x over the XLA dense-scatter rewrite, "
             "hardware-bit-exact); xla = pure-XLA everywhere; "
             "pallas/rdb = explicit kernel choices.",
    )


def add_io_args(p: argparse.ArgumentParser, ffmpeg_required: bool = False) -> None:
    p.add_argument(
        "-f", "--ffmpeg", required=ffmpeg_required,
        help="Location of ffmpeg (optional: without it, .y4m files and PNG "
             "directories are handled natively).",
    )
    p.add_argument(
        "-t", "--temp_dir",
        help="Temp directory (default tempfile.gettempdir()).",
    )


def add_logging_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-l", "--log_level", type=int,
                   help="Logging level (default logging.INFO).")
    p.add_argument("-d", "--log_dir", help="Directory for per-video log files.")

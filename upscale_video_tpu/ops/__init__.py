"""Compute ops: pixel-domain transforms, haloed tiling, denoise kernels."""

from upscale_video_tpu.ops.pixel import (
    bgr_to_rgb,
    frames_to_model,
    model_to_frames,
    pad_to_multiple,
    rgb_to_bgr,
)
from upscale_video_tpu.ops.tiling import tiled_apply
from upscale_video_tpu.ops.nlmeans import nl_means_denoise

__all__ = [
    "bgr_to_rgb",
    "rgb_to_bgr",
    "frames_to_model",
    "model_to_frames",
    "pad_to_multiple",
    "tiled_apply",
    "nl_means_denoise",
]

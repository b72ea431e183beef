"""Model layer: ncnn .param/.bin -> JAX pytrees + jittable forward functions."""

from upscale_video_tpu.models.param_parser import NcnnGraph, NcnnLayer, parse_param
from upscale_video_tpu.models.bin_loader import load_weights, synthesize_weights
from upscale_video_tpu.models.executor import build_forward
from upscale_video_tpu.models.zoo import Model, load_model, resolve_model_path

__all__ = [
    "NcnnGraph",
    "NcnnLayer",
    "parse_param",
    "load_weights",
    "synthesize_weights",
    "build_forward",
    "Model",
    "load_model",
    "resolve_model_path",
]

"""Pixel-domain ops: normalization, channel order, padding.

The reference's per-frame pixel pipeline is: cv2 ``imread`` (BGR uint8) ->
``ncnn.Mat.from_pixels(PIXEL_BGR)`` -> ``substract_mean_normalize`` by
1/255 -> network -> CHW->HWC transpose -> ``*255`` -> ``imwrite``
(upscale/upscale_processing.py:263-288).  Net effect: the models see
**BGR floats in [0,1]**.

Here the same normalization happens on-device so it fuses into the model
program: uint8 frames go host->HBM as-is (3 bytes/px over PCIe instead of
12 for f32) and the ``/255`` + channel flip are free VPU work fused by XLA
into the first convolution's input.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def rgb_to_bgr(x: jnp.ndarray) -> jnp.ndarray:
    """Flip the channel axis (last dim). Involution: also bgr_to_rgb."""
    return x[..., ::-1]


bgr_to_rgb = rgb_to_bgr


def frames_to_model(
    frames_u8: jnp.ndarray, channel_order: str = "bgr"
) -> jnp.ndarray:
    """uint8 RGB frames (N,H,W,3) -> model-domain float in [0,1].

    ``channel_order='bgr'`` reproduces the reference's PIXEL_BGR feed
    (upscale_processing.py:265-273); decoded frames are RGB (ffmpeg
    ``-pix_fmt rgb24``, upscale_processing.py:223-224), so the flip here is
    exactly the cv2-imread-BGR behaviour the zoo models were run with.
    """
    x = frames_u8.astype(jnp.float32) * (1.0 / 255.0)
    if channel_order == "bgr":
        x = rgb_to_bgr(x)
    return x


def model_to_frames(
    y: jnp.ndarray, channel_order: str = "bgr"
) -> jnp.ndarray:
    """Model output float -> uint8 RGB frames, matching the reference's
    ``*255`` + image-writer clamp/round (upscale_processing.py:284-288)."""
    if channel_order == "bgr":
        y = bgr_to_rgb(y)
    y = y * 255.0
    y = jnp.clip(jnp.round(y), 0.0, 255.0)
    return y.astype(jnp.uint8)


def planar_to_frames(p: np.ndarray, s: int,
                     out: Optional[np.ndarray] = None) -> np.ndarray:
    """Host-side pixel-shuffle interleave of a *shuffle-planar* frame.

    ``p`` is uint8 ``(H, W, 3*s*s)`` (or batched ``(N, H, W, 3*s*s)``) in
    ``(i, j, c)`` plane order — the output of the device program built with
    ``planar_tail=True`` (models/executor.py:_planar_tail_u8): plane
    ``(i, j)`` holds the stride-``s`` subgrid of the upscaled image at
    offset ``(i, j)``.  Returns ``(H*s, W*s, 3)`` RGB.

    The interleave crosses TPU (8,128) tile boundaries with a 3-wide minor
    dim and measured ~6.5-14 ms/frame of device relayout at 4K; on the
    host it is one C-contiguous transpose-copy (~the cost of a memcpy),
    running on the sink thread where it overlaps device compute.

    Hardware parity evidence: bit-exact (maxdiff 0) vs the standard emit
    path on the real chip with the real 2x AND 4x Compact pretrained
    weights (bf16); <=1 u8 LSB guaranteed in general (see executor).
    """
    p = np.asarray(p)
    if p.ndim == 4:
        if out is None:
            return np.stack([planar_to_frames(f, s) for f in p])
        for i in range(p.shape[0]):  # fill the caller's buffer per frame
            planar_to_frames(p[i], s, out=out[i])
        return out
    h, w, c = p.shape
    if c % (s * s):
        # survives `python -O` (a wrong factor would mis-stride the
        # interleave and corrupt or overrun the buffers)
        raise ValueError(f"{c} planes not divisible by s*s for s={s}")
    co = c // (s * s)
    if p.dtype == np.uint8 and s > 1:
        # native path: threaded strided memcpy (~3x the numpy transpose,
        # keeps the sink thread ahead of multi-chip dp rates).  ``out``
        # lets hot-path callers (AsyncSink's transform) reuse one buffer —
        # a fresh 25 MB allocation per 4K frame costs more in page faults
        # than the interleave itself on small hosts (round-3 load test).
        # co=3 is the RGB contract, co=1 the 4:2:0 plane assembly.
        from upscale_video_tpu.native.imgproc import (
            native_available, planar_interleave,
        )

        if native_available():
            return planar_interleave(p, s, out=out, channels=co)
    v = p.reshape(h, w, s, s, co).transpose(0, 2, 1, 3, 4)
    if out is not None:
        np.copyto(out.reshape(h, s, w, s, co), v)
        return out
    return np.ascontiguousarray(v).reshape(h * s, w * s, co)


def pad_to_multiple(
    x: jnp.ndarray, multiple_h: int, multiple_w: int, mode: str = "edge"
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Pad H/W (axes -3/-2) up to multiples; returns (padded, (ph, pw)).

    XLA wants static shapes — the pipeline buckets frame geometry by
    padding to a coarse grid so one compiled program serves a whole video
    (SURVEY.md §7 hard part (d)).  Edge padding keeps SR border artifacts
    negligible versus zero padding.
    """
    h, w = x.shape[-3], x.shape[-2]
    ph = (-h) % multiple_h
    pw = (-w) % multiple_w
    if ph == 0 and pw == 0:
        return x, (0, 0)
    pad = [(0, 0)] * x.ndim
    pad[-3] = (0, ph)
    pad[-2] = (0, pw)
    return jnp.pad(x, pad, mode=mode), (ph, pw)


def unpad(y: jnp.ndarray, pads: Tuple[int, int], scale: int = 1) -> jnp.ndarray:
    """Crop the scale-multiplied padding added by :func:`pad_to_multiple`."""
    ph, pw = pads
    h = y.shape[-3] - ph * scale
    w = y.shape[-2] - pw * scale
    return y[..., :h, :w, :]


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """PSNR in dB between two images/arrays (quality gate metric,
    BASELINE.md north star: <=1e-2 PSNR delta)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)

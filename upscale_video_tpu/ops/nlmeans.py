"""On-TPU non-local-means colour denoise.

Replaces the reference's ``cv2.fastNlMeansDenoisingColored(img, None, h, h,
templateWindowSize=5, searchWindowSize=9)`` OpenCL pass
(upscale/upscale_processing.py:350-361), which ran in a separate CPU
process pool and round-tripped every frame through PNG files.  Here the
denoise is a pure JAX function over the same 5x5 patch / 9x9 search
geometry, so the pipeline can fuse **denoise -> deblur -> SR into one
device program** with zero host round-trips (SURVEY.md §7 layer 4).

Algorithm: canonical NL-means (Buades et al.) on RGB jointly.  For every
offset ``t`` in the search window, the patch distance is a 5x5 box filter
of the per-pixel squared difference; weights are ``exp(-max(d - 2s^2, 0) /
h^2)``.  This matches cv2's weighting formula class; cv2's LUT-quantized
fast path and per-channel-Lab split are intentionally not reproduced (the
knob semantics — ``h`` in 0..30 on a 0..255 scale, clamped by the CLI like
the reference at upscale_processing.py:784-789 — are preserved).

The search loop is a ``lax.scan`` over a static offset table with
``dynamic_slice`` reads from one reflect-padded buffer — compiles to a
compact program instead of 81 unrolled HLO copies.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 2  # templateWindowSize = 5
SEARCH_RADIUS = 4  # searchWindowSize = 9


def _box_filter_valid(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Mean over a (2r+1)^2 window, VALID padding: (H+2r, W+2r) -> (H, W)."""
    k = 2 * radius + 1
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(k, k),
        window_strides=(1, 1),
        padding="VALID",
    )
    return s / (k * k)


@functools.partial(jax.jit, static_argnames=("patch_radius", "search_radius"))
def nl_means_denoise(
    img: jnp.ndarray,
    h: jnp.ndarray | float,
    sigma: jnp.ndarray | float = 0.0,
    patch_radius: int = PATCH_RADIUS,
    search_radius: int = SEARCH_RADIUS,
) -> jnp.ndarray:
    """Denoise one frame.

    Args:
      img: (H, W, C) float in [0, 1] (model domain).
      h: filter strength on the reference's 0..255 scale (CLI ``n=K``,
        1..30); larger removes more noise.
      sigma: optional noise stddev (0..255 scale) for the ``d - 2s^2``
        offset; 0 reproduces the plain exponential weighting.

    Returns: (H, W, C) denoised float frame.
    """
    if img.ndim != 3:
        raise ValueError(f"expected (H, W, C), got {img.shape}")
    hgt, wid, ch = img.shape
    pr, sr = patch_radius, search_radius
    pad = pr + sr

    x = img.astype(jnp.float32)
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")

    # center crop with patch margin: (H+2pr, W+2pr, C)
    base_p = jax.lax.dynamic_slice(
        xp, (sr, sr, 0), (hgt + 2 * pr, wid + 2 * pr, ch)
    )

    h_eff = jnp.asarray(h, jnp.float32) / 255.0
    s_eff = jnp.asarray(sigma, jnp.float32) / 255.0
    inv_h2 = 1.0 / jnp.maximum(h_eff * h_eff, 1e-12)

    offs = np.stack(
        np.meshgrid(
            np.arange(-sr, sr + 1), np.arange(-sr, sr + 1), indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 2)
    offsets = jnp.asarray(offs + sr, dtype=jnp.int32)  # shifted to [0, 2sr]

    def body(carry, off):
        num, den = carry
        dy, dx = off[0], off[1]
        shifted_p = jax.lax.dynamic_slice(
            xp, (dy, dx, 0), (hgt + 2 * pr, wid + 2 * pr, ch)
        )
        diff2 = jnp.mean((base_p - shifted_p) ** 2, axis=-1)
        d = _box_filter_valid(diff2, pr)
        w = jnp.exp(-jnp.maximum(d - 2.0 * s_eff * s_eff, 0.0) * inv_h2)
        center = shifted_p[pr : pr + hgt, pr : pr + wid, :]
        return (num + w[..., None] * center, den + w), None

    num0 = jnp.zeros((hgt, wid, ch), jnp.float32)
    den0 = jnp.zeros((hgt, wid), jnp.float32)
    (num, den), _ = jax.lax.scan(body, (num0, den0), offsets)
    return num / den[..., None]


def nl_means_denoise_batch(imgs: jnp.ndarray, h, sigma=0.0) -> jnp.ndarray:
    """(N, H, W, C) batched denoise."""
    return jax.vmap(lambda im: nl_means_denoise(im, h, sigma))(imgs)

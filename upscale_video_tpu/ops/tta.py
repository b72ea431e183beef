"""x8 self-ensemble (test-time augmentation) for SR quality.

Averages the SR network over the 8 dihedral transforms of the input
(4 rotations x optional horizontal flip) — the classic ESRGAN "enhanced
prediction" trick.  Neither the reference nor its upstream realesrgan
runner exposes this; it is a quality-vs-compute knob (8x the SR FLOPs for
typically +0.1-0.2 dB) worth having for hero shots, and it maps well to
the TPU: all eight variants run through the same jitted program (two
compiled geometries when H != W, since rotations transpose the frame) and
the averaging fuses into the epilogue.

``--tta`` forces the ordinary full-frame output contract (the
shuffle-planar and 4:2:0 fast paths assume one un-transformed pass).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def dihedral(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Apply dihedral transform k (0..7) to NHWC: k%4 quarter-rotations in
    the (H, W) plane, then a horizontal flip when k >= 4."""
    r, f = k % 4, k >= 4
    if r:
        x = jnp.rot90(x, r, axes=(1, 2))
    if f:
        x = x[:, :, ::-1]
    return x


def inverse_dihedral(y: jnp.ndarray, k: int) -> jnp.ndarray:
    r, f = k % 4, k >= 4
    if f:
        y = y[:, :, ::-1]
    if r:
        y = jnp.rot90(y, -r, axes=(1, 2))
    return y


def tta_apply(fn: Callable[[jnp.ndarray], jnp.ndarray],
              x: jnp.ndarray) -> jnp.ndarray:
    """Average ``fn`` (batched NHWC -> NHWC, translation/geometry
    preserving up to an integer scale) over the 8 dihedral transforms.
    Accumulates in f32; returns the input's dtype class (f32 result)."""
    acc = None
    for k in range(8):
        y = inverse_dihedral(fn(dihedral(x, k)), k).astype(jnp.float32)
        acc = y if acc is None else acc + y
    return acc / 8.0

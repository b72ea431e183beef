"""Pallas TPU kernel for NL-means denoise.

The XLA formulation in :mod:`upscale_video_tpu.ops.nlmeans` walks 81 search
offsets as separate fused passes; each pass re-reads the frame from HBM.
This kernel DMAs ONE haloed tile into VMEM and computes all 81 offset
weights in-register: HBM read traffic is ~2.7x the frame size at the
default tile_w=256 (the 128-lane DMA alignment forces a 2*128-column
over-fetch per tile; a larger tile_w amortizes it) versus the XLA
formulation's 81x — and the op stays VPU-bound either way (measured tie
at 1080p, NOTES.md, because both are compute-bound).

Mosaic constraints that shaped the kernel (discovered the hard way):

- DMA window sizes AND offsets must respect the (8, 128) sublane/lane
  tiling => the halo is over-fetched to aligned sizes and the tile window
  is made tall enough to cover every row offset, so all in-kernel slices
  are **static**.
- the 81 search offsets run in a ``fori_loop`` whose shifts are traced
  values: ``pltpu.roll`` MISCOMPILES negative traced shifts silently on
  hardware (interpret mode follows numpy and hides it) => shifts are the
  modular complements ``(size - d) % size``, always non-negative.
- accumulators are carried as loop values (the loop body keeps liveness
  to one offset's temporaries; a FULLY unrolled search was tried first
  and overflowed the VMEM stack with 81 live groups).

Layout: planar (3, H, W) float32, W on lanes.  Semantics match
``nl_means_denoise`` (5x5 patch, 9x9 search, ``exp(-max(d-2s^2,0)/h^2)``
weights); equality is asserted in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from upscale_video_tpu.ops.common import round_up

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_RADIUS = 2
SEARCH_RADIUS = 4
PAD = PATCH_RADIUS + SEARCH_RADIUS  # 6
# per-side over-fetch so DMA sizes/offsets hit the (8, 128) tiling
ALIGN_H = 8
ALIGN_W = 128
N_OFF = 2 * SEARCH_RADIUS + 1  # 9
WIN_EXTRA_H = 2 * ALIGN_H + N_OFF - 1  # rows beyond th in the DMA window
WIN_H_PAD = (-WIN_EXTRA_H) % 8  # round window height to sublane multiple


def _nlm_kernel(h_ref, x_hbm, out_ref, win, sem, *, th: int, tw: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    pr, sr = PATCH_RADIUS, SEARCH_RADIUS
    oy = ALIGN_H - PAD  # leading over-fetched rows/cols to skip
    ox = ALIGN_W - PAD
    win_h = th + WIN_EXTRA_H + WIN_H_PAD
    win_w = tw + 2 * ALIGN_W

    dma = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(i * th, win_h), pl.ds(j * tw, win_w)],
        win,
        sem,
    )
    dma.start()

    h = h_ref[0, 0] * (1.0 / 255.0)
    s = h_ref[0, 1] * (1.0 / 255.0)
    inv_h2 = 1.0 / jnp.maximum(h * h, 1e-12)
    two_s2 = 2.0 * s * s

    dma.wait()
    ext = win[:, :, :]
    base = ext[:, oy + sr : oy + sr + th + 2 * pr,
               ox + sr : ox + sr + tw + 2 * pr]

    def body(k, carry):
        # real loop (NOT unrolled): Mosaic does not reuse VMEM stack slots
        # across unrolled iterations, so 81 unrolled bodies OOM the stack.
        # Dynamic vector loads are illegal, so the shifted window is
        # produced by dynamic *rotates* + static slices instead.
        # Shifts must be NON-NEGATIVE: Mosaic rejects negative static
        # shifts at trace time but silently miscompiles negative *traced*
        # shifts on hardware (observed as all-81-weights underflow at ~2%
        # of pixels -> 0/0 NaNs; interpret mode masks it) — so roll by the
        # modular complement instead of -dy.
        num, den = carry
        dy = k // N_OFF
        dx = k % N_OFF
        h_sz, w_sz = ext.shape[1], ext.shape[2]
        rolled = pltpu.roll(ext, (h_sz - dy) % h_sz, axis=1)
        rolled = pltpu.roll(rolled, (w_sz - dx) % w_sz, axis=2)
        # the wrap-around rows/cols land beyond the slice we read
        sh = rolled[:, oy : oy + th + 2 * pr, ox : ox + tw + 2 * pr]
        diff2 = jnp.mean((base - sh) ** 2, axis=0)  # (th+4, tw+4)
        # separable 5x5 box: rows then cols, static shifted adds
        rows = diff2[0:th, :]
        for m in range(1, 2 * pr + 1):
            rows = rows + diff2[m : m + th, :]
        box = rows[:, 0:tw]
        for m in range(1, 2 * pr + 1):
            box = box + rows[:, m : m + tw]
        d = box * (1.0 / ((2 * pr + 1) ** 2))
        w = jnp.exp(-jnp.maximum(d - two_s2, 0.0) * inv_h2)
        center = sh[:, pr : pr + th, pr : pr + tw]
        return num + w[None, :, :] * center, den + w[None, :, :]

    num0 = jnp.zeros((3, th, tw), jnp.float32)
    den0 = jnp.zeros((1, th, tw), jnp.float32)
    num, den = jax.lax.fori_loop(0, N_OFF * N_OFF, body, (num0, den0))

    out_ref[:, :, :] = num / den


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "interpret")
)
def nl_means_denoise_pallas(
    img: jnp.ndarray,
    h,
    sigma=0.0,
    tile_h: int = 64,
    tile_w: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Denoise one (H, W, 3) RGB frame in [0,1]; drop-in for
    :func:`upscale_video_tpu.ops.nlmeans.nl_means_denoise` on 3-channel
    frames (the kernel's accumulators are built for exactly 3 planes —
    matching the reference's fastNlMeansDenoisingColored, which is also
    colour-only).

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests).  Frames are padded up to the tile grid and cropped back.
    """
    hgt, wid, ch = img.shape
    if ch != 3:
        raise ValueError(
            f"nl_means_denoise_pallas handles 3-channel frames, got {ch} "
            "(use ops.nlmeans.nl_means_denoise for other channel counts)"
        )
    th = min(tile_h, round_up(hgt, 8))
    tw = min(tile_w, round_up(wid, 128))
    gy = -(-hgt // th)
    gx = -(-wid // tw)

    # reflect-pad by the search+patch halo, then edge-pad out to the
    # alignment-rounded DMA grid
    x = jnp.pad(
        img.astype(jnp.float32),
        ((PAD, PAD), (PAD, PAD), (0, 0)),
        mode="reflect",
    )
    lead_h, lead_w = ALIGN_H - PAD, ALIGN_W - PAD
    total_h = gy * th + WIN_EXTRA_H + WIN_H_PAD
    total_w = gx * tw + 2 * ALIGN_W
    x = jnp.pad(
        x,
        (
            (lead_h, total_h - lead_h - (hgt + 2 * PAD)),
            (lead_w, total_w - lead_w - (wid + 2 * PAD)),
            (0, 0),
        ),
        mode="edge",
    )
    xp = x.transpose(2, 0, 1)  # planar (C, Hp, Wp)

    hparam = jnp.array([[h, sigma]], dtype=jnp.float32)

    out = pl.pallas_call(
        functools.partial(_nlm_kernel, th=th, tw=tw),
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (ch, th, tw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ch, gy * th, gx * tw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(
                (ch, th + WIN_EXTRA_H + WIN_H_PAD, tw + 2 * ALIGN_W),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(hparam, xp)

    return out.transpose(1, 2, 0)[:hgt, :wid, :]



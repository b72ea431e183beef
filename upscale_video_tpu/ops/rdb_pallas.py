"""Fused residual-dense-block (RDB) kernel — the Valar round-3 rewrite.

The round-3 profile of the dense-scatter XLA path (NOTES.md) shows the
wide scatter convs are efficient (~90 ms of a 283 ms 480px Valar tile at
~89 TFLOP/s) while ~190 ms is elementwise fusion work: piece buffers,
accumulation, and activations shuttling 32-channel tensors through HBM.
This kernel computes an ENTIRE ESRGAN RDB

    c1 = lrelu(conv(x));  c_t = lrelu(conv(cat(x, c1..c_{t-1})))
    out = x + 0.2 * c5                     (c5 linear)

in one ``pallas_call``: the scatter decomposition's per-source wide
matmuls (``K = 9*cin``, ``N = sum of downstream widths`` — the MXU-fill
trick from executor._plan_dense_scatter) run back to back with the
accumulators resident in a VMEM scratch, so no piece buffer, partial sum,
or 32-lane activation ever reaches HBM.

Geometry: overlap-and-discard.  The caller embeds the (H, W, 64) input at
offset (5, 8) of a zero (Hp, Wp, 128) HBM buffer (5 = the RDB's receptive
halo, 8 = lane-tile column alignment, zeros = conv zero padding at frame
borders).  Each grid tile DMAs its haloed window and evaluates the five
stages on statically shrinking regions (G1 = tile+8 ... G5 = tile), so
border garbage from missing context never reaches the written center.

Reference: models/4x_Valar_v1.param dense blocks (SURVEY.md §2.2);
upscale_processing.py:913-914 selects this model for ``-m r``.
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from upscale_video_tpu.ops.common import round_up

LANES = 128
HALO = 5  # five 3x3 convs
GC = 32   # ESRGAN growth channels
NF = 64   # trunk feature width

VMEM_LIMIT_BYTES = 110 * 1024 * 1024  # the pallas_call compiler budget


def vmem_limit_bytes() -> int:
    """The kernel VMEM budget, env-overridable for the boundary
    experiments (``UPSCALE_TPU_RDB_VMEM_LIMIT``, bytes): raising it to
    the chip's 128M lets a guard-rejected geometry actually compile so
    the 2.5x spill factor in :func:`est_vmem_bytes` can be verified on
    more than the single round-4 failure.  Never set in product paths."""
    raw = os.environ.get("UPSCALE_TPU_RDB_VMEM_LIMIT", "")
    return int(raw) if raw.strip() else VMEM_LIMIT_BYTES


def auto_tile_h(h8: int) -> int:
    """Default tile height for an ``h8``-row (8-aligned) kernel input:
    the largest measured-good height that divides h8 EXACTLY, else 32.

    Exact fit beats raw tile size on hardware: at the shipped 1080p tiled
    geometry (392-row haloed tiles) th=28 (14x28 exact) measured
    1.92 ms/RDB vs th=32's 2.62 (1.36x) — 392/32 pads the grid to 13x32 =
    416 rows (6% waste) and takes the ragged-padding path Mosaic compiles
    slower.  Among exact fits, taller wins (lower G1 halo-compute
    overhead): th=48 at 480px measured 2.171 ms/RDB vs th=32's 2.462
    (1.13x, .hwlogs/rdb_th_ab_r4s3.log), bit-exact, compile 1088 s vs
    476 — amortized by the persistent compile cache.  th>=56 is
    VMEM-refuted (est_vmem_bytes); 8/16 only matter for tiny inputs.
    """
    for cand in (48, 32, 28, 24, 20, 16):
        if h8 % cand == 0:
            return cand
    return 32


def est_vmem_bytes(th: int, tw: int) -> int:
    """Pre-compile VMEM estimate for one (th, tw) kernel tile.

    Rejecting an over-budget geometry here costs microseconds; letting
    Mosaic discover it costs ~18 minutes of compile before a permanent
    RESOURCE_EXHAUSTED (observed round 4: th=56/tw=512 at 392x512 needed
    129.7M of the chip's 128M VMEM — 14.7M double-buffered output window,
    8.5M input scratch, 107M register-allocator spill slots).  The spill
    term scales with the per-stage G1 im2col patch matrix
    ((th+8)*(tw+8) x 576 bf16); the 2.5x factor is fit to that observed
    failure while passing the measured-good th=32 configs.
    """
    out_window = th * tw * LANES * 2 * 2  # bf16, 2 buffering levels
    scratch = (th + 2 * HALO) * (tw + 16) * LANES * 2
    patches = (th + 8) * (tw + 8) * 576 * 2
    return out_window + scratch + int(2.5 * patches)


IM2COL_MODES = ("patch9", "row3", "row3h", "pack12")
MASK_MODES = ("iota", "slab", "off")


def slab_mask_ok(th: int, tw: int, valid_h: int, valid_w: int) -> bool:
    """Whether the ``slab`` frame-mask mode is valid for this geometry.

    ``slab`` replaces the per-stage full-surface iota/compare/select
    frame mask (measured 0.28 ms/RDB of the 2.91 at the shipped
    576x512/th=48 geometry — .hwlogs/rdb_ablate_a_r5.log) with (a) a
    static column slice folded into the canvas pad and (b) row masking
    restricted to the 4-row G1 edge strips.  That restriction is only
    sound when out-of-frame rows cannot reach past the strips: the grid
    must fit the height EXACTLY (ragged last tiles put out-of-frame rows
    arbitrarily deep into G1) and there must be a single tile column
    (the column slice is static only when j == 0 always).  The shipped
    :func:`auto_tile_h` policy prefers exactly these grids.
    """
    gy = -(-valid_h // th)
    gx = -(-valid_w // tw)
    return gx == 1 and gy * th == valid_h


def env_mask_mode(mode) -> str:
    """Normalize a frame-mask request against the ``UPSCALE_TPU_RDB_MASK``
    env knob (a hardware winner ships without a code change).  Accepts
    the legacy bools: True = env default, False = off (ablation only).
    Runs OUTSIDE jit so an env change is part of the call, not baked
    into a stale trace cache."""
    if mode is True or mode is None:
        # default stays "iota" until the slab hardware A/B lands (Mosaic
        # lowering is only provable on the chip; interpret mode validates
        # math, never lowering — NOTES round 4)
        mode = os.environ.get("UPSCALE_TPU_RDB_MASK", "iota").strip()
    elif mode is False:
        mode = "off"
    if mode != "auto" and mode not in MASK_MODES:
        raise ValueError(
            f"frame-mask mode {mode!r}; expected auto or one of {MASK_MODES}")
    return mode


def resolve_mask_mode(mode, th: int, tw: int,
                      valid_h: int, valid_w: int) -> str:
    """Resolve a frame-mask mode against the tile geometry: ``auto`` =
    slab where valid, else iota; an explicit ``slab`` on an unsupported
    geometry falls back to iota with a warning."""
    mode = env_mask_mode(mode)
    if mode == "auto":
        return "slab" if slab_mask_ok(th, tw, valid_h, valid_w) else "iota"
    if mode == "slab" and not slab_mask_ok(th, tw, valid_h, valid_w):
        warnings.warn(
            f"slab frame mask needs an exact-fit single-column grid; "
            f"geometry th={th} tw={tw} valid={valid_h}x{valid_w} falls "
            "back to iota", stacklevel=2)
        mode = "iota"
    return mode


def pack_rdb_weights(ws: Sequence, bs: Sequence, im2col: str = "patch9"):
    """Per-source scatter weight concatenation for one RDB.

    ``ws``: five HWIO conv weights (3,3,cin_t,cout_t) with
    cin_t = NF + (t-1)*GC, cout = GC (t<5) / NF (t=5); ``bs``: biases.
    Returns (wmats, biases): for ``im2col="patch9"`` wmats[s] is
    ``(9*cs, N_s)`` — source s's contribution rows to every downstream
    target, K laid out (dy,dx)-major to match the kernel's im2col concat.
    For ``"row3"`` wmats[s] is ``(3, 3*cs, N_s)`` — one K=(dx,ch) matrix
    per kernel ROW, matching the kernel's 3-dot row-grouped formulation
    (the dy shift becomes a free outer-dim slice of one shared
    column-shift buffer, cutting the per-stage patch-copy volume 3x).
    ``"row3h"`` (hybrid) keeps patch9 for source 0 — its K=9*64=576 is
    MXU-exact, which the 3-dot split would pad 192->256 — and row3 for
    sources 1..4, whose K=288 pads to 384 either way.

    ``"pack12"`` is the round-5 K-pad lever (NOTES ledger item 2): c1's
    solo dot shrinks to its ONE real target (c2: K=288->384 padded but
    N=32->128 instead of N=160->256), and once c2 exists the pair
    [c1,c2] feeds c3/c4/c5 as ONE 64-channel patch9 dot — K=9*64=576
    and N=32+32+64=128, both MXU-EXACT (the padded MXU volume of
    stages 1+2 drops 147456 -> 122880 units/row, 1.2x).  Sources 0/2
    are patch9 (576-exact K), sources 1/3/4 row3 (their K pads either
    way; row3 cuts their copy volume).  wmats[2] is the packed pair
    matrix; the kernel consumes it with ``pack12=True``.
    """
    if im2col not in IM2COL_MODES:
        raise ValueError(f"im2col={im2col!r}; expected one of {IM2COL_MODES}")
    if im2col == "pack12":
        f32 = jnp.float32

        def row3_w(cat):
            return jnp.asarray(
                cat.reshape(3, 3 * cat.shape[-2], cat.shape[-1]),
                jnp.bfloat16)

        def patch9_w(cat):
            return jnp.asarray(
                cat.reshape(9 * cat.shape[-2], cat.shape[-1]), jnp.bfloat16)

        # x -> every target (patch9, K=576 exact)
        cat0 = jnp.concatenate(
            [jnp.asarray(ws[t][:, :, 0:NF, :], f32) for t in range(5)], -1)
        # c1 -> c2 ONLY (row3)
        cat1 = jnp.asarray(ws[1][:, :, NF : NF + GC, :], f32)
        # [c1, c2] -> c3, c4, c5 (patch9, K=576 / N=128 exact)
        cat12 = jnp.concatenate(
            [jnp.asarray(ws[t][:, :, NF : NF + 2 * GC, :], f32)
             for t in range(2, 5)], -1)
        # c3 -> c4, c5 (row3)
        cat3 = jnp.concatenate(
            [jnp.asarray(ws[t][:, :, NF + 2 * GC : NF + 3 * GC, :], f32)
             for t in range(3, 5)], -1)
        # c4 -> c5 (row3)
        cat4 = jnp.asarray(ws[4][:, :, NF + 3 * GC : NF + 4 * GC, :], f32)
        wmats = [patch9_w(cat0), row3_w(cat1), patch9_w(cat12),
                 row3_w(cat3), row3_w(cat4)]
    else:
        wmats = []
        # source 0 = x (64 ch), sources 1..4 = c1..c4 (32 ch)
        for s in range(5):
            cs = NF if s == 0 else GC
            off = 0 if s == 0 else NF + (s - 1) * GC
            parts = [
                jnp.asarray(ws[t][:, :, off : off + cs, :], jnp.float32)
                for t in range(s, 5)
            ]
            cat = jnp.concatenate(parts, axis=-1)  # (3,3,cs,N_s)
            row3 = im2col == "row3" or (im2col == "row3h" and s > 0)
            shape = ((3, 3 * cs, cat.shape[-1]) if row3
                     else (9 * cs, cat.shape[-1]))
            wmats.append(jnp.asarray(cat.reshape(shape), jnp.bfloat16))
    biases = [
        jnp.asarray(b, jnp.float32).reshape(1, -1) for b in bs
    ]
    return wmats, biases


def resolve_im2col(im2col: Optional[str]) -> str:
    """Resolve an explicit/None im2col mode against the
    ``UPSCALE_TPU_RDB_IM2COL`` env knob (a hardware winner from
    tools/rdb_bench.py ships without a code change)."""
    if im2col is not None:
        mode = im2col
    else:
        mode = os.environ.get("UPSCALE_TPU_RDB_IM2COL", "patch9").strip()
    if mode not in IM2COL_MODES:
        raise ValueError(
            f"UPSCALE_TPU_RDB_IM2COL={mode!r}; expected one of {IM2COL_MODES}"
        )
    return mode


def _rdb_kernel(wx, w1, w2, w3, w4, b1, b2, b3, b4, b5, wskip, bskip,
                x_hbm, *rest, th: int, tw: int,
                slope: float, act5: bool, res_scale: float, valid_h: int,
                valid_w: int, has_skip: bool, add_c2_to_c4: bool,
                canvas_out: bool = False, comb_self: float = 1.0,
                comb_res: float = 0.0, mask_mode: str = "iota",
                pack12: bool = False):
    has_res = comb_res != 0.0
    if canvas_out:
        if has_res:
            res_hbm, out_ref, win, sem, yout, osem, rbuf, rsem = rest
        else:
            out_ref, win, sem, yout, osem = rest
            res_hbm = rbuf = rsem = None
    else:
        out_ref, win, sem = rest
        res_hbm = yout = osem = rbuf = rsem = None
    i = pl.program_id(0)
    j = pl.program_id(1)
    win_w = tw + 16

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * th, th + 2 * HALO), pl.ds(j * tw, win_w), :],
        win, sem,
    )
    dma.start()
    if has_res:
        # prefetch the residual's tile center while the window lands
        rdma = pltpu.make_async_copy(
            res_hbm.at[pl.ds(HALO + i * th, th), pl.ds(8 + j * tw, tw), :],
            rbuf, rsem,
        )
        rdma.start()
    dma.wait()
    if canvas_out:
        # canvas-resident chaining (round 4): the input canvas's ring and
        # grid-padding hold the PREVIOUS kernel's unwritten garbage, not
        # zeros — zero the window strips that fall outside the true frame
        # so they stand in for the reference's conv zero padding exactly
        # as the embed path's zeros did.  Window (r, c) is data
        # (i*th + r - 5, j*tw + c - 8).  Only frame-edge tiles pay: four
        # predicated static-slice stores replace the full-window
        # iota/compare/select of the first canvas kernel, whose VPU cost
        # (2.6M elements x 128 lanes) ate the glue it saved (measured
        # 2.451 vs 2.218 ms/RDB plain — .hwlogs round-4 A/B).
        gy = -(-valid_h // th)
        gx = -(-valid_w // tw)
        win_h = th + 2 * HALO
        rem_h = HALO + valid_h - (gy - 1) * th
        rem_w = 8 + valid_w - (gx - 1) * tw

        @pl.when(i == 0)
        def _zero_top():
            win[0:HALO, :, :] = jnp.zeros((HALO, win_w, LANES), jnp.bfloat16)

        if rem_h < win_h:
            @pl.when(i == gy - 1)
            def _zero_bottom():
                win[rem_h:, :, :] = jnp.zeros(
                    (win_h - rem_h, win_w, LANES), jnp.bfloat16)

        @pl.when(j == 0)
        def _zero_left():
            win[:, 0:8, :] = jnp.zeros((win_h, 8, LANES), jnp.bfloat16)

        if rem_w < win_w:
            @pl.when(j == gx - 1)
            def _zero_right():
                win[:, rem_w:, :] = jnp.zeros(
                    (win_h, win_w - rem_w, LANES), jnp.bfloat16)

    w = win[:, :, :]

    wmats = (wx, w1, w2, w3, w4)
    biases = (b1, b2, b3, b4, b5)
    widths = (GC, GC, GC, GC, NF)

    # Every stage is evaluated on the SAME G1 grid (th+8, tw+8) — tw+8 is
    # 8-aligned, so the im2col merge reshape keeps one tile-aligned shape
    # for all five stages.  (Two earlier formulations — accumulating into
    # a sliced f32 VMEM scratch, and per-stage SHRINKING regions — were
    # functionally correct in interpret mode but sent Mosaic's lowering
    # into 45+ minute compiles; ragged non-8-multiple merges are the
    # compile-time killer, a trivial kernel compiled in 0.4 s alongside.)
    # Each source c_s is only VALID on its G_s subregion; values outside
    # are masked to zero, so downstream convs see zeros there — harmless,
    # because every read is masked to the reader's own valid region and
    # the final center G5 is valid by construction.  ~1.3x halo-compute
    # overhead vs the valid region, the price of uniform shapes.
    g1h, g1w = th + 8, tw + 8

    def col_off(sc, jt):
        """Column offset of target jt within source sc's wide output."""
        return sum(widths[t] for t in range(sc, jt))

    # per dot: ((g1h, g1w, N) bf16 on G1, first target, last target).
    # Normal modes: entry s covers targets s..4; pack12 narrows c1's
    # entry to target 1 and adds the [c1,c2] pair entry covering 2..4.
    contribs = []

    def read_target(jt, sh, sw, goff):
        """Sum of contributions to target jt over a (sh, sw) region at
        offset ``goff`` within G1 (f32 accumulation; one bf16 rounding per
        piece — the XLA scatter path's own piece-buffer contract)."""
        total = None
        for c3, ft, lt in contribs:
            if not ft <= jt <= lt:
                continue
            piece = c3[goff : goff + sh, goff : goff + sw,
                       col_off(ft, jt) : col_off(ft, jt) + widths[jt]]
            piece = piece.astype(jnp.float32)
            total = piece if total is None else total + piece
        return total

    # frame mask, once per tile: the reference zero-pads EVERY
    # intermediate feature map at frame borders (each ncnn conv is
    # SAME-padded; the window halo only stands in for interior tile
    # boundaries).  G1 (g, h) is data (i*th + g - 4, j*tw + h - 4).
    # The per-stage G_s ring mask the round-3 kernel also applied is
    # redundant: a stage's garbage ring (positions with missing halo
    # context) only ever influences values OUTSIDE the next stage's
    # needed region, and the final center read (G5) touches valid data
    # exclusively — dropping it is bit-neutral on the written center
    # (tests/test_rdb_pallas.py) and deletes 5 iota/compare/select
    # passes per tile.  Built at full 3D shape (every masked stage is
    # GC-wide) — Mosaic rejects inserting a minor dim onto a 2D mask.
    # ``mask_mode="off"`` is an ABLATION knob (tools/rdb_bench.py): it
    # prices the mask by skipping it — numerically wrong at frame
    # borders, never a product path.  The ablation measured the iota
    # mask at 0.28 ms/RDB of 2.91 at the shipped 576x512/th=48 geometry
    # (.hwlogs/rdb_ablate_a_r5.log); ``"slab"`` recovers it on exact-fit
    # single-column grids (see :func:`slab_mask_ok`): columns fold into
    # the canvas pad as a STATIC slice, and rows are masked only on the
    # 4-row top/bottom G1 strips — the only places an out-of-frame row
    # can live on such grids.
    if mask_mode == "iota":
        shape3 = (g1h, g1w, GC)
        rows = (jax.lax.broadcasted_iota(jnp.int32, shape3, 0)
                + (pl.program_id(0) * th - 4))
        cols = (jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
                + (pl.program_id(1) * tw - 4))
        frame_ok = ((rows >= 0) & (rows < valid_h)
                    & (cols >= 0) & (cols < valid_w))
    elif mask_mode == "slab":
        srow = jax.lax.broadcasted_iota(jnp.int32, (4, g1w, GC), 0)
        # top strip g in [0,4): data row i*th + g - 4 (only the >= 0 side
        # can fail there on an exact-fit grid); bottom strip
        # g in [g1h-4, g1h): data row i*th + th + (g - (g1h-4))
        top_ok = (srow + (pl.program_id(0) * th - 4)) >= 0
        bot_ok = (srow + (pl.program_id(0) * th + th)) < valid_h

    c2_keep = None  # post-skip c2, re-added into c4 (Valar Add_14)
    c1_canvas = None  # pack12: c1's canvas, re-read for the pair dot
    for s in range(5):
        if s == 0:
            cs = NF
            canvas = w  # x in window coords, real halo + zero frame pad
        else:
            cs = GC
            wdt = widths[s - 1]
            val = read_target(s - 1, g1h, g1w, 0) + biases[s - 1][0, :]
            val = jnp.where(val >= 0, val, val * slope)
            if s == 2 and has_skip:
                # Valar variant (4x_Valar_v1.param Conv_6 + Add_7):
                # c2 = lrelu(conv4) + conv1x1(x); G1 (g, h) is window
                # (g+1, h+4)
                xg = w[1 : 1 + g1h, 4 : 4 + g1w, :NF]
                skip = jnp.dot(
                    xg.reshape(g1h * g1w, NF), wskip[:, :],
                    preferred_element_type=jnp.float32,
                ) + bskip[0, :]
                val = val + skip.reshape(g1h, g1w, wdt)
            if s == 4 and add_c2_to_c4:
                # Valar Add_14: c4 = lrelu(conv12) + c2 (post-skip value)
                val = val + c2_keep
            if mask_mode == "iota":
                val = jnp.where(frame_ok, val, jnp.zeros_like(val))
            elif mask_mode == "slab":
                zstrip = jnp.zeros((4, g1w, wdt), val.dtype)
                val = jnp.concatenate([
                    jnp.where(top_ok, val[:4], zstrip),
                    val[4 : g1h - 4],
                    jnp.where(bot_ok, val[g1h - 4 :], zstrip),
                ], axis=0)
            if s == 2:
                c2_keep = val
            # place the G1-grid source back into window coords (zero
            # surround) so every stage uses the one aligned slice pattern
            if mask_mode == "slab":
                # static column mask folded into the pad: keep only the
                # in-frame columns (G1 h in [4, 4+valid_w)) and widen the
                # zero borders over the dropped out-of-frame strips
                canvas = jnp.pad(
                    val.astype(jnp.bfloat16)[:, 4 : 4 + valid_w, :],
                    ((1, 1), (8, g1w - valid_w), (0, 0)),
                )
            else:
                canvas = jnp.pad(
                    val.astype(jnp.bfloat16), ((1, 1), (4, 4), (0, 0))
                )
            if pack12 and s == 1:
                c1_canvas = canvas
        if pack12 and s == 2:
            # the round-5 K-pad lever: one 64-channel [c1,c2] patch9 dot
            # (K=9*64=576 and N=32+32+64=128, both MXU-exact) feeds
            # c3/c4/c5; c1's solo dot above covered only c2 (see
            # pack_rdb_weights)
            canvas = jnp.concatenate([c1_canvas, canvas], axis=-1)
            cs = 2 * GC

        m = g1h * g1w
        if len(wmats[s].shape) == 3:
            # row3 im2col: ONE 3-column-shift buffer, then three
            # row-grouped dots (K = 3*cs) accumulated in f32.  The dy
            # shift is a sublane-aligned row slice of colcat (row stride
            # g1w is 8-aligned), so the sublane-shifted copy volume drops
            # from 9 to 3 per stage — the round-5 ledger's prime VPU
            # suspect.  For cs=32 the padded MXU cost is unchanged
            # (3 x K96->128 = today's K288->384); for cs=64 it pads
            # K192->256 (1.33x on s=0), which is why row3h keeps patch9
            # there.  The concat inputs are reshaped to 2D FIRST — the
            # same lowering pattern the shipped patch9 branch uses:
            # concatenating the raw 3D column-shift slices carries
            # mismatched sublane offsets (3/4/5) into tpu.concatenate,
            # which Mosaic rejects on hardware ("result/input offset
            # mismatch on non-concat dimension", .hwlogs/rdb_ablate_b/c
            # round 5) while interpret mode passes.
            colcat = jnp.concatenate(
                [canvas[:, 3 + b : 3 + b + g1w, :cs].reshape(
                    (g1h + 2) * g1w, cs) for b in range(3)],
                axis=-1,
            )  # ((g1h+2)*g1w, 3*cs), row-major over the shared canvas
            wrow = wmats[s][:, :, :]
            total = None
            for a in range(3):
                part = jnp.dot(
                    colcat[a * g1w : a * g1w + m], wrow[a],
                    preferred_element_type=jnp.float32,
                )
                total = part if total is None else total + part
            contrib = total
        else:
            patches = jnp.concatenate(
                [canvas[a : a + g1h, 3 + b : 3 + b + g1w, :cs].reshape(m, cs)
                 for a in range(3) for b in range(3)],
                axis=-1,
            )
            contrib = jnp.dot(patches, wmats[s][:, :],
                              preferred_element_type=jnp.float32)
        # pack12 target spans: c1's entry covers only c2; the pair entry
        # (s=2) covers c3..c5 with first_t=2 so col_off lands on target
        # offsets 0/32/64 inside its packed N=128
        last_t = 1 if (pack12 and s == 1) else 4
        contribs.append((
            contrib.reshape(g1h, g1w, contrib.shape[-1]).astype(jnp.bfloat16),
            s, last_t,
        ))

    # c5 on G5 == the tile center; out = x_center + 0.2 * c5
    c5 = read_target(4, th, tw, 4) + biases[4][0, :]
    if act5:
        c5 = jnp.where(c5 >= 0, c5, c5 * slope)
    x_center = w[HALO : HALO + th, 8 : 8 + tw, :NF].astype(jnp.float32)
    y = (x_center + res_scale * c5).astype(jnp.bfloat16)
    if has_res:
        # fused residual combine (the ESRGAN RRDB Eltwise, e.g.
        # 0.2*rdb3 + 1.0*rrdb_in): one bf16 multiply-add on the tile
        # center — bit-identical to the executor's canvas-eltwise branch
        # (per-operand bf16 product rounding, commutative sum) while
        # deleting a whole read-2/write-1 canvas pass per RRDB.
        rdma.wait()
        r = rbuf[:, :, :NF]
        y = (y * jnp.bfloat16(comb_self) + r * jnp.bfloat16(comb_res))
    y = jnp.concatenate(
        [y, jnp.zeros((th, tw, LANES - NF), jnp.bfloat16)], axis=-1
    )
    if canvas_out:
        # write only the tile center of the output canvas; the ring and
        # grid padding stay unwritten (every downstream read masks them)
        yout[:, :, :] = y
        odma = pltpu.make_async_copy(
            yout,
            out_ref.at[pl.ds(HALO + i * th, th), pl.ds(8 + j * tw, tw), :],
            osem,
        )
        odma.start()
        odma.wait()
    else:
        out_ref[:, :, :] = y


def rdb_apply(
    x: jnp.ndarray,
    ws: Sequence,
    bs: Sequence,
    tile_h: Optional[int] = None,
    tile_w: int = 256,
    slope: float = 0.2,
    act5: bool = False,
    res_scale: float = 0.2,
    skip_w=None,
    skip_b=None,
    add_c2_to_c4: bool = False,
    interpret: Optional[bool] = None,
    im2col: Optional[str] = None,
    frame_mask=True,
) -> jnp.ndarray:
    """One fused RDB over an (H, W, 64) bf16/f32 image; returns (H, W, 64)
    bf16.  ``ws``/``bs``: the five conv weights/biases (HWIO).

    Valar-variant hooks (4x_Valar_v1.param dense blocks): ``skip_w`` — a
    1x1 conv from x added into c2 post-activation (Conv_6/Add_7);
    ``add_c2_to_c4`` — re-add c2 into c4 (Add_14).

    ``tile_h`` defaults to ``UPSCALE_TPU_RDB_TILE_H`` (else the
    :func:`auto_tile_h` exact-fit policy — the round-4 measured winner)
    so a geometry-specific winner from tools/rdb_bench.py ships without
    a code change; the env value ``auto`` selects the policy explicitly.
    ``im2col`` defaults to ``UPSCALE_TPU_RDB_IM2COL`` (see
    :func:`pack_rdb_weights`).  ``frame_mask``: True (the
    ``UPSCALE_TPU_RDB_MASK`` env default), a :data:`MASK_MODES` string,
    or False — the rdb_bench mask-pricing ablation, never a product
    path (see :func:`resolve_mask_mode`)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile_h = resolve_tile_h(tile_h)
    mode = resolve_im2col(im2col)
    wmats, biases = pack_rdb_weights(ws, bs, mode)
    has_skip = skip_w is not None
    if has_skip:
        wsk = jnp.asarray(skip_w, jnp.float32).reshape(NF, GC)
        wsk = wsk.astype(jnp.bfloat16)
        bsk = (jnp.asarray(skip_b, jnp.float32).reshape(1, GC)
               if skip_b is not None else jnp.zeros((1, GC), jnp.float32))
    else:
        wsk = jnp.zeros((NF, GC), jnp.bfloat16)
        bsk = jnp.zeros((1, GC), jnp.float32)
    return _rdb_run(x, tuple(wmats), tuple(biases), wsk, bsk, tile_h,
                    tile_w, slope, act5, res_scale, has_skip,
                    add_c2_to_c4, env_mask_mode(frame_mask),
                    mode == "pack12", interpret)


def resolve_tile_h(tile_h: Optional[int]) -> int:
    """Resolve an explicit/None tile height against the
    ``UPSCALE_TPU_RDB_TILE_H`` env knob: returns 0 for the
    :func:`auto_tile_h` policy or a validated explicit height."""
    if tile_h is not None:
        return tile_h
    raw = os.environ.get("UPSCALE_TPU_RDB_TILE_H", "auto")
    if raw.strip().lower() == "auto":
        return 0  # geometry resolution applies auto_tile_h
    try:
        tile_h = int(raw)
    except ValueError:
        raise ValueError(
            f"UPSCALE_TPU_RDB_TILE_H={raw!r} is not an integer or 'auto'"
        ) from None
    if tile_h < 1:
        raise ValueError(f"UPSCALE_TPU_RDB_TILE_H={tile_h} must be >= 1")
    if tile_h % 8:
        warnings.warn(
            f"UPSCALE_TPU_RDB_TILE_H={tile_h} is not a multiple "
            "of 8 (TPU sublane); expect padding waste",
            stacklevel=2)
    return tile_h


def canvas_geometry(hgt: int, wid: int, tile_h: int = 0,
                    tile_w: int = 256):
    """Resolve the kernel grid for an (hgt, wid) image: returns
    ``(th, tw, gy, gx, hp, wp)``.  ``tile_h=0`` selects the
    :func:`auto_tile_h` exact-fit policy; the VMEM pre-estimate clamps
    over-budget heights (see :func:`est_vmem_bytes`).  A canvas chain
    must use ONE geometry for every kernel in the chain — callers
    compute it once from the model input shape."""
    if tile_h == 0:  # auto: exact-fit policy (see auto_tile_h)
        tile_h = auto_tile_h(round_up(hgt, 8))
    th = min(tile_h, round_up(hgt, 8))
    # prefer a single tile column when the whole width fits the VMEM
    # budget: grid padding (e.g. 480 -> 2x256 = 512) is pure halo waste
    w8 = round_up(wid, 8)
    tw = w8 if w8 <= max(tile_w, 512) else min(tile_w, w8)
    fit = th
    limit = vmem_limit_bytes()
    while fit > 8 and est_vmem_bytes(fit, tw) > limit:
        fit -= 8
    if fit != th:
        warnings.warn(
            f"RDB kernel tile {th}x{tw} estimated at "
            f"{est_vmem_bytes(th, tw) / 2**20:.0f} MiB VMEM (budget "
            f"{limit / 2**20:.0f}) — clamping tile_h to {fit} "
            "instead of a multi-minute compile into RESOURCE_EXHAUSTED",
            stacklevel=2,
        )
        th = fit
    gy = -(-hgt // th)
    gx = -(-wid // tw)
    return th, tw, gy, gx, gy * th + 2 * HALO, gx * tw + 16


def rdb_canvas_embed(x: jnp.ndarray, geom) -> jnp.ndarray:
    """Embed an (H, W, 64) image at offset (HALO, 8) of a zero
    (hp, wp, 128) bf16 canvas (the kernel's HBM input layout).  Plain
    XLA; batched inputs welcome."""
    *lead, hgt, wid, c = x.shape
    th, tw, gy, gx, hp, wp = geom
    buf = jnp.zeros((*lead, hp, wp, LANES), jnp.bfloat16)
    x128 = jnp.pad(
        x.astype(jnp.bfloat16),
        [(0, 0)] * len(lead) + [(0, 0), (0, 0), (0, LANES - c)],
    )
    at = tuple([0] * len(lead)) + (HALO, 8, 0)
    return jax.lax.dynamic_update_slice(buf, x128, at)


def rdb_canvas_extract(buf: jnp.ndarray, hgt: int, wid: int) -> jnp.ndarray:
    """Slice the (H, W, 64) image back out of a canvas.  Plain XLA (a
    dead extract is DCE'd when the consumer stayed on the canvas)."""
    return buf[..., HALO : HALO + hgt, 8 : 8 + wid, :NF]


def rdb_apply_canvas(
    buf: jnp.ndarray,
    ws: Sequence,
    bs: Sequence,
    geom,
    hgt: int,
    wid: int,
    slope: float = 0.2,
    act5: bool = False,
    res_scale: float = 0.2,
    skip_w=None,
    skip_b=None,
    add_c2_to_c4: bool = False,
    interpret: Optional[bool] = None,
    res_canvas: Optional[jnp.ndarray] = None,
    comb_self: float = 1.0,
    comb_res: float = 0.0,
    im2col: Optional[str] = None,
    frame_mask=True,
) -> jnp.ndarray:
    """One fused RDB, canvas to canvas: reads an (hp, wp, 128) bf16
    canvas (see :func:`rdb_canvas_embed`), returns a NEW canvas whose
    tile centers hold the RDB output — the ring and grid padding are
    left unwritten (garbage), which is safe because every canvas
    consumer (this kernel's edge-strip zeroing, the center-only
    extract, center-preserving eltwise combines) ignores them.  Chaining
    RDBs canvas-to-canvas deletes the per-call zeros+embed+slice XLA
    glue the plain :func:`rdb_apply` pays (~19 ms of the 204 ms 480px
    Valar tile, round-4 profile).  ``geom`` must come from
    :func:`canvas_geometry` for the same (hgt, wid).

    ``res_canvas``: optional second canvas fused into the epilogue as
    ``comb_self * rdb_out + comb_res * res_canvas`` on the tile center —
    the ESRGAN RRDB combine Eltwise (reference 4x_Valar_v1.param
    ``Eltwise 0=1 -23301=2,0.2,1.0``) without its own canvas pass."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mode = resolve_im2col(im2col)
    wmats, biases = pack_rdb_weights(ws, bs, mode)
    has_skip = skip_w is not None
    if has_skip:
        wsk = jnp.asarray(skip_w, jnp.float32).reshape(NF, GC)
        wsk = wsk.astype(jnp.bfloat16)
        bsk = (jnp.asarray(skip_b, jnp.float32).reshape(1, GC)
               if skip_b is not None else jnp.zeros((1, GC), jnp.float32))
    else:
        wsk = jnp.zeros((NF, GC), jnp.bfloat16)
        bsk = jnp.zeros((1, GC), jnp.float32)
    if res_canvas is None:
        comb_self, comb_res = 1.0, 0.0
    mask_mode = resolve_mask_mode(frame_mask, geom[0], geom[1], hgt, wid)
    return _rdb_run_canvas(
        buf, res_canvas, tuple(wmats), tuple(biases), wsk, bsk,
        tuple(geom), hgt, wid, slope, act5, res_scale, has_skip,
        add_c2_to_c4, float(comb_self), float(comb_res),
        mask_mode, mode == "pack12", interpret)


@functools.partial(
    jax.jit,
    static_argnames=("geom", "hgt", "wid", "slope", "act5", "res_scale",
                     "has_skip", "add_c2_to_c4", "comb_self", "comb_res",
                     "mask_mode", "pack12", "interpret"),
)
def _rdb_run_canvas(buf, res_canvas, wmats, biases, wsk, bsk, geom, hgt,
                    wid, slope, act5, res_scale, has_skip, add_c2_to_c4,
                    comb_self, comb_res, mask_mode, pack12, interpret):
    th, tw, gy, gx, hp, wp = geom
    has_res = comb_res != 0.0
    res_ops = (res_canvas,) if has_res else ()
    res_scratch = ([pltpu.VMEM((th, tw, LANES), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA(())] if has_res else [])
    return pl.pallas_call(
        functools.partial(
            _rdb_kernel, th=th, tw=tw, slope=slope, act5=act5,
            res_scale=res_scale, valid_h=hgt, valid_w=wid,
            has_skip=has_skip, add_c2_to_c4=add_c2_to_c4, canvas_out=True,
            comb_self=comb_self, comb_res=comb_res, mask_mode=mask_mode,
            pack12=pack12,
        ),
        grid=(gy, gx),
        in_specs=[
            *[pl.BlockSpec(wm.shape, lambda i, j, n=wm.ndim: (0,) * n,
                           memory_space=pltpu.VMEM) for wm in wmats],
            *[pl.BlockSpec(b.shape, lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM) for b in biases],
            pl.BlockSpec(wsk.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bsk.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            *[pl.BlockSpec(memory_space=pltpu.HBM) for _ in res_ops],
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((hp, wp, LANES), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * HALO, tw + 16, LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((th, tw, LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            *res_scratch,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
        interpret=interpret,
    )(*wmats, *biases, wsk, bsk, buf, *res_ops)


@functools.partial(
    jax.jit,
    static_argnames=("tile_h", "tile_w", "slope", "act5", "res_scale",
                     "has_skip", "add_c2_to_c4", "frame_mask", "pack12",
                     "interpret"),
)
def _rdb_run(x, wmats, biases, wsk, bsk, tile_h, tile_w, slope, act5,
             res_scale, has_skip, add_c2_to_c4, frame_mask, pack12,
             interpret):
    hgt, wid, _ = x.shape
    th, tw, gy, gx, hp, wp = canvas_geometry(hgt, wid, tile_h, tile_w)
    mask_mode = resolve_mask_mode(frame_mask, th, tw, hgt, wid)

    buf = jnp.zeros((hp, wp, LANES), jnp.bfloat16)
    x128 = jnp.pad(x.astype(jnp.bfloat16),
                   ((0, 0), (0, 0), (0, LANES - x.shape[-1])))
    buf = jax.lax.dynamic_update_slice(buf, x128, (HALO, 8, 0))

    out = pl.pallas_call(
        functools.partial(
            _rdb_kernel, th=th, tw=tw, slope=slope, act5=act5,
            res_scale=res_scale, valid_h=hgt, valid_w=wid,
            has_skip=has_skip, add_c2_to_c4=add_c2_to_c4,
            mask_mode=mask_mode, pack12=pack12,
        ),
        grid=(gy, gx),
        in_specs=[
            *[pl.BlockSpec(wm.shape, lambda i, j, n=wm.ndim: (0,) * n,
                           memory_space=pltpu.VMEM) for wm in wmats],
            *[pl.BlockSpec(b.shape, lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM) for b in biases],
            pl.BlockSpec(wsk.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bsk.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (th, tw, LANES), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((gy * th, gx * tw, LANES),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * HALO, tw + 16, LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
        interpret=interpret,
    )(*wmats, *biases, wsk, bsk, buf)
    return out[:hgt, :wid, :NF]

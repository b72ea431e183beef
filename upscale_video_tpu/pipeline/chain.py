"""Model-chain engine: the fused device program at the heart of the pipeline.

The reference runs each enabled stage as a separate pass over PNG files on
disk — denoise pool (upscale_processing.py:883-886), anime/deblur pool
(:888-909), SR pool (:923-948) — re-encoding and re-reading every frame
between stages.  Here the chain ``denoise -> deblur(1x) -> SR`` is composed
into **one jitted function** ``uint8 frames -> uint8 frames``: normalization,
every network, and the final clamp all fuse into a single XLA executable,
so a frame crosses host<->HBM exactly once in each direction.

The chain DSL is the reference's ``-m`` mini-language (parsed at
upscale_processing.py:774-789): ``a`` = anime deblur pre-pass, ``n=K`` =
NL-means denoise at strength K (clamped to 1..30), ``r`` = real-life model
(4x_Valar_v1, forces scale 4).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from upscale_video_tpu.models.zoo import Model, load_model, make_synthetic_model
from upscale_video_tpu.ops.nlmeans import nl_means_denoise
from upscale_video_tpu.ops.pixel import frames_to_model, model_to_frames
from upscale_video_tpu.ops.tiling import fit_tile_grid, tiled_apply

log = logging.getLogger(__name__)


@dataclass
class ChainSpec:
    """Parsed ``-m`` model chain."""

    anime: bool = False
    denoise: Optional[int] = None  # 1..30 or None
    real_life: bool = False
    sr_file: Optional[str] = None  # custom SR model stem suffix (sr=...)

    @classmethod
    def parse(cls, models: Optional[str]) -> "ChainSpec":
        """Parse ``"a,n=3,r"`` with the reference's clamping semantics
        (upscale_processing.py:774-789: n>30 -> 30, n<=0 -> off).

        Beyond the reference DSL: ``sr=<stem_suffix>`` selects a custom SR
        model file (``{scale}{stem_suffix}.param/.bin`` in the model dir,
        the reference's ``str(scale) + model_file`` naming at :70) — e.g.
        a checkpoint converted with ``vsr-import``.  Mutually exclusive
        with ``r``, which is shorthand for the stock Valar file."""
        spec = cls()
        if not models:
            return spec
        for item in models.split(","):
            item = item.strip()
            if item == "a":
                spec.anime = True
            elif item == "r":
                spec.real_life = True
            elif item.startswith("n="):
                level = int(item[2:])
                spec.denoise = min(level, 30) if level > 0 else None
            elif item.startswith("sr="):
                spec.sr_file = item[3:]
                if not spec.sr_file:
                    raise ValueError("sr= needs a model file stem suffix")
            elif item:
                raise ValueError(f"unknown model chain item {item!r}")
        if spec.real_life and spec.sr_file:
            raise ValueError("'r' and 'sr=' both select the SR model — "
                             "pass one")
        return spec

    def effective_scale(self, scale: int) -> int:
        """'r' forces scale 4 (reference upscale_processing.py:779-780)."""
        return 4 if self.real_life else scale

    def stage_names(self) -> List[str]:
        out = []
        if self.denoise:
            out.append(f"denoise(h={self.denoise})")
        if self.anime:
            out.append("anime-deblur")
        if self.sr_file:
            out.append(f"sr({self.sr_file})")
        else:
            out.append("valar-4x" if self.real_life else "compact-sr")
        return out


# Measured default tile for the '-m r' family (tools/valar_tile_ab.py
# same-session A/Bs; NOTES.md round-4).  A bare int is a geometry-fit
# budget (ops/tiling.fit_tile_grid); a pair forces that exact interior
# tile.  One constant so a new hardware winner ships as a one-line change.
# 544 at 1080p fits (544, 480): canvas height 576 = 12x48 — the RDB
# kernel's best exact tile_h — and a 2x4 grid with only 8 padded rows;
# measured 1958 ms/frame vs the 480 budget's 2187 (1.12x, round-4 s5
# interleaved A/B).  2160p gets the same 544x480 tile; other heights
# geometry-fit within the budget as usual.
VALAR_DEFAULT_TILE: "int | tuple" = 544


def precision_dtypes(precision: str, spec: "ChainSpec | None" = None):
    """Map a ``--precision`` name to ``(compute_dtype, residual_dtype)``.

    ``auto``  — per-family policy (the product default, like ``--tile_size
                auto``): ``mixed`` for the deep `-m r` RRDBNet, ``bf16``
                for everything else.  Measured basis: mixed costs 1.8% of
                Valar's fps on hardware (0.502 vs 0.511, round-5 phase-4
                same-queue pair) for +3.3..+4.6 dB, while the Compact
                family is already >=49.6 dB in plain bf16 — nothing to
                recover.  Requires ``spec``; without one, resolves bf16.
    ``bf16``  — convs and residuals in bf16 (fast MXU path).
    ``mixed`` — convs in bf16, the residual/Eltwise spine in f32: the
                quality class that separates Valar bf16 (PARITY 36.1 dB)
                from the Compact chains (>=49.6 dB) accrues on the spine
                (69 RDB + 23 RRDB combines each re-round the running sum
                to bf16), and keeping it wide is elementwise-only cost.
    ``f32``   — everything f32 (bit-exact vs the oracle; measured 5.3x
                on Valar, README precision section).
    """
    import jax.numpy as jnp

    if precision == "auto":
        precision = (
            "mixed" if spec is not None and spec.real_life else "bf16"
        )
    if precision == "f32":
        return jnp.float32, None
    return jnp.bfloat16, (jnp.float32 if precision == "mixed" else None)


def default_frames_per_step(spec: ChainSpec) -> int:
    """Product frames-per-step (on-chip batch) when the flag was not
    given: 4 for the Compact family (measured-best depth, round-4 batch
    A/B) but **1 for `-m r`** — on the tiled fused-RDB path the compiled
    executable's size scales with the vmapped frame batch: depth 4 at
    1080p serialized to a 2.2 GB executable, over the backend's 2 GB
    TpuExecutableProto limit (round-5 finding + lax.map control that
    refuted per-frame trace duplication as the cause — NOTES; depth 1,
    the measured bench configuration, compiles clean).  Valar is
    compute-bound, so depth adds no throughput anyway (the round-5 tile
    sweep measured 0.15 fps at both depths 1 and 2); an explicit
    ``--frames_per_step`` still overrides."""
    return 1 if spec.real_life else 4


def default_tile(spec: ChainSpec) -> "int | tuple":
    """Product tile policy when no ``--tile_size`` was given.

    The reference hardcodes 960px tiles for every model
    (upscale_processing.py:489); here the Compact family runs whole-frame
    (fits HBM comfortably at 1080p and tiling only adds halo waste) while
    the real-life RRDBNet tiles at the measured-best geometry — whole-frame
    Valar at 1080p overflows the 16 GB HBM (measured 15.9 G, NOTES.md).
    ``sr=`` imports keep whole-frame: their size is user-determined, and
    ``--tile_size`` is the escape hatch either way (0 forces whole-frame).
    """
    return VALAR_DEFAULT_TILE if spec.real_life else 0


@dataclass
class ChainEngine:
    """Executes a model chain on batches of uint8 RGB frames.

    ``step`` is the single fused program; :meth:`process` adds host-side
    batching/tiling policy around it.
    """

    spec: ChainSpec
    scale: int
    sr_model: Optional[Model]
    anime_model: Optional[Model] = None
    tile: "int | tuple" = 0  # 0 = whole-frame; (th, tw) = exact pair
    halo: int = 16
    tta: bool = False  # x8 dihedral self-ensemble on the SR stage (ops/tta)
    channel_order: str = "bgr"
    kernel_impl: str = "auto"  # the build()-time conv_impl knob, kept for
    # ops with both XLA and Pallas backends beyond convs (denoise)
    _step: Callable = field(default=None, repr=False)
    _planar_step: Callable = field(default=None, repr=False)
    _yuv_steps: dict = field(default=None, repr=False)

    @classmethod
    def build(
        cls,
        spec: ChainSpec,
        scale: int,
        model_path: Optional[str] = None,
        compute_dtype=jnp.bfloat16,
        tile: "int | tuple | None" = None,
        halo: int = 16,
        synthetic: bool = False,
        conv_impl: str = "auto",
        tta: bool = False,
        residual_dtype=None,
    ) -> "ChainEngine":
        """Load the models the chain needs (reference selection logic at
        upscale_processing.py:888-920).  ``synthetic=True`` builds
        random-weight Compact stand-ins (benchmarks, tests).

        ``residual_dtype``: None follows ``compute_dtype``; jnp.float32
        with bf16 compute is ``--precision mixed`` — the residual/Eltwise
        spine accumulates in f32 (see :func:`precision_dtypes`).

        ``conv_impl``: 'xla' | 'pallas' | 'auto' — the kernel backend for
        every op with both implementations (convs AND the NL-means
        denoise).  Auto picks per op from measured device times
        (NOTES.md): XLA convs win both model families — Compact's 64-ch
        fusions are near-optimal, and Valar rides the dense-scatter graph
        rewrite (executor._plan_dense_scatter, 1.76x) where mixing in
        Pallas solo kernels regresses 4x (custom-call layout boundaries);
        denoise measured a tie (NOTES.md) so auto stays on XLA there."""
        from upscale_video_tpu.utils.compcache import enable_compilation_cache

        enable_compilation_cache()  # multi-minute Valar compiles are shared
        # across the short-process workflows (opt-out via env; no-op when
        # the backend can't serialize executables)
        if tile is None:
            tile = default_tile(spec)
        scale = spec.effective_scale(scale)
        if conv_impl == "auto":
            pallas_conv = False  # measured: NOTES.md round-2 Valar A/B
        else:
            pallas_conv = conv_impl == "pallas"
        # 'rdb': fuse whole residual-dense blocks into one kernel each
        # (ops/rdb_pallas.py; only Valar-family graphs have matching
        # blocks — a no-op for the Compact family).  'auto' selects it for
        # the real-life model: measured 277.9 -> 204.0 ms per 480px tile
        # (1.36x, round-3 same-window A/B, hardware-bit-exact vs the
        # scatter path); 'xla' opts out.
        rdb_kernel = conv_impl == "rdb" or (
            conv_impl == "auto" and spec.real_life
        )
        anime_model = None
        sr_model = None
        if spec.anime:
            anime_model = (
                make_synthetic_model(scale=1, num_conv=8, num_feat=24, compute_dtype=compute_dtype)
                if synthetic
                else load_model("anime", 1, model_path, compute_dtype)
            )
            anime_model.pallas_conv = pallas_conv
            anime_model.rdb_kernel = rdb_kernel
            anime_model.residual_dtype = residual_dtype
        if scale > 1:
            if synthetic:
                if spec.real_life:
                    from upscale_video_tpu.models.zoo import (
                        make_synthetic_rrdb_model,
                    )

                    # architecture-faithful Valar stand-in (23 RRDBs)
                    sr_model = make_synthetic_rrdb_model(
                        scale=scale, num_rrdb=23, compute_dtype=compute_dtype
                    )
                else:
                    sr_model = make_synthetic_model(
                        scale=scale, compute_dtype=compute_dtype
                    )
            else:
                # sr=<stem> (e.g. a vsr-import conversion) overrides the
                # stock role; custom RRDB-family imports still ride the
                # generic dense-scatter rewrite, but the fused RDB kernel
                # stays keyed to 'r' (its planner matches graph structure,
                # and auto policy is measured per stock family)
                role = spec.sr_file or (
                    "valar" if spec.real_life else "compact"
                )
                sr_model = load_model(role, scale, model_path, compute_dtype)
            sr_model.pallas_conv = pallas_conv
            sr_model.rdb_kernel = rdb_kernel
            sr_model.residual_dtype = residual_dtype
            n_layers = len(sr_model.graph.layers)
            if n_layers > 500:
                # first-run UX for the big models (round-3 verdict #4): a
                # cold Valar+Mosaic compile sits silent for ~10 minutes —
                # tell the user it is expected and amortized (the default
                # persistent cache makes it once-per-machine; compcache
                # probe measured cold 3.64s -> warm 0.014s on a test
                # program).  vsr-warmup pre-pays it for a planned config.
                from upscale_video_tpu.utils.compcache import cache_dir_in_use

                d = cache_dir_in_use()
                log.info(
                    "%d-layer model: the FIRST compile may take ~10 minutes"
                    "%s — `vsr-warmup` can pre-compile a planned config",
                    n_layers,
                    (f" (cached in {d} thereafter)" if d
                     else " (persistent compile cache DISABLED — every"
                          " process pays it)"),
                )
        return cls(
            spec=spec, scale=scale, sr_model=sr_model, anime_model=anime_model,
            tile=tile, halo=halo, tta=tta, kernel_impl=conv_impl,
        )

    def _denoise(self, x: jnp.ndarray) -> jnp.ndarray:
        """NL-means over the frame batch, backend per ``conv_impl``.

        'pallas' runs ops/nlmeans_pallas.py (one haloed VMEM tile, all 81
        search offsets in-register, ~1.3x-frame HBM traffic) with a static
        per-frame unroll (HBM pallas operands cannot be vmapped); 'xla'
        runs the lax.scan formulation (81 fused passes, each re-reading
        the frame).  'auto' follows the measured winner (NOTES.md denoise
        A/B).  Both match the reference's cv2.fastNlMeansDenoisingColored
        geometry (upscale_processing.py:350-361)."""
        h = jnp.float32(self.spec.denoise)
        impl = self.kernel_impl
        if impl == "auto":
            impl = "xla"  # TPU A/B tie (10.5 vs 10.8 ms/frame @1080p) —
            # see NOTES.md round-2 denoise section
        if impl == "pallas":
            from upscale_video_tpu.ops.nlmeans_pallas import (
                nl_means_denoise_pallas,
            )

            interpret = jax.default_backend() != "tpu"
            return jnp.stack([
                nl_means_denoise_pallas(x[i], h, interpret=interpret)
                for i in range(x.shape[0])
            ])
        return jax.vmap(lambda im: nl_means_denoise(im, h))(x)

    def _prelude(self, x: jnp.ndarray) -> jnp.ndarray:
        """The pre-SR stages (denoise -> anime) shared by every step
        variant — the one place the stage chain's order lives."""
        if self.spec.denoise:
            x = self._denoise(x)
        if self.anime_model is not None:
            x = self.anime_model.forward(self.anime_model.params, x)
        return x

    def _tiled_sr(self, x: jnp.ndarray) -> jnp.ndarray:
        """Tiled SR over a frame batch.  Pallas pallas_call operands in HBM
        memory space cannot be vmapped on TPU (Mosaic requires whole arrays
        with trivial index maps), so when the model uses Pallas conv or RDB
        kernels the frame batch is a static Python unroll instead of
        jax.vmap (matching conv3x3_fused_batch's own policy), and tiles go
        through ``lax.map`` one at a time so the kernels trace once per
        program instead of once per tile."""
        fwd = self.sr_model.forward
        params = self.sr_model.params
        fn = lambda tiles: fwd(params, tiles)
        kernels = (getattr(self.sr_model, "pallas_conv", False)
                   or getattr(self.sr_model, "rdb_kernel", False))
        # geometry-fit rectangular tiles: the tile flag is a budget (max
        # extent per axis); the grid it implies is kept but each tile
        # shrinks to just cover the frame (a square 480 tile on 1080x1920
        # computes 1.31x the frame's pixels; the fitted 360x480 grid, the
        # same 12 tiles, computes 1.16x — measured A/B in NOTES.md).
        # An explicit (th, tw) pair bypasses the fit (A/B harnesses).
        tile_hw = (
            self.tile if isinstance(self.tile, tuple)
            else fit_tile_grid(int(x.shape[1]), int(x.shape[2]), self.tile)
        )
        per_frame = lambda im: tiled_apply(
            fn, im, tile_hw, self.halo, self.scale,
            tiles_per_step=1 if kernels else None,
        )
        if kernels:
            return jnp.stack([per_frame(x[i]) for i in range(x.shape[0])])
        return jax.vmap(per_frame)(x)

    @property
    def step(self) -> Callable:
        """The fused jitted program: uint8 (N,H,W,3) -> uint8 (N,sH,sW,3).

        When :meth:`use_chips` selected more than one chip, inputs/outputs
        are sharded batch-wise over a ``dp`` mesh (XLA partitions every op
        along N with no collectives — frames are independent)."""
        if self._step is None:
            self._step = self._finalize(self.raw_step)
        return self._step

    @property
    def raw_step(self) -> Callable:
        """The un-jitted uint8 (N,H,W,3) -> uint8 (N,sH,sW,3) program.

        Exposed so bench.py can chain the EXACT shipped device program
        (normalization + model chain + requantization) inside one compiled
        loop — the measurement protocol the broken ``block_until_ready`` on
        this platform forces (NOTES.md).

        The requantization epilogue rides the SR model's ``frames_forward``
        (fused into the Pallas tail kernel when the graph tail is
        chain-fused, into XLA otherwise); only the tiled and scale-1 paths
        still requantize as a separate XLA pass."""
        order = self.channel_order

        def _step(frames_u8):
            x = self._prelude(frames_to_model(frames_u8, order))
            if self.sr_model is not None:
                return self._sr_frames(x, order)
            return model_to_frames(x, order)

        return _step

    def _sr_frames(self, x: jnp.ndarray, order: str) -> jnp.ndarray:
        """The SR stage emitting uint8 frames, honoring tile/tta — the one
        place the SR-apply policy lives (raw_step + the PNG plane's sr
        stage_fn share it)."""
        if self.tta:
            from upscale_video_tpu.ops.tta import tta_apply

            apply = (self._tiled_sr if self.tile
                     else lambda v: self.sr_model.forward(
                         self.sr_model.params, v))
            return model_to_frames(tta_apply(apply, x), order)
        if self.tile:
            return model_to_frames(self._tiled_sr(x), order)
        return self.sr_model.frames_forward(order)(self.sr_model.params, x)

    @property
    def planar_scale(self) -> Optional[int]:
        """Shuffle factor of the *shuffle-planar* output contract, or None.

        When set (whole-frame XLA path, SRVGG-tail SR model), the stream
        plane runs :attr:`planar_step` — the device emits uint8
        ``(N, H, W, 3*s*s)`` planes and skips the pixel-shuffle interleave
        (~6.5 ms/frame of hostile relayout at 4K, measured); the sink
        thread interleaves with ``ops.pixel.planar_to_frames`` where it
        overlaps device compute.  None = use :attr:`step` (ordinary
        full-frame contract: tiled path, Valar's Interp tail, scale-1,
        or the Pallas kernel path, which fuses its own tail)."""
        if self.sr_model is None or self.tile or self.tta:
            return None  # tta: eight transformed passes, no single tail
        if getattr(self.sr_model, "pallas_conv", False):
            return None  # the Pallas path fuses its own tail kernel
        from upscale_video_tpu.models.executor import probe_srvgg_tail

        # cheap pattern probe first — building the full planar forward for
        # a no answer would run the whole graph-planning pass (2127 blobs
        # for Valar).  On a probe HIT, defer to the built forward's own
        # planar_scale: build_forward can still decline (e.g. the tail
        # conv claimed by the dense-scatter rewrite), and trusting the
        # probe alone would hand the pipeline a planar transform for a
        # full-frame program.
        if probe_srvgg_tail(self.sr_model.graph) is None:
            return None
        fn = self.sr_model.frames_forward(self.channel_order, planar=True)
        return getattr(fn, "planar_scale", None)

    @property
    def planar_step(self) -> Callable:
        """Jitted uint8 (N,H,W,3) -> uint8 (N,H,W,3*s*s) planar program
        (same mesh/sharding policy as :attr:`step`)."""
        if self._planar_step is None:
            self._planar_step = self._finalize(self.raw_planar_step)
        return self._planar_step

    @property
    def raw_planar_step(self) -> Callable:
        """Un-jitted planar-contract step (see :attr:`planar_scale`)."""
        order = self.channel_order

        def _step(frames_u8):
            x = self._prelude(frames_to_model(frames_u8, order))
            return self.sr_model.frames_forward(order, planar=True)(
                self.sr_model.params, x
            )

        return _step

    def yuv_step(self, full_range: bool, planar: bool,
                 i420_in: Optional[Tuple[int, int, bool]] = None) -> Callable:
        """Jitted step emitting the packed 4:2:0 contract (ops/yuv.py):
        uint8 RGB frames (N,H,W,3) — or, with ``i420_in=(src_h, src_w,
        in_full_range)``, the decoder's native flat I420 buffer
        (N, h*w*3//2) — to packed uint8 on the half-res output grid.

        Both conversions are prologue/epilogue math XLA fuses into the
        step for free; host<->device bytes halve in each converted
        direction and the host/encoder/decoder colour conversion
        disappears (--pipe_pix yuv420p).  ``planar`` selects the
        shuffle-planar body (planar_scale must be set); the packed shuffle
        factor is then planar_scale, else 2.  Cached per (full_range,
        planar, i420_in); :meth:`use_chips` invalidates like the RGB steps
        so mesh shardings apply."""
        from upscale_video_tpu.ops.yuv import (
            i420_to_model, yuv420_from_frames, yuv420_from_planar,
        )

        if self._yuv_steps is None:
            self._yuv_steps = {}
        key = (full_range, planar, i420_in)
        if key in self._yuv_steps:
            return self._yuv_steps[key]
        order = self.channel_order
        if planar:
            s = self.planar_scale
            if not s or s % 2:
                raise ValueError(
                    f"planar yuv contract unavailable (planar_scale={s})"
                )

        def to_model(x):
            if i420_in is None:
                return frames_to_model(x, order)
            src_h, src_w, in_full = i420_in
            return i420_to_model(x, src_h, src_w, in_full, order)

        def fn(x):
            m = self._prelude(to_model(x))
            if planar:
                p = self.sr_model.frames_forward(order, planar=True)(
                    self.sr_model.params, m
                )
                return yuv420_from_planar(p, s, full_range)
            if self.sr_model is not None:
                frames = self._sr_frames(m, order)
            else:
                frames = model_to_frames(m, order)
            return yuv420_from_frames(frames, full_range)

        self._yuv_steps[key] = self._finalize(fn)
        return self._yuv_steps[key]

    @property
    def input_rank_flexible(self) -> bool:
        """Whether finalized steps accept non-rank-4 inputs (the flat
        I420 input contract): sp's GSPMD spec shards the input's H axis
        and therefore requires rank-4 frames; dp/tp/single-chip are
        rank-agnostic.  The policy lives HERE, next to the sharding
        (process.py consults it instead of sniffing mesh internals)."""
        return getattr(self, "_mesh_mode", "dp") != "sp"

    def _finalize(self, fn: Callable) -> Callable:
        """jit ``fn`` with whatever mesh :meth:`use_chips` selected: ``dp``
        shards the frame batch, ``sp`` shards each frame's H axis (the fused
        program's convs get their halo exchanges from XLA/GSPMD)."""
        mesh = getattr(self, "_mesh", None)
        mode = getattr(self, "_mesh_mode", "dp")
        if mesh is not None and mode == "sp":
            from upscale_video_tpu.parallel.spatial import sp_sharded_fn

            return sp_sharded_fn(fn, mesh)
        if mesh is not None and mode == "tp":
            # channel-sharded weights, replicated activations: XLA places
            # the per-layer all-gathers on ICI (parallel/tensor.py)
            from jax.sharding import NamedSharding, PartitionSpec as P
            from upscale_video_tpu.parallel.tensor import (
                shard_params_channelwise, tensor_parallel_fn,
            )

            self._warn_narrow_tp(mesh)
            for m in (self.anime_model, self.sr_model):
                if m is not None:
                    m.params = shard_params_channelwise(m.params, mesh)
            jitted = tensor_parallel_fn(fn, mesh)
            repl = NamedSharding(mesh, P())

            def _tp_step(frames_u8):
                return jitted(jax.device_put(frames_u8, repl))

            return _tp_step
        if mesh is not None:
            from upscale_video_tpu.parallel.data import data_parallel_fn

            return data_parallel_fn(fn, mesh)
        return jax.jit(fn)

    def _warn_narrow_tp(self, mesh) -> None:
        """Roofline guardrail for ``--parallel tp`` (NOTES.md): sharding
        output channels across chips drops per-chip MXU lane fill below one
        pass for sub-128-channel convs, so tp almost certainly trails dp/sp
        for these models — say so instead of silently shipping the loss.
        Once per engine (several programs get finalized: step, planar_step,
        the PNG plane's stage_fns — one warning covers them all)."""
        if getattr(self, "_tp_warned", False):
            return
        self._tp_warned = True
        widths = [
            int(a.shape[-1])
            for m in (self.anime_model, self.sr_model) if m is not None
            for a in jax.tree_util.tree_leaves(m.params)
            if getattr(a, "ndim", 0) == 4
        ]
        n = len(mesh.devices.flat)
        if widths and max(widths) < 128 * n:
            log.warning(
                "--parallel tp: widest conv is %d channels over %d chips "
                "(%d/chip < the 128-lane MXU pass) — measured roofline says "
                "dp (throughput) or sp (latency) is almost certainly "
                "faster for this model (NOTES.md tp study)",
                max(widths), n, max(widths) // n,
            )

    def use_chips(self, chips: Optional[str], mode: str = "dp") -> int:
        """Apply a ``-g`` chip multiset: returns the batch multiplier.

        ``mode="dp"`` (default): multiple distinct chips -> frame-level
        data parallelism (the reference's primary axis, SURVEY.md §2.4);
        repetition of a chip id deepens the per-chip batch instead of
        adding workers (README:39-63 intent).

        ``mode="sp"``: each frame's H axis is sharded across the chips
        with ICI halo exchange (parallel/spatial.py) — lower latency per
        frame instead of higher throughput; useful for huge frames or
        real-time use.
        """
        from upscale_video_tpu.parallel.mesh import (
            make_mesh, parse_chips, select_devices,
        )

        chip_ids, multiplier = parse_chips(chips)
        if len(chip_ids) > 1:
            devices = select_devices(chip_ids)
            axis = mode if mode in ("sp", "tp") else "dp"
            self._mesh = make_mesh({axis: len(devices)}, devices=devices)
            self._mesh_mode = mode
            self._step = None  # rebuild with sharding
            self._planar_step = None
            self._yuv_steps = None
            self._demote_kernels_for_mesh(len(devices))
        return multiplier

    def _demote_kernels_for_mesh(self, n_chips: int) -> None:
        """GSPMD cannot partition a Mosaic custom call: under a multi-chip
        mesh a pallas_call's operands get all-gathered onto every chip, so
        the fused RDB kernel would serialize the dense blocks per chip and
        forfeit the sharding.  ``auto`` therefore falls back to the XLA
        dense-scatter rewrite (plain convs — GSPMD partitions it cleanly)
        on meshes; an explicit ``--conv_impl rdb``/``pallas`` is honored
        with a warning."""
        models = [m for m in (self.anime_model, self.sr_model)
                  if m is not None]
        uses_kernels = any(
            getattr(m, "rdb_kernel", False) or getattr(m, "pallas_conv", False)
            for m in models
        )
        if not uses_kernels:
            return
        if self.kernel_impl == "auto":
            log.info(
                "multi-chip mesh (%d chips): auto conv_impl falls back to "
                "the XLA graph paths (GSPMD cannot partition Pallas custom "
                "calls)", n_chips,
            )
            for m in models:
                m.rdb_kernel = False
                m.pallas_conv = False
                m.invalidate_forwards()  # rebuilt without kernel plans
        else:
            log.warning(
                "conv_impl=%s on a %d-chip mesh: Pallas custom calls are "
                "not partitionable by GSPMD — operands will be gathered "
                "per chip; expect no multi-chip speedup on kernel-claimed "
                "layers", self.kernel_impl, n_chips,
            )

    def configure_chips(
        self, chips: Optional[str], frames_per_step: int, mode: str = "dp",
    ) -> int:
        """Apply a ``-g`` multiset and return the adjusted frames-per-step
        (scaled by chip repetition; rounded up to a multiple of the dp mesh
        size so the batch shards evenly).  The one place every workflow —
        process_file, upscale_only, fix_frames, process_image, calibration —
        routes chip selection through (reference multi-GPU placement at
        upscale_only.py:213-233, fix_frames.py:259-271, test_images.py:
        126-144)."""
        if not chips:
            self._warn_deep_kernel_batch(frames_per_step, 1)
            return frames_per_step
        multiplier = self.use_chips(chips, mode=mode)
        frames_per_step = max(frames_per_step * multiplier, frames_per_step)
        mesh = getattr(self, "_mesh", None)
        n_chips = len(mesh.devices.flat) if mesh is not None else 1
        if n_chips > 1 and mode == "dp" and frames_per_step % n_chips:
            frames_per_step = ((frames_per_step // n_chips) + 1) * n_chips
        log.info("chips %s -> frames_per_step %d over %d chip(s)",
                 chips, frames_per_step, n_chips)
        self._warn_deep_kernel_batch(frames_per_step, n_chips)
        return frames_per_step

    def _warn_deep_kernel_batch(self, frames_per_step: int, n_chips: int):
        """Heads-up before a doomed compile: on the single-chip tiled
        fused-RDB path the compiled executable's size scales with the
        frame batch — depth 4 at 1080p serialized to 2.25 GB, over the
        backend's 2 GB TpuExecutableProto limit, after a 16-minute
        compile (NOTES round 5; depth 2 measured clean, depth 3 ~1.7 GB
        by linear scaling).  Multi-chip meshes demote the kernel to the
        batch-vectorized scatter path and are not exposed."""
        per_chip = frames_per_step // max(n_chips, 1)
        if (per_chip >= 4 and self.spec.real_life and self.tile
                and getattr(self.sr_model, "rdb_kernel", False)):
            log.warning(
                "frames_per_step %d per chip on the tiled '-m r' kernel "
                "path: executable size scales with depth and depth >= 4 "
                "has exceeded the backend's 2 GB program limit after a "
                "multi-minute compile (NOTES round 5) — if the compile "
                "fails, re-run with --frames_per_step %d or lower",
                per_chip, 2 * max(n_chips, 1),
            )

    def process(self, frames_u8: np.ndarray) -> np.ndarray:
        """Run one host batch through the fused program."""
        return np.asarray(self.step(jnp.asarray(frames_u8)))

    def stage_fn(self, stage: str) -> Callable:
        """A single-stage jitted uint8->uint8 program.

        Used by the PNG-compat data plane, which (like the reference's pools
        at upscale_processing.py:302-392, 545-601) materializes each stage's
        artifacts on disk for sampling (`test_images`) and repair
        (`fix_frames`).
        """
        order = self.channel_order

        if stage == "denoise":
            if not self.spec.denoise:
                raise ValueError("chain has no denoise stage")

            def _fn(frames_u8):
                x = frames_to_model(frames_u8, order)
                return model_to_frames(self._denoise(x), order)

        elif stage == "anime":
            if self.anime_model is None:
                raise ValueError("chain has no anime stage")
            model = self.anime_model

            def _fn(frames_u8):
                x = frames_to_model(frames_u8, order)
                y = model.forward(model.params, x)
                return model_to_frames(y, order)

        elif stage == "sr":
            if self.sr_model is None:
                raise ValueError("chain has no SR stage (scale 1)")

            def _fn(frames_u8):
                x = frames_to_model(frames_u8, order)
                return self._sr_frames(x, order)

        else:
            raise ValueError(f"unknown stage {stage!r}")
        return self._finalize(_fn)

    def describe(self) -> str:
        return " -> ".join(self.spec.stage_names()) + f" (scale {self.scale}x)"


class BatchedStepper:
    """Accumulates frames into fixed-size device batches with one-step
    pipelining: while the device runs batch *i*, the host decodes batch
    *i+1* (JAX dispatch is asynchronous; results are materialized one
    batch behind).  This is the TPU replacement for the reference's
    workers-per-GPU calibration (README:39-63, ``-g 0,0,1`` multisets) —
    concurrency comes from on-chip batching + async dispatch instead of
    process pools.
    """

    def __init__(self, step_fn: Callable, frames_per_step: int):
        self.step_fn = step_fn
        self.n = frames_per_step
        self._count = 0
        self._pending = None  # (device_array, valid_count)
        # two preallocated input buffers, filled incrementally as frames
        # arrive: np.stack at dispatch time cost a fresh 25 MB allocation
        # + bulk copy per batch (~40 ms/frame of page-fault churn at 1080p
        # on a small host, measured round 3) right on the critical
        # dispatch path; ping-pong because the device transfer of the
        # previous batch may still be in flight when the next fills
        self._bufs: List[Optional[np.ndarray]] = [None, None]
        self._slot = 0

    def _buf_for(self, frame: np.ndarray) -> np.ndarray:
        buf = self._bufs[self._slot]
        if buf is None or buf.shape[1:] != frame.shape:
            if self._count:
                # a silent reallocation here would ship the already-copied
                # frames as uninitialized memory — fail loudly instead
                # (frame geometry is constant within one video)
                raise ValueError(
                    f"frame shape changed mid-batch: buffer holds "
                    f"{self._count} frame(s) of {buf.shape[1:]}, got "
                    f"{frame.shape}"
                )
            buf = np.empty((self.n, *frame.shape), frame.dtype)
            self._bufs[self._slot] = buf
        return buf

    def _dispatch(self, chunk: np.ndarray, valid: int) -> List[np.ndarray]:
        out: List[np.ndarray] = []
        if self._pending is not None:
            arr, v = self._pending
            host = np.asarray(arr)
            out.extend(host[i] for i in range(v))
        self._pending = (self.step_fn(jnp.asarray(chunk)), valid)
        self._slot = 1 - self._slot
        return out

    def feed(self, frame: np.ndarray) -> List[np.ndarray]:
        """Add one frame; returns any completed output frames (in order)."""
        buf = self._buf_for(frame)
        np.copyto(buf[self._count], frame)
        self._count += 1
        if self._count < self.n:
            return []
        self._count = 0
        return self._dispatch(buf, self.n)

    def flush(self) -> List[np.ndarray]:
        """Process the trailing partial batch (padded to the static shape so
        the compiled program is reused) and drain the pipeline."""
        out: List[np.ndarray] = []
        if self._count:
            valid = self._count
            buf = self._bufs[self._slot]
            for i in range(valid, self.n):  # pad with the last frame
                np.copyto(buf[i], buf[valid - 1])
            self._count = 0
            out.extend(self._dispatch(buf, valid))
        if self._pending is not None:
            arr, v = self._pending
            host = np.asarray(arr)
            out.extend(host[i] for i in range(v))
            self._pending = None
        return out

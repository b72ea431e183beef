"""Model zoo: resolution, loading, and programmatic architectures.

Mirrors the reference's model-selection scheme so existing model
directories keep working: the on-disk stem is ``str(scale) + model_file``
(reference: upscale/upscale_processing.py:70-71) and the role -> file map is

- SR default      : ``x_Compact_Pretrain``        (upscale_processing.py:918)
- real-life ('r') : ``x_Valar_v1``                (upscale_processing.py:914)
- anime    ('a')  : ``x_HurrDeblur_SubCompact_nf24-nc8_244k_net_g``
                    run at scale 1                (upscale_processing.py:891-906)

Because the reference's pretrained ``.bin``/``.param`` files are third-party
artifacts, they are NOT vendored here; point ``UPSCALE_TPU_MODEL_PATH`` (or
``--model_path``) at a directory containing them.  For benchmarking and
tests, :func:`make_srvgg_graph` builds the same SRVGGNetCompact architecture
programmatically (FLOP-identical) with synthesized weights.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from upscale_video_tpu.models.param_parser import NcnnGraph, NcnnLayer, parse_param_file
from upscale_video_tpu.models.bin_loader import load_weights_file, synthesize_weights
from upscale_video_tpu.models.executor import build_forward

# role -> ncnn file stem suffix (prefixed by the integer scale)
MODEL_FILES = {
    "compact": "x_Compact_Pretrain",
    "valar": "x_Valar_v1",
    "anime": "x_HurrDeblur_SubCompact_nf24-nc8_244k_net_g",
}

_ENV_MODEL_PATH = "UPSCALE_TPU_MODEL_PATH"


def resolve_model_path(model_path: Optional[str] = None) -> Optional[str]:
    """Locate the model directory: explicit arg > env var > ./models."""
    candidates = [
        model_path,
        os.environ.get(_ENV_MODEL_PATH),
        os.path.join(os.getcwd(), "models"),
    ]
    for c in candidates:
        if c and os.path.isdir(c):
            return c
    return None


@dataclass
class Model:
    """A loaded, executable model."""

    name: str
    scale: int
    graph: NcnnGraph
    params: Dict[str, Dict[str, Any]]
    compute_dtype: Any = jnp.bfloat16
    # --precision mixed: residual/Eltwise adds (the spine) run in this
    # dtype while convs stay in compute_dtype; None = follow compute_dtype
    residual_dtype: Any = None
    pallas_conv: bool = False  # fused Pallas conv3x3 kernels (ops/conv_pallas)
    rdb_kernel: bool = False  # fused residual-dense-block kernel (ops/rdb_pallas)
    _forward: Callable = field(default=None, repr=False)
    # cache of emit-frames forwards keyed by (channel_order, planar)
    _frames_forward: Optional[Dict[Any, Callable]] = field(
        default=None, repr=False
    )
    _jitted: Callable = field(default=None, repr=False)

    @property
    def forward(self) -> Callable:
        if self._forward is None:
            self._forward = build_forward(
                self.graph,
                compute_dtype=self.compute_dtype,
                pallas_conv=self.pallas_conv,
                rdb_kernel=self.rdb_kernel,
                residual_dtype=self.residual_dtype,
            )
        return self._forward

    def frames_forward(
        self, channel_order: str = "bgr", planar: bool = False
    ) -> Callable:
        """``forward`` variant emitting display-ready uint8 RGB frames:
        the requantization epilogue fuses into the Pallas tail kernel when
        the graph tail is chain-fused, into XLA otherwise (so the pipeline
        never pays a separate x255/round/flip pass over the 4K output).

        ``planar=True`` requests the shuffle-planar contract (the device
        skips the pixel-shuffle interleave; see executor._planar_tail_u8):
        the returned fn's ``planar_scale`` attr is the shuffle factor, or
        None when the graph tail didn't match (output is ordinary frames).
        """
        if self._frames_forward is None:
            self._frames_forward = {}
        key = (channel_order, planar)
        if key not in self._frames_forward:
            self._frames_forward[key] = build_forward(
                self.graph,
                compute_dtype=self.compute_dtype,
                pallas_conv=self.pallas_conv,
                rdb_kernel=self.rdb_kernel,
                residual_dtype=self.residual_dtype,
                emit_frames=True,
                channel_order=channel_order,
                planar_tail=planar,
            )
        return self._frames_forward[key]

    def invalidate_forwards(self) -> None:
        """Drop every cached built forward so the next access rebuilds from
        the current ``pallas_conv``/``rdb_kernel`` flags.  Lives next to the
        cache fields so anyone adding a new derived-forward cache sees the
        invalidation contract (chain.py's mesh demotion depends on it)."""
        self._forward = None
        self._frames_forward = None
        self._jitted = None

    @property
    def jitted(self) -> Callable:
        """``jit(forward)`` with params closed over as constants donated to
        the device once; retraces per input shape (shapes are bucketed by
        the pipeline to bound the compile set)."""
        if self._jitted is None:
            fwd = self.forward
            self._jitted = jax.jit(fwd)
        return self._jitted

    def __call__(self, x):
        return self.jitted(self.params, x)

    def device_params(self, device=None):
        """Transfer params to a device once (returns a new pytree)."""
        put = (lambda a: jax.device_put(a, device)) if device else jax.device_put
        return jax.tree_util.tree_map(put, self.params)

    def save(self, model_dir: str, stem: Optional[str] = None) -> str:
        """Write this model (e.g. after fine-tuning) back to ncnn
        ``.param``/``.bin`` files loadable by both this framework and the
        reference's ncnn engine (fp16 weight tag, the zoo's own storage
        format).  Returns the file stem path."""
        from upscale_video_tpu.models.bin_loader import emit_bin
        from upscale_video_tpu.models.param_parser import emit_param

        os.makedirs(model_dir, exist_ok=True)
        stem = stem or self.name
        path = os.path.join(model_dir, stem)
        host_params = jax.tree_util.tree_map(
            lambda a: np.asarray(a, dtype=np.float32), self.params
        )
        with open(path + ".param", "w", encoding="utf-8") as f:
            f.write(emit_param(self.graph))
        with open(path + ".bin", "wb") as f:
            f.write(emit_bin(self.graph, host_params))
        return path


def load_model(
    model_file: str,
    scale: int,
    model_path: Optional[str] = None,
    compute_dtype: Any = jnp.bfloat16,
) -> Model:
    """Load ``{scale}{model_file}.param/.bin`` from a model directory.

    ``model_file`` may be a role name from :data:`MODEL_FILES` ("compact",
    "valar", "anime") or a raw ncnn stem suffix like the reference uses.
    """
    stem_suffix = MODEL_FILES.get(model_file, model_file)
    base = resolve_model_path(model_path)
    if base is None:
        raise FileNotFoundError(
            f"no model directory found (set {_ENV_MODEL_PATH} or pass model_path)"
        )
    stem = os.path.join(base, f"{scale}{stem_suffix}")
    graph = parse_param_file(stem + ".param")
    params = load_weights_file(graph, stem + ".bin")
    params = jax.tree_util.tree_map(np.asarray, params)
    return Model(
        name=f"{scale}{stem_suffix}",
        scale=scale,
        graph=graph,
        params=params,
        compute_dtype=compute_dtype,
    )


def make_srvgg_graph(
    scale: int = 2,
    num_conv: int = 16,
    num_feat: int = 64,
    in_ch: int = 3,
    out_ch: int = 3,
) -> NcnnGraph:
    """Build an SRVGGNetCompact-architecture graph programmatically.

    Matches the structure of the shipped Compact models (.param: Input ->
    Split -> [Conv3x3 + PReLU] x (num_conv+1) -> Conv3x3(out_ch*scale^2) ->
    PixelShuffle(scale) -> nearest-Interp(scale) skip -> Add).  With
    ``num_conv=16, num_feat=64`` this is FLOP-identical to
    ``2x_Compact_Pretrain`` (40 layers / 41 blobs).
    """
    layers = [
        NcnnLayer("Input", "input", [], ["input"]),
        NcnnLayer("Split", "split_in", ["input"], ["in_skip", "in_body"]),
    ]
    prev = "in_body"
    ch = in_ch
    for i in range(num_conv + 1):
        cname, pname = f"conv_{i}", f"prelu_{i}"
        layers.append(
            NcnnLayer(
                "Convolution", cname, [prev], [f"c{i}"],
                {0: num_feat, 1: 3, 4: 1, 5: 1, 6: num_feat * ch * 9},
            )
        )
        layers.append(NcnnLayer("PReLU", pname, [f"c{i}"], [f"p{i}"], {0: num_feat}))
        prev, ch = f"p{i}", num_feat
    up_ch = out_ch * scale * scale
    layers.append(
        NcnnLayer(
            "Convolution", "conv_up", [prev], ["pre_shuffle"],
            {0: up_ch, 1: 3, 4: 1, 5: 1, 6: up_ch * ch * 9},
        )
    )
    layers.append(
        NcnnLayer("PixelShuffle", "shuffle", ["pre_shuffle"], ["shuffled"], {0: scale})
    )
    layers.append(
        NcnnLayer(
            "Interp", "skip_up", ["in_skip"], ["skip"],
            {0: 1, 1: float(scale), 2: float(scale)},
        )
    )
    layers.append(NcnnLayer("BinaryOp", "residual", ["shuffled", "skip"], ["output"]))
    blob_count = len({b for l in layers for b in l.outputs})
    return NcnnGraph(layers=layers, blob_count=blob_count)


def make_rrdb_graph(
    scale: int = 4,
    num_feat: int = 64,
    num_grow: int = 32,
    num_rrdb: int = 2,
    variant: str = "valar",
    unshuffle: int = 1,
) -> NcnnGraph:
    """Build an RRDBNet-architecture graph programmatically.

    ``variant="valar"`` mirrors the exact layer structure of
    ``4x_Valar_v1.param`` (ESRGAN real-life model, reference
    upscale_processing.py:914): RRDB trunk of ``num_rrdb`` blocks (3
    residual-dense blocks each; every RDB is 5 dense 3x3 convs over
    growing concats + a 1x1 skip conv and interior residual adds,
    residual scale 0.2), trunk conv + global skip, then nearest-2x + conv
    upsampling to ``scale``.  With ``num_rrdb=23`` this is layer-count
    and FLOP-identical to the real Valar graph (modulo ncnn Split
    bookkeeping layers, which this executor does not require).  Used for
    hermetic dense-scatter tests and the Valar-family benchmark.

    ``variant="esrgan"`` is the vanilla basicsr ``RRDBNet``: each RDB is
    the plain 5-conv dense block (conv1..conv4 lrelu-0.2 over growing
    concats, conv5 linear back to ``num_feat``, out = 0.2*conv5 + x) with
    no 1x1 skip and no interior adds — the structure of the upstream
    RealESRGAN_x4plus-family torch checkpoints (models/torch_import.py
    maps ``body.{i}.rdb{j}.conv{k}`` onto ``r{i}d{j-1}_c{k}`` here).

    ``unshuffle > 1`` prepends a Reorg (space-to-depth) of that stride —
    basicsr's x2/x1 RRDBNet variants pixel-unshuffle the input before
    ``conv_first`` so the trunk runs at reduced resolution; the model's
    net scale is then ``scale / unshuffle`` (``scale`` here stays the
    upsampler's 2x-Interp count as in the torch code).
    """
    if variant not in ("valar", "esrgan"):
        raise ValueError(f"unknown RRDB variant {variant!r}")
    layers = [NcnnLayer("Input", "input", [], ["input"])]
    uid = [0]

    def conv(name, src, cin, cout, k=3, act=None):
        # real graph: 3x3 convs carry bias (5=1), the 1x1 skips do not
        attrs = {0: cout, 1: k, 6: cout * cin * k * k}
        if k == 3:
            attrs[4] = 1
            attrs[5] = 1
        if act is not None:
            attrs[9] = 2
            attrs[10] = [act]
        out = f"b{uid[0]}"
        uid[0] += 1
        layers.append(NcnnLayer("Convolution", name, [src], [out], attrs))
        return out

    def cat(name, srcs):
        out = f"b{uid[0]}"
        uid[0] += 1
        layers.append(NcnnLayer("Concat", name, list(srcs), [out], {0: 0}))
        return out

    def add(name, a, b):
        out = f"b{uid[0]}"
        uid[0] += 1
        layers.append(NcnnLayer("BinaryOp", name, [a, b], [out], {0: 0}))
        return out

    def residual(name, body, skip):  # 0.2*body + skip
        out = f"b{uid[0]}"
        uid[0] += 1
        layers.append(NcnnLayer(
            "Eltwise", name, [body, skip], [out], {0: 1, 1: [0.2, 1.0]}
        ))
        return out

    def rdb_valar(tag, x0):
        x1 = conv(f"{tag}_c1", x0, num_feat, num_grow, act=0.2)
        c4 = conv(f"{tag}_c4", cat(f"{tag}_cat1", [x0, x1]),
                  num_feat + num_grow, num_grow, act=0.2)
        sk = conv(f"{tag}_c6", x0, num_feat, num_grow, k=1)
        x2 = add(f"{tag}_a7", c4, sk)
        x3 = conv(f"{tag}_c9", cat(f"{tag}_cat2", [x0, x1, x2]),
                  num_feat + 2 * num_grow, num_grow, act=0.2)
        c12 = conv(f"{tag}_c12", cat(f"{tag}_cat3", [x0, x1, x2, x3]),
                   num_feat + 3 * num_grow, num_grow, act=0.2)
        x4 = add(f"{tag}_a14", c12, x2)
        c16 = conv(f"{tag}_c16", cat(f"{tag}_cat4", [x0, x1, x2, x3, x4]),
                   num_feat + 4 * num_grow, num_feat)
        return residual(f"{tag}_res", c16, x0)

    def rdb_esrgan(tag, x0):
        feats = [x0]
        for k in range(1, 5):
            nxt = conv(
                f"{tag}_c{k}",
                feats[0] if k == 1 else cat(f"{tag}_cat{k - 1}", feats),
                num_feat + (k - 1) * num_grow, num_grow, act=0.2,
            )
            feats.append(nxt)
        x5 = conv(f"{tag}_c5", cat(f"{tag}_cat4", feats),
                  num_feat + 4 * num_grow, num_feat)
        return residual(f"{tag}_res", x5, x0)

    rdb = rdb_valar if variant == "valar" else rdb_esrgan

    first_in = "input"
    if unshuffle > 1:
        layers.append(NcnnLayer(
            "Reorg", "unshuffle", ["input"], ["unshuffled"], {0: unshuffle}
        ))
        first_in = "unshuffled"
    fea = conv("conv_first", first_in, 3 * unshuffle * unshuffle, num_feat)
    x = fea
    for i in range(num_rrdb):
        rin = x
        for j in range(3):
            x = rdb(f"r{i}d{j}", x)
        x = residual(f"r{i}_res", x, rin)
    trunk = conv("conv_trunk", x, num_feat, num_feat)
    x = add("trunk_add", fea, trunk)
    ups = 1
    while ups < scale:
        out = f"b{uid[0]}"
        uid[0] += 1
        layers.append(NcnnLayer(
            "Interp", f"up{ups}", [x], [out], {0: 1, 1: 2.0, 2: 2.0}
        ))
        x = conv(f"conv_up{ups}", out, num_feat, num_feat, act=0.2)
        ups *= 2
    x = conv("conv_hr", x, num_feat, num_feat, act=0.2)
    conv("conv_last", x, num_feat, 3)
    layers[-1].outputs[0] = "output"
    blob_count = len({b for l in layers for b in l.outputs})
    return NcnnGraph(layers=layers, blob_count=blob_count)


def make_synthetic_rrdb_model(
    scale: int = 4,
    num_feat: int = 64,
    num_grow: int = 32,
    num_rrdb: int = 2,
    seed: int = 0,
    compute_dtype: Any = jnp.bfloat16,
) -> Model:
    """An RRDBNet (Valar-family) model with random weights (bench/tests)."""
    graph = make_rrdb_graph(
        scale=scale, num_feat=num_feat, num_grow=num_grow, num_rrdb=num_rrdb
    )
    params = synthesize_weights(graph, seed=seed)
    return Model(
        name=f"synthetic_{scale}x_rrdb{num_rrdb}",
        scale=scale,
        graph=graph,
        params=params,
        compute_dtype=compute_dtype,
    )


def make_synthetic_model(
    scale: int = 2,
    num_conv: int = 16,
    num_feat: int = 64,
    seed: int = 0,
    compute_dtype: Any = jnp.bfloat16,
) -> Model:
    """A Compact-architecture model with random weights (bench/test use)."""
    graph = make_srvgg_graph(scale=scale, num_conv=num_conv, num_feat=num_feat)
    params = synthesize_weights(graph, seed=seed)
    return Model(
        name=f"synthetic_{scale}x_compact",
        scale=scale,
        graph=graph,
        params=params,
        compute_dtype=compute_dtype,
    )

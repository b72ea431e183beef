"""torch .pth checkpoint import: mapping correctness vs an independent
torch forward, BGR domain fold, wrapper/key handling, and ncnn export
round-trip (the vsr-import converter path)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from upscale_video_tpu.models.torch_import import (  # noqa: E402
    detect_arch,
    import_torch_checkpoint,
)

RNG = np.random.default_rng(7)


def _t(*shape):
    return torch.from_numpy(RNG.normal(0, 0.1, shape).astype(np.float32))


# --------------------------------------------------------------------------
# reference state_dicts + torch-functional forwards (independent of the
# import mapping: built straight from the basicsr architectures)
# --------------------------------------------------------------------------

def make_srvgg_sd(num_conv=2, num_feat=8, scale=2):
    sd = {}
    idx, cin = 0, 3
    for _ in range(num_conv + 1):
        sd[f"body.{idx}.weight"] = _t(num_feat, cin, 3, 3)
        sd[f"body.{idx}.bias"] = _t(num_feat)
        sd[f"body.{idx + 1}.weight"] = _t(num_feat)  # PReLU slopes
        idx, cin = idx + 2, num_feat
    sd[f"body.{idx}.weight"] = _t(3 * scale * scale, num_feat, 3, 3)
    sd[f"body.{idx}.bias"] = _t(3 * scale * scale)
    return sd


def srvgg_forward(sd, x, scale):
    feat, i = x, 0
    while f"body.{i}.weight" in sd:
        w = sd[f"body.{i}.weight"]
        if w.ndim == 4:
            feat = F.conv2d(feat, w, sd[f"body.{i}.bias"], padding=1)
        else:
            feat = F.prelu(feat, w)
        i += 1
    return F.pixel_shuffle(feat, scale) + F.interpolate(
        x, scale_factor=scale, mode="nearest"
    )


def make_rrdb_sd(num_rrdb=1, num_feat=8, num_grow=4, ups=2):
    sd = {"conv_first.weight": _t(num_feat, 3, 3, 3),
          "conv_first.bias": _t(num_feat)}
    for i in range(num_rrdb):
        for j in (1, 2, 3):
            for k in range(1, 6):
                cin = num_feat + (k - 1) * num_grow
                cout = num_feat if k == 5 else num_grow
                sd[f"body.{i}.rdb{j}.conv{k}.weight"] = _t(cout, cin, 3, 3)
                sd[f"body.{i}.rdb{j}.conv{k}.bias"] = _t(cout)
    for name in ["conv_body"] + [f"conv_up{n + 1}" for n in range(ups)] + [
            "conv_hr"]:
        sd[f"{name}.weight"] = _t(num_feat, num_feat, 3, 3)
        sd[f"{name}.bias"] = _t(num_feat)
    sd["conv_last.weight"] = _t(3, num_feat, 3, 3)
    sd["conv_last.bias"] = _t(3)
    return sd


def rrdb_forward(sd, x):
    lrelu = lambda t: F.leaky_relu(t, 0.2)  # noqa: E731
    conv = lambda n, t: F.conv2d(t, sd[f"{n}.weight"], sd[f"{n}.bias"],  # noqa: E731
                                 padding=1)

    def rdb(prefix, x0):
        feats = [x0]
        for k in range(1, 5):
            feats.append(lrelu(conv(f"{prefix}.conv{k}", torch.cat(feats, 1))))
        return conv(f"{prefix}.conv5", torch.cat(feats, 1)) * 0.2 + x0

    in_ch = sd["conv_first.weight"].shape[1]
    if in_ch > 3:  # basicsr x2/x1 variants unshuffle the input first
        x = F.pixel_unshuffle(x, int((in_ch // 3) ** 0.5))
    feat = conv("conv_first", x)
    trunk = feat
    i = 0
    while f"body.{i}.rdb1.conv1.weight" in sd:
        rin = trunk
        for j in (1, 2, 3):
            trunk = rdb(f"body.{i}.rdb{j}", trunk)
        trunk = trunk * 0.2 + rin
        i += 1
    feat = feat + conv("conv_body", trunk)
    n = 1
    while f"conv_up{n}.weight" in sd:
        feat = lrelu(conv(f"conv_up{n}",
                          F.interpolate(feat, scale_factor=2, mode="nearest")))
        n += 1
    return conv("conv_last", lrelu(conv("conv_hr", feat)))


def _ours_vs_torch(model, sd, torch_forward, h=10, w=12):
    """Run both forwards on the same image; ours takes BGR NHWC, torch RGB
    NCHW — outputs must match under the same flip (the folded domain)."""
    import jax.numpy as jnp

    x_rgb = RNG.uniform(0, 1, (1, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        y_torch = torch_forward(torch.from_numpy(x_rgb)).numpy()
    x_bgr_nhwc = x_rgb[:, ::-1].transpose(0, 2, 3, 1)
    y_ours = np.asarray(model.forward(model.params, jnp.asarray(x_bgr_nhwc)))
    y_torch_bgr_nhwc = y_torch[:, ::-1].transpose(0, 2, 3, 1)
    return float(np.abs(y_ours - y_torch_bgr_nhwc).max())


def test_srvgg_import_matches_torch():
    import jax.numpy as jnp

    sd = make_srvgg_sd(num_conv=2, num_feat=8, scale=2)
    model = import_torch_checkpoint({"params": sd}, compute_dtype=jnp.float32)
    assert model.scale == 2 and model.name == "2x_torch_srvgg"
    diff = _ours_vs_torch(model, sd, lambda x: srvgg_forward(sd, x, 2))
    assert diff < 1e-4, f"srvgg import mismatch: {diff}"


def test_srvgg_import_4x_and_wrappers():
    import jax.numpy as jnp

    sd = make_srvgg_sd(num_conv=1, num_feat=8, scale=4)
    wrapped = {"params_ema": {f"module.{k}": torch.as_tensor(v)
                              for k, v in sd.items()}}
    model = import_torch_checkpoint(wrapped, compute_dtype=jnp.float32)
    assert model.scale == 4
    diff = _ours_vs_torch(model, sd, lambda x: srvgg_forward(sd, x, 4))
    assert diff < 1e-4


def test_rrdb_import_matches_torch():
    import jax.numpy as jnp

    sd = make_rrdb_sd(num_rrdb=2, num_feat=8, num_grow=4, ups=2)
    model = import_torch_checkpoint(sd, compute_dtype=jnp.float32)
    assert model.scale == 4 and model.name == "4x_torch_rrdb"
    diff = _ours_vs_torch(model, sd, lambda x: rrdb_forward(sd, x))
    assert diff < 1e-4, f"rrdb import mismatch: {diff}"


def test_rrdb_unshuffle_x2_import_matches_torch():
    """RealESRGAN_x2plus class: 12-channel conv_first = pixel-unshuffle(2)
    before the trunk, net scale 4/2 = 2."""
    import jax.numpy as jnp

    sd = make_rrdb_sd(num_rrdb=1, num_feat=8, num_grow=4, ups=2)
    sd["conv_first.weight"] = _t(8, 12, 3, 3)
    model = import_torch_checkpoint(sd, compute_dtype=jnp.float32)
    assert model.scale == 2 and model.name == "2x_torch_rrdb"
    diff = _ours_vs_torch(model, sd, lambda x: rrdb_forward(sd, x), h=8, w=12)
    assert diff < 1e-4, f"x2plus import mismatch: {diff}"

    # the Reorg layer round-trips through the ncnn param/bin emit + reload
    import tempfile

    from upscale_video_tpu.models.zoo import load_model

    with tempfile.TemporaryDirectory() as td:
        model.save(td, stem="2x_unshuf")
        re = load_model("x_unshuf", scale=2, model_path=td,
                        compute_dtype=jnp.float32)
        assert any(l.type == "Reorg" for l in re.graph.layers)
        x = jnp.asarray(RNG.uniform(0, 1, (1, 8, 12, 3)).astype(np.float32))
        a = np.asarray(model.forward(model.params, x))
        b = np.asarray(re.forward(re.params, x))
        assert float(np.abs(a - b).max()) < 2e-3  # fp16 storage


def test_detect_and_reject():
    assert detect_arch(make_srvgg_sd()) == "srvgg"
    assert detect_arch(make_rrdb_sd()) == "rrdb"
    with pytest.raises(ValueError, match="unrecognized"):
        detect_arch({"foo.weight": np.zeros((1,))})
    # 27 input channels is no known RRDBNet input contract
    sd = make_rrdb_sd()
    sd["conv_first.weight"] = _t(8, 27, 3, 3)
    with pytest.raises(ValueError, match="input channels"):
        import_torch_checkpoint(sd)


def test_import_export_ncnn_roundtrip(tmp_path):
    """vsr-import's converter contract: the exported .param/.bin reload
    into an equivalent model (fp16 storage tag bounds the error)."""
    import jax.numpy as jnp

    from upscale_video_tpu.models.zoo import load_model

    sd = make_srvgg_sd(num_conv=2, num_feat=8, scale=2)
    model = import_torch_checkpoint(sd, compute_dtype=jnp.float32)
    model.save(str(tmp_path), stem="2x_imported")
    re = load_model("x_imported", scale=2, model_path=str(tmp_path),
                    compute_dtype=jnp.float32)
    x = jnp.asarray(RNG.uniform(0, 1, (1, 6, 8, 3)).astype(np.float32))
    a = np.asarray(model.forward(model.params, x))
    b = np.asarray(re.forward(re.params, x))
    assert float(np.abs(a - b).max()) < 2e-3  # fp16 weight storage


def test_pth_file_roundtrip(tmp_path):
    """torch.save -> import from the file path (weights_only load)."""
    import jax.numpy as jnp

    sd = make_srvgg_sd(num_conv=1, num_feat=8, scale=2)
    path = str(tmp_path / "model.pth")
    torch.save({"params": {k: torch.as_tensor(v) for k, v in sd.items()}},
               path)
    model = import_torch_checkpoint(path, compute_dtype=jnp.float32)
    diff = _ours_vs_torch(model, sd, lambda x: srvgg_forward(sd, x, 2))
    assert diff < 1e-4


def test_vsr_import_cli_to_pipeline(tmp_path):
    """Full user path: torch .pth -> vsr-import -> upscale-video -m sr=...
    produces an upscaled video with the imported weights."""
    from upscale_video_tpu.cli.import_model import main as import_main
    from upscale_video_tpu.cli.upscale_video import main as upscale_main
    from upscale_video_tpu.video.io import open_sink, open_source

    sd = make_srvgg_sd(num_conv=2, num_feat=8, scale=2)
    pth = str(tmp_path / "tiny_srvgg.pth")
    torch.save(sd, pth)
    mdir = str(tmp_path / "models")
    assert import_main(["-i", pth, "-o", mdir]) == 0
    import os

    assert sorted(os.listdir(mdir)) == [
        "2x_tiny_srvgg.bin", "2x_tiny_srvgg.param"
    ]

    vid = str(tmp_path / "in.y4m")
    frames = RNG.integers(0, 255, (4, 16, 20, 3)).astype(np.uint8)
    with open_sink(vid, width=20, height=16, frame_rate="24/1") as sink:
        for f in frames:
            sink.write(f)
    out = str(tmp_path / "out.y4m")
    rc = upscale_main([
        "-i", vid, "-o", out, "-t", str(tmp_path / "t"),
        "-m", "sr=x_tiny_srvgg", "--model_path", mdir, "--precision", "f32",
    ])
    assert rc == 0
    with open_source(out) as src:
        got = [src.read() for _ in range(4)]
    assert got[0].shape == (32, 40, 3)

    # pin the numbers to the torch forward (through the y4m colour space)
    x = frames[0].astype(np.float32) / 255.0
    with torch.no_grad():
        y = srvgg_forward(
            sd, torch.from_numpy(x.transpose(2, 0, 1)[None]), 2
        )[0].numpy().transpose(1, 2, 0)
    want = np.clip(np.round(y * 255.0), 0, 255).astype(np.uint8)
    # y4m 444 RGB<->YCbCr round-trips within ~1/255 per conversion; input
    # frames crossed one round trip and the output another
    assert np.abs(want.astype(int) - got[0].astype(int)).max() <= 4


def test_sr_and_r_are_mutually_exclusive():
    from upscale_video_tpu.pipeline.chain import ChainSpec

    with pytest.raises(ValueError, match="one"):
        ChainSpec.parse("r,sr=x_foo")
    spec = ChainSpec.parse("a,sr=x_foo")
    assert spec.sr_file == "x_foo" and spec.anime
    assert "sr(x_foo)" in spec.stage_names()


def test_rrdb_unshuffle_odd_geometry_mod_pad():
    """Arbitrary source geometry through an unshuffle import: the executor
    mod-pads the input and crops the output (basicsr pre/post_process
    semantics), instead of dying in a reshape inside jit."""
    import jax.numpy as jnp

    sd = make_rrdb_sd(num_rrdb=1, num_feat=8, num_grow=4, ups=2)
    sd["conv_first.weight"] = _t(8, 12, 3, 3)
    model = import_torch_checkpoint(sd, compute_dtype=jnp.float32)
    x_rgb = RNG.uniform(0, 1, (1, 3, 7, 9)).astype(np.float32)  # odd H, W
    with torch.no_grad():
        xp = F.pad(torch.from_numpy(x_rgb), (0, 1, 0, 1), mode="replicate")
        y = rrdb_forward(sd, xp).numpy()[:, :, :14, :18]
    x_bgr = x_rgb[:, ::-1].transpose(0, 2, 3, 1)
    ours = np.asarray(model.forward(model.params, jnp.asarray(x_bgr)))
    assert ours.shape == (1, 14, 18, 3)
    diff = np.abs(ours - y[:, ::-1].transpose(0, 2, 3, 1)).max()
    assert diff < 1e-4, f"mod-pad mismatch: {diff}"


def test_old_arch_esrgan_import():
    """Pre-basicsr ESRGAN naming (model.0, model.1.sub.N.RDBj.convK.0,
    model.3/6/8/10) — the form most community 4x models still ship —
    translates onto the same graph and matches the torch forward."""
    import jax.numpy as jnp

    sd = make_rrdb_sd(num_rrdb=2, num_feat=8, num_grow=4, ups=2)
    trunk = 2  # = num_rrdb
    ren = {"conv_first": "model.0", "conv_body": f"model.1.sub.{trunk}",
           "conv_up1": "model.3", "conv_up2": "model.6",
           "conv_hr": "model.8", "conv_last": "model.10"}
    old = {}
    for k, v in sd.items():
        stem, wb = k.rsplit(".", 1)
        if stem in ren:
            old[f"{ren[stem]}.{wb}"] = v
        else:  # body.i.rdbj.convk -> model.1.sub.i.RDBj.convk.0
            import re as _re

            m = _re.match(r"body\.(\d+)\.rdb(\d)\.conv(\d)", stem)
            old[f"model.1.sub.{m.group(1)}.RDB{m.group(2)}"
                f".conv{m.group(3)}.0.{wb}"] = v
    assert detect_arch(old) == "rrdb_old"
    model = import_torch_checkpoint(old, compute_dtype=jnp.float32)
    assert model.scale == 4
    diff = _ours_vs_torch(model, sd, lambda x: rrdb_forward(sd, x))
    assert diff < 1e-4, f"old-arch import mismatch: {diff}"


def test_numpy_oracle_agrees_on_unshuffle_graph():
    """The independent numpy executor stays complete: it must agree with
    the JAX executor on a Reorg (pixel-unshuffle) graph."""
    import jax.numpy as jnp

    from upscale_video_tpu.models.numpy_ref import forward_numpy

    sd = make_rrdb_sd(num_rrdb=1, num_feat=8, num_grow=4, ups=2)
    sd["conv_first.weight"] = _t(8, 12, 3, 3)
    model = import_torch_checkpoint(sd, compute_dtype=jnp.float32)
    x = RNG.uniform(0, 1, (1, 8, 12, 3)).astype(np.float32)
    a = np.asarray(model.forward(model.params, jnp.asarray(x)))
    host = {k: {n: np.asarray(v) for n, v in e.items()}
            for k, e in model.params.items()}
    b = forward_numpy(model.graph, host, x)
    assert np.abs(a - b).max() < 1e-4


def test_fix_frames_with_custom_sr_model(tmp_path):
    """Repair (fix-frames) loads the same sr=<stem> custom model the main
    run used — the full interop loop for imported checkpoints."""
    from upscale_video_tpu.cli.import_model import main as import_main
    from upscale_video_tpu.pipeline.process import process_file
    from upscale_video_tpu.pipeline.workflows import fix_frames
    from upscale_video_tpu.video.io import Y4MSink, Y4MSource

    sd = make_srvgg_sd(num_conv=1, num_feat=8, scale=2)
    pth = str(tmp_path / "m.pth")
    torch.save(sd, pth)
    mdir = str(tmp_path / "models")
    assert import_main(["-i", pth, "-o", mdir, "--stem", "x_m"]) == 0

    vid = str(tmp_path / "in.y4m")
    frames = RNG.integers(0, 256, (4, 10, 14, 3)).astype(np.uint8)
    with Y4MSink(vid, 14, 10, "24/1") as s:
        for f in frames:
            s.write(f)
    out = str(tmp_path / "out.y4m")
    process_file(vid, out, temp_dir=str(tmp_path / "t"), scale=2,
                 models="sr=x_m", model_path=mdir, precision="f32",
                 data_plane="png", resume_processing=True)
    import os

    work = os.path.join(str(tmp_path / "t"), "upscale_video")
    # corrupt frame 2's final artifact, then repair with the SAME chain
    os.remove(os.path.join(work, "2.png")) if os.path.exists(
        os.path.join(work, "2.png")) else None
    fix_frames(vid, "2", scale=2, temp_dir=str(tmp_path / "t"),
               models="sr=x_m", model_path=mdir, precision="f32")
    assert os.path.exists(os.path.join(work, "2.png"))

"""``vsr-warmup`` (first-run compile UX, round-3 verdict item 4): the
pre-compiler must resolve the SAME stream contract the pipeline picks and
exit 0 after compiling it; big-model engine builds must announce the
cold-compile cost."""

import logging

import numpy as np

from upscale_video_tpu.cli.warmup import build_parser, main


def test_warmup_compiles_default_contract(capsys):
    rc = main(["--size", "32x24", "--synthetic_models", "--precision",
               "f32", "--frames_per_step", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    # the product default path: auto -> yuv420p, planar body, i420 input
    assert "pipe_pix auto -> yuv420p" in out
    assert "i420 input" in out
    assert "compiled step program" in out


def test_warmup_10bit_target_keeps_rgb24(capsys):
    rc = main(["--size", "32x24", "--synthetic_models", "--precision",
               "f32", "--frames_per_step", "2", "-p", "p010le"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "pipe_pix auto -> rgb24" in out
    assert "planar" in out  # rgb24 planar contract


def test_warmup_444_source_disables_i420_input(capsys):
    rc = main(["--size", "32x24", "--synthetic_models", "--precision",
               "f32", "--frames_per_step", "2",
               "--source_pix_fmt", "yuv444p10le"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "yuv420p" in out  # output contract still 4:2:0
    assert "i420 input" not in out  # decode side protected


def test_warmup_bad_size_errors():
    assert main(["--size", "banana"]) == 2


def test_warmup_matches_pipeline_contract(tmp_path, capsys):
    """The contract warmup announces is the one an actual run engages
    (same tiny engine config, hermetic y4m backend with a C420 source)."""
    from upscale_video_tpu.ops.yuv import packed_to_i420, yuv420_from_frames
    from upscale_video_tpu.pipeline.process import process_file
    from upscale_video_tpu.video.io import Y4MSink

    import jax.numpy as jnp

    rc = main(["--size", "28x20", "--synthetic_models", "--precision",
               "f32", "--frames_per_step", "2", "--range", "full"])
    warm_out = capsys.readouterr().out
    assert rc == 0 and "yuv420p, planar, i420 input" in warm_out

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 20, 28, 3), dtype=np.uint8)
    packed = np.asarray(yuv420_from_frames(jnp.asarray(frames), True))
    with Y4MSink(str(tmp_path / "in.y4m"), 28, 20, "24/1",
                 colorspace="C420jpeg") as s:
        for p in packed:
            s.write(packed_to_i420(p, 2))
    process_file(str(tmp_path / "in.y4m"), str(tmp_path / "out.y4m"),
                 temp_dir=str(tmp_path / "t"), scale=2,
                 synthetic_models=True, precision="f32",
                 frames_per_step=2)
    run_out = capsys.readouterr().out
    assert "yuv420 output contract active (full range, planar s=2, " \
           "i420 input)" in run_out


def test_big_model_build_announces_cold_compile(caplog):
    """A >500-layer engine build logs the first-compile heads-up with the
    cache destination (chain.py build)."""
    import jax.numpy as jnp

    from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec

    with caplog.at_level(logging.INFO,
                         logger="upscale_video_tpu.pipeline.chain"):
        ChainEngine.build(ChainSpec.parse("r"), 4, synthetic=True,
                          compute_dtype=jnp.float32)
    msgs = [r.message for r in caplog.records]
    assert any("FIRST compile may take" in m for m in msgs)


def test_parser_surfaces():
    p = build_parser()
    a = p.parse_args(["--size", "640x480", "-m", "n=3", "--pipe_pix",
                      "rgb24"])
    assert a.size == "640x480" and a.pipe_pix == "rgb24"

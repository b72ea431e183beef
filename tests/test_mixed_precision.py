"""``--precision mixed``: bf16 convs with the residual/Eltwise spine in f32.

The quality class that separates Valar's bf16 output (PARITY 36.1 dB)
from the Compact chains (>=49.6 dB) accrues on the residual SPINE — 69
RDB combines + 23 RRDB combines + trunk adds each re-round the running
sum to bf16's 8-bit mantissa (the reference runs everything f32 in ncnn,
upscale_processing.py:271-284, so it never pays this).  Mixed keeps that
spine f32 for elementwise-only cost; round-5 hermetic probe on the
23-RRDB synthetic: 33.75 -> 38.12 dB vs the f32 oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from upscale_video_tpu.models.bin_loader import synthesize_weights
from upscale_video_tpu.models.executor import build_forward
from upscale_video_tpu.models.zoo import make_rrdb_graph
from upscale_video_tpu.pipeline.chain import (
    ChainEngine, ChainSpec, precision_dtypes,
)


def _u8(y):
    return np.clip(
        np.round(np.asarray(y, np.float32) * 255.0), 0, 255
    ).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_precision_dtypes_mapping():
    assert precision_dtypes("bf16") == (jnp.bfloat16, None)
    assert precision_dtypes("mixed") == (jnp.bfloat16, jnp.float32)
    compute, residual = precision_dtypes("f32")
    assert compute == jnp.float32 and residual is None


def test_precision_auto_is_per_family():
    """'auto' (the product default) resolves mixed for the '-m r' family
    (measured 1.8% fps for +3.3..4.6 dB, NOTES round-5 phase 4) and bf16
    everywhere else (Compact is >=49.6 dB in plain bf16 already)."""
    assert precision_dtypes("auto", ChainSpec.parse("r")) == (
        jnp.bfloat16, jnp.float32)
    assert precision_dtypes("auto", ChainSpec.parse("a,n=3,r")) == (
        jnp.bfloat16, jnp.float32)
    assert precision_dtypes("auto", ChainSpec.parse(None)) == (
        jnp.bfloat16, None)
    assert precision_dtypes("auto", ChainSpec.parse("a,n=3")) == (
        jnp.bfloat16, None)
    # no spec (library callers): conservative bf16
    assert precision_dtypes("auto") == (jnp.bfloat16, None)


def test_mixed_recovers_spine_accumulation_error():
    """At the full Valar depth (23 RRDBs) the f32 spine must recover a
    measurable part of the bf16 gap vs the f32 oracle.  Depth matters:
    at 8 RRDBs the per-seed delta straddles zero (one probed seed
    measured -0.3 dB), while at 23 RRDBs all four probed weight seeds
    landed +3.3..+4.6 dB — the spine error compounds per combine, so the
    test pins the production depth."""
    g = make_rrdb_graph(num_rrdb=23)
    params = synthesize_weights(g, seed=1)
    x = jnp.asarray(
        np.random.default_rng(7).random((1, 32, 32, 3)), jnp.float32
    )
    oracle = _u8(jax.jit(build_forward(g, compute_dtype=jnp.float32))(params, x))
    plain = _u8(jax.jit(build_forward(g, compute_dtype=jnp.bfloat16))(params, x))
    mixed = _u8(jax.jit(build_forward(
        g, compute_dtype=jnp.bfloat16, residual_dtype=jnp.float32
    ))(params, x))
    p_plain, p_mixed = _psnr(oracle, plain), _psnr(oracle, mixed)
    assert p_mixed > p_plain + 1.5, (p_plain, p_mixed)
    # and the mixed output stays in the plain contract (shape/dtype)
    assert mixed.shape == plain.shape


def test_mixed_canvas_path_matches_scatter_path():
    """The fused-RDB canvas route (the shipped '-m r' path) under mixed
    precision must agree with the XLA scatter route under mixed
    precision: the f32 combine commutes with the canvas center-extract,
    so the two formulations differ only by kernel-vs-XLA conv rounding
    (the same tolerance class the plain-bf16 parity test pins)."""
    g = make_rrdb_graph(scale=4, num_rrdb=1)
    params = synthesize_weights(g, seed=0)
    x = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (1, 18, 22, 3)), jnp.float32
    )
    scatter = build_forward(
        g, compute_dtype=jnp.bfloat16, residual_dtype=jnp.float32
    )
    canvas = build_forward(
        g, compute_dtype=jnp.bfloat16, residual_dtype=jnp.float32,
        rdb_kernel=True,
    )
    a = np.asarray(scatter(params, x)).astype(np.float32)
    b = np.asarray(canvas(params, x)).astype(np.float32)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=0.06)


def test_mixed_is_noop_for_f32():
    """residual_dtype=f32 with compute f32 must change nothing (guard
    against double-cast surprises on the --precision f32 path)."""
    g = make_rrdb_graph(num_rrdb=1)
    params = synthesize_weights(g, seed=1)
    x = jnp.asarray(
        np.random.default_rng(2).random((1, 14, 16, 3)), jnp.float32
    )
    a = np.asarray(build_forward(g, compute_dtype=jnp.float32)(params, x))
    b = np.asarray(build_forward(
        g, compute_dtype=jnp.float32, residual_dtype=jnp.float32
    )(params, x))
    np.testing.assert_array_equal(a, b)


def test_process_file_accepts_mixed(tmp_path):
    """precision='mixed' flows from the orchestrator flag surface down to
    the engine and produces a valid upscaled stream (the CLI exposes the
    same choices= list, cli/common.py)."""
    from fractions import Fraction

    from upscale_video_tpu.pipeline.process import process_file
    from upscale_video_tpu.video.io import Y4MSink, Y4MSource

    vid = str(tmp_path / "in.y4m")
    rng = np.random.default_rng(3)
    with Y4MSink(vid, 24, 16, Fraction(24, 1)) as sink:
        for _ in range(4):
            sink.write(rng.integers(0, 256, (16, 24, 3), np.uint8))
    out = str(tmp_path / "out.y4m")
    process_file(
        vid, output_file=out, scale=2, temp_dir=str(tmp_path / "t"),
        synthetic_models=True, precision="mixed", frames_per_step=2,
    )
    with Y4MSource(out) as src:
        frames = list(src)
    assert len(frames) == 4 and frames[0].shape == (32, 48, 3)


def test_engine_build_plumbs_residual_dtype():
    """ChainEngine.build(residual_dtype=...) reaches the SR model and the
    processed output keeps the uint8 frames contract."""
    compute, residual = precision_dtypes("mixed")
    eng = ChainEngine.build(
        ChainSpec.parse(None), 2, compute_dtype=compute,
        residual_dtype=residual, synthetic=True,
    )
    assert eng.sr_model.residual_dtype == jnp.float32
    x = np.random.default_rng(0).integers(
        0, 256, (1, 20, 24, 3), np.uint8
    )
    y = eng.process(x)
    assert y.dtype == np.uint8 and y.shape == (1, 40, 48, 3)

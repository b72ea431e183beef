"""Tests for the ncnn .bin weight loader (fp16/fp32 tags, alignment)."""

import os

import numpy as np
import pytest

from upscale_video_tpu.models.bin_loader import (
    TAG_F16,
    TAG_F32,
    emit_bin,
    load_weights,
    load_weights_file,
    synthesize_weights,
)
from upscale_video_tpu.models.param_parser import parse_param_file
from upscale_video_tpu.models.zoo import make_srvgg_graph
from tests.conftest import REFERENCE_MODELS, reference_models_available


def test_roundtrip_f32(rng):
    g = make_srvgg_graph(scale=2, num_conv=2, num_feat=8)
    params = synthesize_weights(g, seed=7)
    data = emit_bin(g, params, tag=TAG_F32)
    loaded = load_weights(g, data)
    for lname, entry in params.items():
        for k, v in entry.items():
            np.testing.assert_allclose(loaded[lname][k], v, rtol=0, atol=0)


def test_roundtrip_f16(rng):
    g = make_srvgg_graph(scale=2, num_conv=2, num_feat=8)
    params = synthesize_weights(g, seed=7)
    data = emit_bin(g, params, tag=TAG_F16)
    loaded = load_weights(g, data)
    for lname, entry in params.items():
        for k, v in entry.items():
            if k == "bias" or lname.startswith("prelu"):
                np.testing.assert_array_equal(loaded[lname][k], v)
            else:  # weights round-trip through fp16
                np.testing.assert_allclose(loaded[lname][k], v, atol=1e-3)


def test_f16_alignment_padding():
    """Odd weight counts force 2-byte padding; loader must skip it."""
    g = make_srvgg_graph(scale=1, num_conv=0, num_feat=3, in_ch=3, out_ch=3)
    # conv weights: 3*3*9=81 and 3*3*9=81 elements -> 162 bytes, padded to 164
    params = synthesize_weights(g, seed=3)
    data = emit_bin(g, params, tag=TAG_F16)
    loaded = load_weights(g, data)  # strict: raises on misalignment drift
    assert loaded["conv_0"]["weight"].shape == (3, 3, 3, 3)


def test_trailing_bytes_strict():
    g = make_srvgg_graph(scale=2, num_conv=1, num_feat=4)
    params = synthesize_weights(g)
    data = emit_bin(g, params, tag=TAG_F32) + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="unconsumed"):
        load_weights(g, data)
    load_weights(g, data, strict=False)  # tolerated when not strict


def test_underrun():
    g = make_srvgg_graph(scale=2, num_conv=1, num_feat=4)
    params = synthesize_weights(g)
    data = emit_bin(g, params, tag=TAG_F32)[:-8]
    with pytest.raises(ValueError, match="underrun"):
        load_weights(g, data)


@pytest.mark.skipif(not reference_models_available(), reason="reference zoo absent")
@pytest.mark.parametrize(
    "stem,first_conv,feat",
    [
        ("2x_Compact_Pretrain", "Conv_0", 64),
        ("4x_Compact_Pretrain", "Conv_0", 64),
        ("1x_HurrDeblur_SubCompact_nf24-nc8_244k_net_g", "Conv_0", 24),
    ],
)
def test_load_reference_bins(stem, first_conv, feat):
    """The real zoo .bin files must decompose with zero trailing bytes."""
    g = parse_param_file(os.path.join(REFERENCE_MODELS, stem + ".param"))
    params = load_weights_file(g, os.path.join(REFERENCE_MODELS, stem + ".bin"))
    w = params[first_conv]["weight"]
    assert w.shape == (3, 3, 3, feat)  # HWIO: 3x3 kernel, RGB in
    assert np.isfinite(w).all()
    b = params[first_conv]["bias"]
    assert b.shape == (feat,)
    # fp16-stored weights must be in a sane range
    assert np.abs(w).max() < 100


@pytest.mark.skipif(not reference_models_available(), reason="reference zoo absent")
@pytest.mark.slow
def test_valar_byte_layout_roundtrip():
    """Lock the .bin byte layout against the one zoo graph whose real
    weights are unobtainable (4x_Valar_v1.bin is absent upstream,
    .MISSING_LARGE_BLOBS:1): synthesize weights for the REAL 1206-layer
    .param graph, emit the .bin, and strict-load it back — proving the
    loader walks all 420 convs' tagged blocks with zero trailing bytes."""
    g = parse_param_file(os.path.join(REFERENCE_MODELS, "4x_Valar_v1.param"))
    assert len(g.layers) == 1206
    params = synthesize_weights(g, seed=11)
    data = emit_bin(g, params)
    loaded = load_weights(g, data, strict=True)  # raises on trailing bytes
    assert set(loaded) == set(params)
    total = 0
    for name, p in params.items():
        for key, arr in p.items():
            got = loaded[name][key]
            assert got.shape == arr.shape, (name, key)
            # emit uses the zoo's own fp16 storage tag for weights
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(arr, np.float32),
                atol=2e-3, rtol=2e-3,
            )
            total += arr.size
    assert total > 16_000_000  # RRDBNet: ~16.7M params

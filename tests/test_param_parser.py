"""Tests for the ncnn .param parser (format per models/*.param in the zoo)."""

import os

import pytest

from upscale_video_tpu.models.param_parser import (
    NCNN_MAGIC,
    NcnnGraph,
    NcnnLayer,
    emit_param,
    parse_param,
    parse_param_file,
)
from tests.conftest import REFERENCE_MODELS, reference_models_available

TINY_PARAM = """7767517
6 7
Input            input                    0 1 input
Split            split0                   1 2 input a b
Convolution      conv0                    1 1 b c 0=4 1=3 4=1 5=1 6=108 9=2 -23310=1,2.000000e-01
PReLU            prelu0                   1 1 c d 0=4
Interp           up0                      1 1 a e 0=1 1=2.000000e+00 2=2.000000e+00
BinaryOp         add0                     2 1 d e output
"""


def test_parse_tiny():
    g = parse_param(TINY_PARAM)
    assert len(g.layers) == 6
    assert g.blob_count == 7
    assert g.input_blobs == ["input"]
    assert g.output_blobs == ["output"]
    conv = g.layer_by_name("conv0")
    assert conv.attr_i(0) == 4
    assert conv.attr_i(9) == 2
    assert conv.attr(10) == [0.2]  # -23310 array attr -> id 10
    interp = g.layer_by_name("up0")
    assert interp.attr_f(1) == 2.0


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        parse_param("123\n1 1\nInput in 0 1 x")


def test_layer_count_mismatch():
    bad = TINY_PARAM.replace("6 7", "5 7")
    with pytest.raises(ValueError, match="layers"):
        parse_param(bad)


def test_roundtrip():
    g = parse_param(TINY_PARAM)
    g2 = parse_param(emit_param(g))
    assert [l.name for l in g2.layers] == [l.name for l in g.layers]
    assert g2.layer_by_name("conv0").attrs == g.layer_by_name("conv0").attrs


@pytest.mark.skipif(not reference_models_available(), reason="reference zoo absent")
@pytest.mark.parametrize(
    "stem,layers,blobs",
    [
        ("2x_Compact_Pretrain", 40, 41),
        ("4x_Compact_Pretrain", 40, 41),
        ("1x_HurrDeblur_SubCompact_nf24-nc8_244k_net_g", 24, 25),
        ("4x_Valar_v1", 1206, 2127),
    ],
)
def test_parse_reference_zoo(stem, layers, blobs):
    g = parse_param_file(os.path.join(REFERENCE_MODELS, stem + ".param"))
    assert len(g.layers) == layers
    assert g.blob_count == blobs
    assert g.input_blobs == ["input"]
    assert g.output_blobs == ["output"]


@pytest.mark.skipif(not reference_models_available(), reason="reference zoo absent")
def test_valar_structure():
    g = parse_param_file(os.path.join(REFERENCE_MODELS, "4x_Valar_v1.param"))
    counts = g.count_types()
    assert counts["Convolution"] == 420
    assert counts["Split"] == 276
    assert counts["Concat"] == 276
    # leaky-relu fusion attr on body convs
    conv1 = g.layer_by_name("Conv_1")
    assert conv1.attr_i(9) == 2 and conv1.attr(10) == [0.2]
    # ESRGAN residual scaling in Eltwise coeffs
    elt = g.layer_by_name("Add_19")
    assert elt.attr_i(0) == 1 and elt.attr(1) == [0.2, 1.0]

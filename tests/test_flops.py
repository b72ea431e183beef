"""Analytic conv FLOP walk (models/flops.py) vs XLA's own cost analysis.

The bench artifact's tflops/mfu fields are computed from this walk whenever
XLA cost analysis is unavailable (always, for the 1,206-layer Valar program
— a second lowering costs minutes on the remote platform).  These tests pin
the walk against two independent oracles: the closed-form MAC count for a
known tower, and jit(...).lower().compile().cost_analysis() on CPU.
"""

import jax
import jax.numpy as jnp
import pytest

from upscale_video_tpu.models.bin_loader import synthesize_weights
from upscale_video_tpu.models.executor import build_forward
from upscale_video_tpu.models.flops import graph_conv_flops
from upscale_video_tpu.models.zoo import make_rrdb_graph, make_srvgg_graph


def _xla_flops(graph, h, w):
    params = synthesize_weights(graph, seed=1)
    fwd = build_forward(graph, compute_dtype=jnp.float32)
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    ca = jax.jit(fwd).lower(params, x).compile().cost_analysis()
    return ca["flops"] if isinstance(ca, dict) else ca[0]["flops"]


def test_srvgg_closed_form():
    # SRVGG tower: first conv 3->F, num_conv convs F->F, up conv F->out*s^2,
    # all 3x3 stride-1 SAME -> oh,ow == h,w.
    F, C, s, h, w = 16, 4, 2, 40, 56
    g = make_srvgg_graph(num_feat=F, num_conv=C, scale=s)
    macs = (3 * F + C * F * F + F * 3 * s * s) * 9 * h * w
    assert graph_conv_flops(g, h, w) == pytest.approx(2.0 * macs, rel=0)


@pytest.mark.parametrize(
    "graph,h,w",
    [
        (make_srvgg_graph(num_feat=64, num_conv=16, scale=2), 96, 96),
        (make_rrdb_graph(num_rrdb=2), 64, 48),
    ],
    ids=["srvgg-flagship", "rrdb"],
)
def test_vs_xla_cost_analysis(graph, h, w):
    # Conv-only analytic count must land near XLA's: XLA additionally
    # prices elementwise work (PReLU/add/interp) but its optimized-HLO
    # count also shifts a few % with fusion decisions, so the band is
    # loose — it exists to catch a mis-propagated shape (off by 2x+),
    # not flop-accounting philosophy.
    an = graph_conv_flops(graph, h, w)
    xla = _xla_flops(graph, h, w)
    assert 0.75 * xla <= an <= 1.05 * xla


def test_valar_synth_scale():
    # The real 4x_Valar_v1 geometry (23 RRDBs) at a 480x480 tile is ~2.0
    # TFLOPs/frame-tile; pin the order of magnitude so a shape-propagation
    # regression in any op can't silently zero the Valar MFU field.
    g = make_rrdb_graph(num_rrdb=23)
    flops = graph_conv_flops(g, 480, 480)
    assert 1e12 < flops < 1e13

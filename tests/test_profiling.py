"""Tests for observability helpers (StageTimer, trace)."""

import os
import time

from upscale_video_tpu.utils.profiling import StageTimer, trace


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("decode", 3):
        time.sleep(0.01)
    with t.stage("decode", 2):
        pass
    with t.stage("infer"):
        time.sleep(0.005)
    assert t.items["decode"] == 5
    assert t.seconds["decode"] >= 0.01
    s = t.summary()
    assert "decode" in s and "infer" in s and "/s" in s


def test_stage_timer_exception_safe():
    t = StageTimer()
    try:
        with t.stage("boom", 1):
            raise ValueError("x")
    except ValueError:
        pass
    assert t.items["boom"] == 1


def test_trace_noop():
    with trace(None):
        pass  # must be a no-op without jax involvement


def test_trace_writes(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        import jax.numpy as jnp

        (jnp.ones((4, 4)) * 2).block_until_ready()
    assert os.path.isdir(d)
    # profiler drops at least one artifact under the directory tree
    found = any(files for _, _, files in os.walk(d))
    assert found

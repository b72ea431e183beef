"""bench.py contract: one JSON line, model-dependent metric names, the
Valar sidecar riding the headline artifact (round-3 verdict item 2)."""

import json
import sys

import pytest

import bench


@pytest.fixture(autouse=True)
def fake_backend_probe(monkeypatch):
    # the real probe spawns a jax-importing subprocess (and would hang on
    # the tunneled TPU during an outage) — contract tests stub it
    monkeypatch.setattr(bench, "_backend_reachable", lambda *a, **k: True)


def test_unreachable_backend_fails_fast(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_backend_reachable", lambda *a, **k: False)
    monkeypatch.setenv("UPSCALE_TPU_BENCH_WAIT_S", "0")
    old = sys.argv
    sys.argv = ["bench.py"]
    try:
        assert bench.main() == 1
    finally:
        sys.argv = old
    out = capsys.readouterr()
    assert out.out == ""  # stdout stays reserved for the one JSON line
    assert "unreachable" in out.err


def test_backend_wait_retries_until_up(monkeypatch):
    # outage that ends mid-wait: _await_backend keeps probing and returns
    # True once the backend answers, without consuming the full budget
    states = iter([False, False, True])
    monkeypatch.setattr(bench, "_backend_reachable",
                        lambda *a, **k: next(states))
    monkeypatch.setenv("UPSCALE_TPU_BENCH_WAIT_S", "3600")
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    assert bench._await_backend() is True
    assert len(sleeps) == 2
    assert all(s <= 60.0 for s in sleeps)


@pytest.fixture
def fake_device_mode(monkeypatch):
    monkeypatch.setattr(bench, "run_device_mode",
                        lambda args: (24.0, {"tflops": 61.0, "mfu": 0.309}))


def _run(capsys, argv):
    old = sys.argv
    sys.argv = ["bench.py"] + argv
    try:
        assert bench.main() == 0
    finally:
        sys.argv = old
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1, "bench must print exactly ONE line"
    return json.loads(lines[0])

def test_default_metric_and_extras(fake_device_mode, capsys, monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "VALAR_SIDECAR", str(tmp_path / "v.json"))
    out = _run(capsys, [])
    assert out["metric"].endswith("2x_compact")
    assert out["value"] == 24.0
    assert out["vs_baseline"] == round(24.0 / 1.4, 2)
    assert out["tflops"] == 61.0 and out["mfu"] == 0.309


def test_valar_mode_writes_sidecar_and_headline_carries_it(
    capsys, monkeypatch, tmp_path
):
    monkeypatch.setattr(bench, "VALAR_SIDECAR", str(tmp_path / "v.json"))
    monkeypatch.setattr(bench, "run_device_mode", lambda args: (0.41, {}))
    out = _run(capsys, ["--models", "r"])
    assert out["metric"].endswith("4x_valar")
    # the -m r run shortens the chained protocol automatically
    monkeypatch.setattr(bench, "run_device_mode",
                        lambda args: (24.0, {"tflops": 61.0}))
    out2 = _run(capsys, [])
    assert out2["valar_fps"] == 0.41


def test_valar_detection_uses_chain_parse(capsys, monkeypatch, tmp_path):
    """Family detection must agree with the engine's OWN DSL parse —
    a hand-rolled split desynchronized on whitespace ('a, r') and ran the
    Compact protocol against the Valar engine."""
    monkeypatch.setattr(bench, "VALAR_SIDECAR", str(tmp_path / "v.json"))
    seen = {}

    def fake(args):
        seen.update(batch=args.batch)
        return (0.4, {})

    monkeypatch.setattr(bench, "run_device_mode", fake)
    out = _run(capsys, ["--models", "a, r"])
    assert out["metric"].endswith("4x_valar")
    assert "1080p_to_8k" in out["metric"]  # 4x of 1080p is 8K, not 4K
    assert seen["batch"] == 1  # Valar protocol engaged


def test_valar_defaults_shorten_chain(monkeypatch, capsys, tmp_path):
    monkeypatch.setattr(bench, "VALAR_SIDECAR", str(tmp_path / "v.json"))
    seen = {}

    def fake(args):
        seen.update(chain=args.chain, chain2=args.chain2, batch=args.batch)
        return (1.0, {})

    monkeypatch.setattr(bench, "run_device_mode", fake)
    _run(capsys, ["--models", "r"])
    assert (seen["chain"], seen["chain2"], seen["batch"]) == (1, 3, 1)
    _run(capsys, [])
    assert (seen["chain"], seen["chain2"], seen["batch"]) == (5, 20, 4)

"""Driver entry points must work both in-process (enough devices) and by
self-provisioning a virtual CPU mesh in a subprocess (the driver's 1-chip
host case that failed in round 1 — VERDICT.md item 1)."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np
import pytest

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, (params, x) = graft.entry()
    y = jax.jit(fn)(params, x)
    assert y.shape == (1, 256, 256, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_dryrun_multichip_in_process(capsys):
    # the test env provides 8 virtual CPU devices, so the body runs inline
    graft.dryrun_multichip(8)
    assert "dryrun_multichip ok" in capsys.readouterr().out


@pytest.mark.slow
def test_dryrun_multichip_subprocess(capsys):
    # more devices than this process has -> the subprocess self-provisioning
    # path (what the driver exercises on a 1-chip host)
    graft.dryrun_multichip(16)
    assert "dryrun_multichip ok" in capsys.readouterr().out

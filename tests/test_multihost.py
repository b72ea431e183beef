"""Real cross-process jax.distributed integration (SURVEY.md §2.5's DCN
analog): two CPU processes form ONE global mesh through
``initialize_multihost``'s explicit env contract and run a GSPMD-sharded
reduction whose collective crosses the process boundary (Gloo transport).
Upgrades the multi-host path from mock-tested (tests/test_parallel.py
TestMultihostInit) to integration-tested.
"""

import os
import socket
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from upscale_video_tpu.parallel.mesh import (
    describe_devices, initialize_multihost, make_mesh,
)

n = initialize_multihost()
assert n == 2, f"expected 2 processes, got {n}"
devs = jax.devices()
assert len(devs) == 2, devs
assert jax.local_device_count() == 1

from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh({"dp": 2}, devices=devs)
sh = NamedSharding(mesh, P("dp"))
# each process contributes its own shard: value = process_id + 1
arr = jax.make_array_from_callback(
    (2, 4), sh,
    lambda idx: np.full((1, 4), jax.process_index() + 1, np.float32),
)
tot = jax.jit(lambda v: v.sum(), out_shardings=NamedSharding(mesh, P()))(arr)
val = float(np.asarray(tot))
assert val == (1 + 2) * 4, val  # proves the reduction crossed processes
inv = describe_devices()
assert len(inv) == 2 and any("process 1" in line for line in inv), inv
print(f"MHOK {jax.process_index()} {val}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(
        os.environ,
        COORDINATOR_ADDRESS=f"127.0.0.1:{_free_port()}",
        NUM_PROCESSES="2",
    )
    # one real CPU device per process (conftest's virtual-8 flag would make
    # the global mesh 16-wide and hide the cross-process axis)
    env.pop("XLA_FLAGS", None)
    # the worker runs from a tmp cwd: make the package importable even when
    # the editable install is absent (fresh checkout / wiped venv).  PREPEND —
    # never overwrite — PYTHONPATH: this image's TPU plugin lives on it.
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO_ROOT] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker)],
            env=dict(env, PROCESS_ID=str(i)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO_ROOT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert all("MHOK" in o for o in outs), "\n---\n".join(outs)

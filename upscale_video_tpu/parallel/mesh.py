"""Device meshes and chip selection.

Replaces the reference's Vulkan device enumeration + worker-identity
arithmetic (upscale_processing.py:59-68 ``_identity[0]-1-workers_used`` —
SURVEY.md §5 lists this as a latent defect class) with explicit
``jax.devices()`` handles and a ``jax.sharding.Mesh``.

The ``-g`` chip multiset keeps its CLI shape (``0,0,1``): on TPU a repeated
chip cannot run independent "workers", so repetition scales the on-chip
frame batch instead (k repeats => k x frames per step on that chip's share)
— the same calibration intent as README:39-63.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def parse_chips(chips: Optional[str]) -> Tuple[List[int], int]:
    """``"0,0,1"`` -> (unique chip ids [0, 1], batch multiplier 2).

    The multiplier is the max repetition count — the reference ran k
    workers on a GPU listed k times; here that becomes k x batch depth.
    """
    if not chips:
        return [0], 1
    try:
        ids = [int(g) for g in chips.split(",")]
    except ValueError as e:
        raise ValueError(f"invalid chips spec {chips!r}") from e
    counts = Counter(ids)
    return sorted(counts), max(counts.values())


def select_devices(chip_ids: Sequence[int]) -> List[jax.Device]:
    devs = jax.devices()
    bad = [i for i in chip_ids if i >= len(devs)]
    if bad:
        raise ValueError(f"chip ids {bad} out of range (have {len(devs)} devices)")
    return [devs[i] for i in chip_ids]


def parse_mesh_spec(spec: str) -> Dict[str, int]:
    """``"dp=2,sp=4"`` -> {"dp": 2, "sp": 4}."""
    out: Dict[str, int] = {}
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        k, _, v = item.partition("=")
        out[k.strip()] = int(v)
    return out


def make_mesh(
    spec: str | Dict[str, int],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named mesh, e.g. ``make_mesh("dp=2,sp=4")``.

    Axis names used by this framework: ``dp`` (frames), ``sp`` (frame
    height), ``tp`` (conv channels).  Sizes must multiply to the device
    count (a trailing axis of size -1 is inferred).
    """
    axes = parse_mesh_spec(spec) if isinstance(spec, str) else dict(spec)
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    sizes = list(axes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one inferred (-1) axis")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    need = int(np.prod(sizes))
    if need > n:
        raise ValueError(f"mesh {axes} needs {need} devices, have {n}")
    # a smaller mesh uses the first `need` devices (like the reference's -g
    # GPU subset selection, upscale_processing.py:809-817)
    arr = np.array(devs[:need]).reshape(sizes)
    return Mesh(arr, tuple(axes.keys()))


def initialize_multihost() -> int:
    """Initialize ``jax.distributed`` for multi-host pods when the standard
    TPU VM environment variables are present; no-op otherwise.

    The reference's multi-machine story was a shared zip directory
    (upscale_only/merge_only); for jointly-scheduled TPU pods this enables
    one mesh over all hosts' chips (DCN-coordinated, ICI collectives
    within a slice).  Returns the process count.
    """
    import os

    addr = os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        # explicit generic contract (any cluster manager can export these
        # three; integration-tested cross-process in tests/test_multihost.py)
        num = os.environ.get("NUM_PROCESSES")
        pid = os.environ.get("PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(num) if num is not None else None,
            process_id=int(pid) if pid is not None else None,
        )
    elif os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        # jointly-scheduled TPU pod: jax auto-detects topology
        jax.distributed.initialize()
    return jax.process_count()


def describe_devices() -> List[str]:
    """Human-readable chip inventory (test-chips calibration tool; replaces
    ncnn.get_gpu_info enumeration at test_gpus.py:47-67)."""
    out = []
    for d in jax.devices():
        out.append(
            f"chip {d.id}: {d.platform}/{d.device_kind}"
            + (f" (process {d.process_index})" if d.process_index else "")
        )
    return out

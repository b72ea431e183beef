"""Training checkpoint/restore via orbax.

The inference pipeline's durable state is file sentinels (reference
parity, video/frames.py); fine-tuning — a beyond-reference capability —
gets real checkpoints: params + optimizer state + step, preemption-safe
for TPU VMs.  Final weights additionally export to ncnn files via
``Model.save`` so the reference engine can consume them.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from upscale_video_tpu.train.trainer import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    """Write params/opt_state/step under ``ckpt_dir/step_{N}``."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{state.step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        },
        force=True,
    )
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{max(steps)}")


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (same model/optimizer)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": template.params,
        "opt_state": template.opt_state,
        "step": np.asarray(template.step),
    }
    restored = ckptr.restore(path, target)
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )

"""Training checkpoint round-trip and resume-continuity tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from upscale_video_tpu.models.zoo import make_synthetic_model
from upscale_video_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from upscale_video_tpu.train.trainer import (
    make_train_state,
    make_train_step,
    synthesize_pairs,
)


def test_checkpoint_roundtrip(tmp_path, rng):
    model = make_synthetic_model(scale=2, num_conv=1, num_feat=8,
                                 compute_dtype=jnp.float32)
    state, tx = make_train_state(model, learning_rate=1e-3)
    step = make_train_step(model, tx)
    lr_imgs, hr_imgs = synthesize_pairs(rng, 2, 8, 8, 2)
    for _ in range(3):
        state, loss = step(state, lr_imgs, hr_imgs)

    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path

    fresh, _ = make_train_state(model, learning_rate=1e-3)
    restored = restore_checkpoint(path, fresh)
    assert restored.step == 3
    for k in state.params:
        for name, v in state.params[k].items():
            np.testing.assert_array_equal(
                np.asarray(restored.params[k][name]), np.asarray(v)
            )
    # resumed training continues bit-identically to uninterrupted training
    cont_a, loss_a = step(state, lr_imgs, hr_imgs)
    cont_b, loss_b = step(restored, lr_imgs, hr_imgs)
    assert loss_a == loss_b


def test_latest_checkpoint_empty(tmp_path):
    assert latest_checkpoint(str(tmp_path / "nope")) is None

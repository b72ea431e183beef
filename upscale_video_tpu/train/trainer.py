"""Fine-tuning SRVGGNetCompact-family models on TPU meshes.

The reference ships frozen pretrained weights only; this module adds the
training capability the upstream Real-ESRGAN ecosystem assumes: Charbonnier
(smooth-L1) reconstruction fine-tuning of any loaded/synthesized Compact
model, with **dp x sp sharded** steps — the batch dim over ``dp`` and the
image H axis over ``sp``.  Sharding uses GSPMD jit annotations: convs over
a spatially-sharded H axis make XLA insert the halo ``collective-permute``s
itself (the scaling-book recipe: annotate shardings, let XLA place
collectives on ICI).

Params stay f32; the forward can run bf16 (the model's compute_dtype) with
f32 loss/grad accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from upscale_video_tpu.models.zoo import Model


@dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int = 0


def charbonnier(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps * eps))


def make_train_state(model: Model, learning_rate: float = 1e-4):
    """Adam state over the model's params pytree."""
    tx = optax.adam(learning_rate)
    params = jax.tree_util.tree_map(jnp.asarray, model.params)
    return TrainState(params=params, opt_state=tx.init(params)), tx


def _differentiable_forward(model: Model) -> Callable:
    """The XLA-path forward for autodiff: pallas_call has no differentiation
    rule, so a model carrying pallas_conv=True or rdb_kernel=True (e.g.
    taken off a conv_impl='pallas'/'rdb' engine) must not be differentiated
    through its inference forward."""
    if not (getattr(model, "pallas_conv", False)
            or getattr(model, "rdb_kernel", False)):
        return model.forward
    from upscale_video_tpu.models.executor import build_forward

    return build_forward(model.graph, compute_dtype=model.compute_dtype,
                         pallas_conv=False)


def make_train_step(model: Model, tx) -> Callable:
    """Single-device jitted train step: (state, lr_imgs, hr_imgs) -> (state, loss).

    The returned loss is a DEVICE scalar: fetching it per step would block
    dispatch (and on this platform expose every step to the documented
    100-550 s D2H stalls) — callers ``float()`` it when they actually log.
    """
    fwd = _differentiable_forward(model)

    @jax.jit
    def step(params, opt_state, lr_imgs, hr_imgs):
        def loss_fn(p):
            pred = fwd(p, lr_imgs)
            return charbonnier(pred.astype(jnp.float32), hr_imgs.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def apply(state: TrainState, lr_imgs, hr_imgs) -> Tuple[TrainState, jnp.ndarray]:
        params, opt_state, loss = step(state.params, state.opt_state, lr_imgs, hr_imgs)
        return TrainState(params, opt_state, state.step + 1), loss

    return apply


def make_sharded_train_step(
    model: Model,
    tx,
    mesh: Mesh,
    batch_axis: Optional[str] = "dp",
    h_axis: Optional[str] = "sp",
) -> Callable:
    """dp x sp sharded train step over ``mesh``.

    Input batches are placed with N over ``batch_axis`` and H over
    ``h_axis``; params/optimizer state are replicated.  XLA partitions the
    conv stack spatially and inserts halo exchanges + grad psums on ICI.

    Returns ``step(params, opt_state, lr_imgs, hr_imgs) -> (params,
    opt_state, loss)`` (jitted; feed numpy or pre-sharded arrays).  For
    TrainState/step bookkeeping compatible with the checkpoint API, wrap
    with :func:`make_state_apply`.
    """
    fwd = _differentiable_forward(model)
    b = batch_axis if batch_axis in mesh.shape else None
    h = h_axis if h_axis in mesh.shape else None
    data_spec = NamedSharding(mesh, P(b, h, None, None))
    repl = NamedSharding(mesh, P())

    def _step(params, opt_state, lr_imgs, hr_imgs):
        def loss_fn(p):
            pred = fwd(p, lr_imgs)
            return charbonnier(pred.astype(jnp.float32), hr_imgs.astype(jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        _step,
        in_shardings=(repl, repl, data_spec, data_spec),
        out_shardings=(repl, repl, repl),
    )


def make_state_apply(step_fn: Callable) -> Callable:
    """Wrap a raw ``(params, opt_state, lr, hr) -> (params, opt_state,
    loss)`` step (e.g. from :func:`make_sharded_train_step`) into the same
    ``(TrainState, lr, hr) -> (TrainState, loss)`` contract as
    :func:`make_train_step`, advancing ``state.step`` so checkpoint
    directories (checkpoint.py ``step_{n}``) don't collapse onto step_0."""
    def apply(state: TrainState, lr_imgs, hr_imgs):
        params, opt_state, loss = step_fn(
            state.params, state.opt_state, lr_imgs, hr_imgs
        )
        return TrainState(params, opt_state, state.step + 1), loss

    return apply


def synthesize_pairs(
    rng: np.random.Generator, n: int, h: int, w: int, scale: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(LR, HR) pairs: smooth random HR fields box-downsampled to LR —
    enough structure for loss-decreases tests and throughput benchmarks."""
    hr = rng.uniform(0, 1, (n, h * scale, w * scale, 3)).astype(np.float32)
    # cheap smoothing so SR has learnable structure
    hr = (hr + np.roll(hr, 1, 1) + np.roll(hr, 1, 2) + np.roll(hr, -1, 1)) / 4.0
    lr = hr.reshape(n, h, scale, w, scale, 3).mean(axis=(2, 4))
    return lr.astype(np.float32), hr.astype(np.float32)

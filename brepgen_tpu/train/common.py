"""Shared training machinery: state, optimizers, losses.

Optimizer settings mirror the reference:
  * VAEs: AdamW lr 5e-4, wd 1e-5, grad-clip 5.0 (``trainer.py:40-44,90``)
  * LDMs: AdamW lr 5e-4, betas (0.95, 0.999), wd 1e-6, grad-clip 50.0
    (``trainer.py:297-303,358``)

On TPU we train in bf16 compute with f32 params/optimizer -- no loss
scaling needed (the reference's CUDA fp16 GradScaler has no TPU analog).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_vae_optimizer(lr: float = 5e-4, weight_decay: float = 1e-5, clip: float = 5.0):
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def make_ldm_optimizer(
    lr: float = 5e-4, weight_decay: float = 1e-6, clip: float = 50.0
):
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, b1=0.95, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )


def init_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def apply_updates(state: TrainState, grads, optimizer) -> TrainState:
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1)


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over unmasked token elements.

    ``mask``: True = padded/invalid (key-padding convention). Equivalent to
    the reference's ``loss_fn(pred[~mask], noise[~mask])`` -- a mean over all
    elements of the selected tokens.
    """
    w = (~mask).astype(jnp.float32)
    # broadcast mask [B, S] over trailing feature dims
    while w.ndim < pred.ndim:
        w = w[..., None]
    se = jnp.square(pred - target) * w
    return jnp.sum(se) / jnp.maximum(jnp.sum(w * jnp.ones_like(pred)), 1.0)

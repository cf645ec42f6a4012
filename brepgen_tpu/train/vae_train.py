"""VAE training steps (surface 2D / edge 1D) as pure jitted functions.

Loss = MSE(recon, x) + 1e-6 * mean(KL) with a sampled posterior, matching
reference ``trainer.py:79-86`` (surface) / ``trainer.py:205-216`` (edge; the
reference computes the edge KL explicitly but it equals the standard
diagonal-Gaussian KL summed over channel+length, which ``DiagonalGaussian.kl``
gives us directly).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from brepgen_tpu.train.common import TrainState, apply_updates

KL_WEIGHT = 1e-6


def vae_loss(model, params, batch, rng):
    """batch: [B, ...] grids (NHWC / NLC). Returns (loss, (mse, kl))."""
    posterior = model.apply(params, batch, method=type(model).encode)
    z = posterior.sample(rng)
    dec = model.apply(params, z, method=type(model).decode)
    mse = jnp.mean(jnp.square(dec - batch))
    kl = jnp.mean(posterior.kl())
    return mse + KL_WEIGHT * kl, (mse, kl)


def make_train_step(model, optimizer) -> Callable:
    @jax.jit
    def train_step(state: TrainState, batch: jnp.ndarray, rng) -> Tuple[TrainState, dict]:
        grad_fn = jax.value_and_grad(
            lambda p: vae_loss(model, p, batch, rng), has_aux=True
        )
        (loss, (mse, kl)), grads = grad_fn(state.params)
        state = apply_updates(state, grads, optimizer)
        return state, {"loss": loss, "mse": mse, "kl": kl}

    return train_step


def make_eval_step(model) -> Callable:
    @jax.jit
    def eval_step(params, batch, rng):
        posterior = model.apply(params, batch, method=type(model).encode)
        z = posterior.sample(rng)  # reference validates with sampled z too
        dec = model.apply(params, z, method=type(model).decode)
        axes = tuple(range(1, batch.ndim))
        return jnp.sum(jnp.mean(jnp.square(dec - batch), axis=axes))

    return eval_step


def make_encoder_fn(model) -> Callable:
    """Frozen fast-encode: posterior MODE (reference ``network.py:944``)."""

    @jax.jit
    def encode(params, batch):
        return model.apply(params, batch, method=type(model).encode).mode()

    return encode


def make_decoder_fn(model) -> Callable:
    @jax.jit
    def decode(params, z):
        return model.apply(params, z, method=type(model).decode)

    return decode

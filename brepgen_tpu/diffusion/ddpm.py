"""DDPM (Ho et al. 2020) as pure JAX functions with static per-step plans.

Re-derivation of the scheduler behavior the reference relies on through
diffusers' ``DDPMScheduler`` (reference ``trainer.py:285-292`` for training
and ``sample.py:109-117`` for inference): 1000 train timesteps, linear betas
1e-4 -> 0.02, epsilon prediction, "fixed_small" posterior variance, and an
optional clip of the predicted x0 to +/- ``clip_range`` during sampling.

Everything here is a pure function over a precomputed coefficient table so
that the denoising loop compiles to a single ``lax.scan`` on TPU: no Python
control flow depends on traced values, shapes are static, and the per-step
scalars are scan inputs rather than recomputed gathers.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class DDPMTables(NamedTuple):
    """Closed-form diffusion tables (computed in float64, stored float32)."""

    betas: jnp.ndarray           # [T]
    alphas: jnp.ndarray          # [T]
    alphas_cumprod: jnp.ndarray  # [T]
    num_train_timesteps: int


def make_betas_linear(
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> np.ndarray:
    """Linear beta schedule (matches the reference's scheduler config)."""
    return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)


def make_ddpm_tables(
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> DDPMTables:
    betas = make_betas_linear(num_train_timesteps, beta_start, beta_end)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    return DDPMTables(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas=jnp.asarray(alphas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        num_train_timesteps=num_train_timesteps,
    )


def add_noise(
    tables: DDPMTables, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """q(x_t | x_0) forward noising: sqrt(a-bar_t) x0 + sqrt(1 - a-bar_t) eps.

    ``t`` is int per batch element, shape [B]; broadcasts over trailing dims.
    Mirrors the training-side usage at reference ``trainer.py:345-348``.
    """
    acp = tables.alphas_cumprod[t]
    # Broadcast [B] -> [B, 1, 1, ...] over x0's trailing dims.
    bshape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
    sqrt_acp = jnp.sqrt(acp).reshape(bshape)
    sqrt_one_minus = jnp.sqrt(1.0 - acp).reshape(bshape)
    return sqrt_acp * x0 + sqrt_one_minus * noise


class DDPMStepCoeffs(NamedTuple):
    """Per-step scalars for the ancestral sampling update (all shape [S])."""

    t: jnp.ndarray                # model conditioning timestep
    sqrt_acp: jnp.ndarray         # sqrt(a-bar_t)
    sqrt_one_minus_acp: jnp.ndarray
    coef_x0: jnp.ndarray          # sqrt(a-bar_prev) beta_t / (1 - a-bar_t)
    coef_xt: jnp.ndarray          # sqrt(alpha_t) (1 - a-bar_prev) / (1 - a-bar_t)
    sigma: jnp.ndarray            # sqrt of fixed_small posterior variance (0 at t=0)


def make_ddpm_plan(
    tables_np: Optional[np.ndarray] = None,
    num_steps: int = 250,
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> DDPMStepCoeffs:
    """Build the static plan for the last ``num_steps`` of ancestral DDPM.

    The reference runs ``ddpm_scheduler.set_timesteps(1000)`` and iterates
    ``timesteps[-250:]`` (t = 249 .. 0) after the PNDM phase
    (``sample.py:144-153``), so prev_t is always t - 1.
    """
    betas = make_betas_linear(num_train_timesteps, beta_start, beta_end)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)

    ts = np.arange(num_steps - 1, -1, -1)  # e.g. 249 .. 0
    acp_t = acp[ts]
    acp_prev = np.where(ts > 0, acp[np.maximum(ts - 1, 0)], 1.0)
    beta_t = betas[ts]
    alpha_t = alphas[ts]

    coef_x0 = np.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = np.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    variance = np.clip((1.0 - acp_prev) / (1.0 - acp_t) * beta_t, 1e-20, None)
    sigma = np.where(ts > 0, np.sqrt(variance), 0.0)

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DDPMStepCoeffs(
        t=jnp.asarray(ts, dtype=jnp.int32),
        sqrt_acp=f32(np.sqrt(acp_t)),
        sqrt_one_minus_acp=f32(np.sqrt(1.0 - acp_t)),
        coef_x0=f32(coef_x0),
        coef_xt=f32(coef_xt),
        sigma=f32(sigma),
    )


def ddpm_step(
    coeffs,  # one slice of DDPMStepCoeffs (scalars)
    x: jnp.ndarray,
    eps: jnp.ndarray,
    noise: jnp.ndarray,
    clip_range: Optional[float] = None,
) -> jnp.ndarray:
    """One ancestral step x_t -> x_{t-1} given the model's eps prediction.

    ``clip_range`` clips the reconstructed x0 (reference uses +/-3 at
    sampling time, ``sample.py:115-116``; training-side scheduler has
    clip_sample=False).
    """
    pred_x0 = (x - coeffs.sqrt_one_minus_acp * eps) / coeffs.sqrt_acp
    if clip_range is not None:
        pred_x0 = jnp.clip(pred_x0, -clip_range, clip_range)
    mean = coeffs.coef_x0 * pred_x0 + coeffs.coef_xt * x
    return mean + coeffs.sigma * noise


def ddpm_scan(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_init: jnp.ndarray,
    plan: DDPMStepCoeffs,
    key: jax.Array,
    clip_range: Optional[float] = 3.0,
) -> jnp.ndarray:
    """Run the full DDPM tail as one lax.scan.

    ``model_fn(x, t) -> eps`` must be shape-preserving; CFG combination and
    masking live inside ``model_fn`` so this loop stays generic.
    """
    num_steps = int(plan.t.shape[0])
    keys = jax.random.split(key, num_steps)

    def body(x, inp):
        coeffs, k = inp
        eps = model_fn(x, coeffs.t)
        noise = jax.random.normal(k, x.shape, dtype=x.dtype)
        return ddpm_step(coeffs, x, eps, noise, clip_range), None

    x_final, _ = jax.lax.scan(body, x_init, (plan, keys))
    return x_final

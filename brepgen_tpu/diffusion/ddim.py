"""DDIM (Song et al. 2021) for fast deterministic sampling.

Optional accelerated mode beyond reference parity: the reference always
runs the ~1216-call PNDM+DDPM protocol; DDIM with eta=0 cuts the cascade
to a configurable step count (e.g. 50 per stage) at some quality cost --
exposed via ``sample.py --fast_steps N`` and evaluated with the same
JSD/MMD/COV harness. Same static-plan lax.scan structure as ddpm.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.diffusion.ddpm import make_betas_linear


class DDIMStepCoeffs(NamedTuple):
    t: jnp.ndarray          # [S] model timestep
    sqrt_acp: jnp.ndarray
    sqrt_one_minus_acp: jnp.ndarray
    sqrt_acp_prev: jnp.ndarray
    dir_coeff: jnp.ndarray  # sqrt(1 - acp_prev - sigma^2)
    sigma: jnp.ndarray


def make_ddim_plan(
    num_inference_steps: int,
    eta: float = 0.0,
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> DDIMStepCoeffs:
    betas = make_betas_linear(num_train_timesteps, beta_start, beta_end)
    acp = np.cumprod(1.0 - betas)

    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * step_ratio).round().astype(np.int64)[::-1]
    prev_ts = ts - step_ratio

    acp_t = acp[ts]
    acp_prev = np.where(prev_ts >= 0, acp[np.maximum(prev_ts, 0)], 1.0)
    variance = (1 - acp_prev) / (1 - acp_t) * (1 - acp_t / acp_prev)
    sigma = eta * np.sqrt(np.clip(variance, 0, None))

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DDIMStepCoeffs(
        t=jnp.asarray(ts, jnp.int32),
        sqrt_acp=f32(np.sqrt(acp_t)),
        sqrt_one_minus_acp=f32(np.sqrt(1 - acp_t)),
        sqrt_acp_prev=f32(np.sqrt(acp_prev)),
        dir_coeff=f32(np.sqrt(np.clip(1 - acp_prev - sigma**2, 0, None))),
        sigma=f32(sigma),
    )


def ddim_scan(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_init: jnp.ndarray,
    plan: DDIMStepCoeffs,
    key: Optional[jax.Array] = None,
    clip_range: Optional[float] = None,
) -> jnp.ndarray:
    num_steps = int(plan.t.shape[0])
    keys = (
        jax.random.split(key, num_steps)
        if key is not None
        else jnp.zeros((num_steps, 2), jnp.uint32)
    )

    def body(x, inp):
        c, k = inp
        eps = model_fn(x, c.t)
        x0 = (x - c.sqrt_one_minus_acp * eps) / c.sqrt_acp
        if clip_range is not None:
            x0 = jnp.clip(x0, -clip_range, clip_range)
        x_new = c.sqrt_acp_prev * x0 + c.dir_coeff * eps
        if key is not None:
            x_new = x_new + c.sigma * jax.random.normal(k, x.shape, x.dtype)
        return x_new, None

    x_final, _ = jax.lax.scan(body, x_init, (plan, keys))
    return x_final

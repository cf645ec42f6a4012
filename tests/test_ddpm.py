"""Golden-value and property tests for the DDPM scheduler."""

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.diffusion import (
    add_noise,
    ddpm_scan,
    ddpm_step,
    make_ddpm_plan,
    make_ddpm_tables,
)


def test_beta_table_golden():
    t = make_ddpm_tables()
    betas = np.asarray(t.betas)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-6)
    # linspace midpoint
    np.testing.assert_allclose(betas[500], 1e-4 + (0.02 - 1e-4) * 500 / 999, rtol=1e-6)
    acp = np.asarray(t.alphas_cumprod)
    # hand-computed: prod_{i<3}(1 - beta_i)
    expected = (1 - betas[0]) * (1 - betas[1]) * (1 - betas[2])
    np.testing.assert_allclose(acp[2], expected, rtol=1e-6)
    assert acp[-1] < 5e-5  # nearly fully noised at t=999


def test_add_noise_matches_closed_form():
    tables = make_ddpm_tables()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(4, 5, 6)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(4, 5, 6)), jnp.float32)
    t = jnp.asarray([0, 10, 500, 999])
    out = add_noise(tables, x0, noise, t)
    acp = np.asarray(tables.alphas_cumprod)
    for i, ti in enumerate([0, 10, 500, 999]):
        expected = np.sqrt(acp[ti]) * np.asarray(x0[i]) + np.sqrt(1 - acp[ti]) * np.asarray(noise[i])
        np.testing.assert_allclose(np.asarray(out[i]), expected, rtol=1e-5, atol=1e-6)


def test_step_at_t1_recovers_x0():
    """At t=1 with the true eps, the posterior mean is x0-dominated."""
    tables = make_ddpm_tables()
    plan = make_ddpm_plan(num_steps=250)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32) * 0.5
    noise = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
    t = jnp.asarray([1, 1])
    xt = add_noise(tables, x0, noise, t)
    # plan index for t=1 is num_steps-2 (plan.t goes 249..0)
    idx = 250 - 2
    coeffs = jax.tree.map(lambda a: a[idx], plan)
    assert int(coeffs.t) == 1
    out = ddpm_step(coeffs, xt, noise, jnp.zeros_like(xt), clip_range=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-2, atol=2e-3)


def test_plan_variance_and_last_step():
    plan = make_ddpm_plan(num_steps=250)
    assert int(plan.t[0]) == 249 and int(plan.t[-1]) == 0
    # sigma at t=0 must be 0 (no noise at last step)
    assert float(plan.sigma[-1]) == 0.0
    # fixed_small variance at t: (1-acp_prev)/(1-acp_t)*beta_t
    tables = make_ddpm_tables()
    acp = np.asarray(tables.alphas_cumprod)
    betas = np.asarray(tables.betas)
    t = 100
    idx = 249 - t
    expected = np.sqrt((1 - acp[t - 1]) / (1 - acp[t]) * betas[t])
    np.testing.assert_allclose(float(plan.sigma[idx]), expected, rtol=1e-5)


def test_clip_applied():
    plan = make_ddpm_plan(num_steps=250)
    coeffs = jax.tree.map(lambda a: a[0], plan)  # t=249
    x = jnp.full((1, 4), 50.0)
    eps = jnp.zeros((1, 4))
    out_clipped = ddpm_step(coeffs, x, eps, jnp.zeros_like(x), clip_range=3.0)
    out_raw = ddpm_step(coeffs, x, eps, jnp.zeros_like(x), clip_range=None)
    assert float(jnp.max(jnp.abs(out_clipped))) < float(jnp.max(jnp.abs(out_raw)))


def test_scan_matches_python_loop():
    """The lax.scan pipeline must match a step-by-step python loop exactly."""
    plan = make_ddpm_plan(num_steps=20)
    # trim plan to the last 20 timesteps (t=19..0)

    def model_fn(x, t):
        # deterministic pseudo-model: eps depends on x and t
        return 0.1 * x + 0.01 * t.astype(jnp.float32)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 6))

    got = ddpm_scan(model_fn, x0, plan, key, clip_range=3.0)

    # python reference loop with the same keys
    keys = jax.random.split(key, 20)
    x = x0
    for s in range(20):
        coeffs = jax.tree.map(lambda a: a[s], plan)
        eps = model_fn(x, coeffs.t)
        noise = jax.random.normal(keys[s], x.shape, dtype=x.dtype)
        x = ddpm_step(coeffs, x, eps, noise, clip_range=3.0)

    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-6, atol=1e-6)

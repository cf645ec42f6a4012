"""DDIM fast-sampling tests: golden math, denoising property, cascade mode."""

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.diffusion import add_noise, ddim_scan, make_ddim_plan, make_ddpm_tables


def test_ddim_plan_structure():
    plan = make_ddim_plan(50)
    ts = np.asarray(plan.t)
    assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50
    # eta=0 -> deterministic
    assert float(np.abs(np.asarray(plan.sigma)).max()) == 0.0
    # golden: coefficient identity sqrt_acp_prev^2 + dir^2 = 1 - 0 at... check
    acp_prev = np.asarray(plan.sqrt_acp_prev) ** 2
    direction = np.asarray(plan.dir_coeff) ** 2
    np.testing.assert_allclose(acp_prev + direction, 1.0, atol=1e-6)


def test_ddim_recovers_x0_with_true_eps():
    tables = make_ddpm_tables()
    x0 = jnp.ones((2, 8)) * 0.7
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    xT = add_noise(tables, x0, noise, jnp.asarray([999, 999]))
    acp = tables.alphas_cumprod

    def eps_fn(x, t):
        a = acp[t]
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    out = ddim_scan(eps_fn, xT, make_ddim_plan(50))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=2e-2)
    # even 10 steps lands close (DDIM's ODE property)
    out10 = ddim_scan(eps_fn, xT, make_ddim_plan(10))
    np.testing.assert_allclose(np.asarray(out10), np.asarray(x0), atol=5e-2)


def test_cascade_fast_mode():
    from tests.test_sampling import _build_tiny_cascade_with

    cascade, cfg = _build_tiny_cascade_with(fast_steps=6)
    out = cascade(jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["surf_pos"])).all()
    assert np.isfinite(np.asarray(out["edge_ncs"])).all()
    ns = 2 * cfg.num_surfaces
    assert out["surf_pos"].shape == (cfg.batch_size, ns, 6)

"""Train -> sample consistency: overfit the surfPos denoiser on a single
fixed face-bbox set and verify the sampler (PNDM + DDPM handoff, the exact
schedule the cascade uses) reproduces it from pure noise.

This is the test that catches any train/sample scheduler mismatch
(add_noise vs the per-step transfer coefficients) end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.diffusion import (
    ddim_scan,
    ddpm_scan,
    make_ddim_plan,
    make_ddpm_plan,
    make_ddpm_tables,
    make_pndm_plan,
    pndm_scan,
)
from brepgen_tpu.nn import make_surfpos_net
from brepgen_tpu.train import ldm_train
from brepgen_tpu.train.common import init_state, make_ldm_optimizer

SMALL = dict(width=64, num_heads=4, ffn_width=128, num_layers=2, dropout=0.0)


def test_overfit_then_sample_recovers_target():
    # one fixed "solid": 4 face bboxes, already x3-scaled
    target = jnp.asarray(
        [
            [-1.5, -1.5, -1.5, 1.5, 1.5, -1.2],
            [-1.5, -1.5, 1.2, 1.5, 1.5, 1.5],
            [-1.5, -1.5, -1.5, -1.2, 1.5, 1.5],
            [1.2, -1.5, -1.5, 1.5, 1.5, 1.5],
        ]
    )
    B, nf = 64, 4
    batch = {"surfpos": jnp.broadcast_to(target, (B, nf, 6))}

    model = make_surfpos_net(**SMALL)
    params = model.init(jax.random.PRNGKey(0), (batch["surfpos"],), jnp.zeros((B,), jnp.int32))
    opt = make_ldm_optimizer(lr=2e-3)
    state = init_state(params, opt)
    tables = make_ddpm_tables()
    step = ldm_train.make_surfpos_step(model, opt, tables)

    losses = []
    for i in range(1500):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-20:]) < 0.25 * np.mean(losses[:20]), (
        losses[:5], losses[-5:]
    )

    # sample with the cascade's exact surfPos schedule: 158 PNDM calls of a
    # 200-step plan, then the 250-step DDPM tail with x0-clip 3
    def eps_fn(x, t):
        return model.apply(state.params, (x,), t)

    x = jax.random.normal(jax.random.PRNGKey(99), (8, nf, 6))
    x = pndm_scan(eps_fn, x, make_pndm_plan(200, max_calls=158))
    x = ddpm_scan(eps_fn, x, make_ddpm_plan(num_steps=250), jax.random.PRNGKey(100), 3.0)

    samples = np.asarray(x)
    assert np.isfinite(samples).all()
    # every sampled token should be near SOME target bbox (set matching)
    d = np.abs(samples[:, :, None, :] - np.asarray(target)[None, None]).max(-1)
    nearest = d.min(-1)  # [8, nf]
    frac_matched = float((nearest < 0.45).mean())
    assert frac_matched > 0.7, (frac_matched, nearest.mean())
    # and samples should concentrate near the target's value range
    assert abs(float(np.abs(samples).max()) - 1.5) < 0.6

    # fast mode: 50-step DDIM from the same trained model also recovers the
    # target set (validates the --fast_steps sampling path end to end)
    xf = jax.random.normal(jax.random.PRNGKey(123), (8, nf, 6))
    xf = ddim_scan(eps_fn, xf, make_ddim_plan(50), clip_range=3.0)
    df = np.abs(np.asarray(xf)[:, :, None, :] - np.asarray(target)[None, None]).max(-1)
    frac_fast = float((df.min(-1) < 0.45).mean())
    assert frac_fast > 0.6, frac_fast

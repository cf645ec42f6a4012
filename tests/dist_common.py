"""Shared fixtures for the multi-host test: deterministic batches + step."""

import jax.numpy as jnp
import numpy as np

GLOBAL_BATCH = 8
NF = 6
N_STEPS = 3


def make_global_batches():
    """Deterministic surfpos batches, identical on every process."""
    rng = np.random.default_rng(42)
    return [
        {"surfpos": rng.normal(size=(GLOBAL_BATCH, NF, 6)).astype(np.float32)}
        for _ in range(N_STEPS)
    ]


def make_step():
    """Small surfpos model + the real train step factory."""
    import jax

    from brepgen_tpu.diffusion import make_ddpm_tables
    from brepgen_tpu.nn import make_surfpos_net
    from brepgen_tpu.train import ldm_train
    from brepgen_tpu.train.common import init_state, make_ldm_optimizer

    model = make_surfpos_net(width=32, num_heads=2, ffn_width=64, num_layers=1)
    opt = make_ldm_optimizer()
    step_fn = ldm_train.make_surfpos_step(model, opt, make_ddpm_tables(), False)
    init_args = (
        jax.random.PRNGKey(0),
        (jnp.zeros((2, NF, 6)),),
        jnp.zeros((2,), jnp.int32),
    )
    return model, step_fn, init_args, opt, init_state

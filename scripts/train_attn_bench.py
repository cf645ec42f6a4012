"""Train-step throughput: XLA vs packed-Pallas attention (fwd+bwd).

Times the full edgez train step (frozen VAE encodes + transformer
forward/backward + optimizer) at the DeepCAD production shape
(bs 128, 30 faces x 20 edges = 600 tokens) for both attention backends.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.cli.build import build_denoiser, build_vae
from brepgen_tpu.diffusion import make_ddpm_tables
from brepgen_tpu.train import ldm_train
from brepgen_tpu.train.common import init_state, make_ldm_optimizer
from brepgen_tpu.train.vae_train import make_encoder_fn

B, NF, NE = 128, 30, 20
S = NF * NE


def build_batch():
    rng = np.random.default_rng(0)
    return {
        "edgepnt": jnp.asarray(rng.normal(size=(B, NF, NE, 32, 3)), jnp.float32),
        "edgepos": jnp.asarray(rng.normal(size=(B, NF, NE, 6)), jnp.float32),
        "edge_mask": jnp.zeros((B, NF, NE), bool),
        "surfpnt": jnp.asarray(rng.normal(size=(B, NF, 32, 32, 3)), jnp.float32),
        "surfpos": jnp.asarray(rng.normal(size=(B, NF, 6)), jnp.float32),
        "vertpos": jnp.asarray(rng.normal(size=(B, NF, NE, 6)), jnp.float32),
    }


def measure(attn, batch, n_steps=15):
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    model = build_denoiser("edgez", dtype=dtype, attn_impl=attn)
    streams = tuple(jnp.zeros((2, S, d)) for d in (12, 6, 6, 6, 48))
    params = model.init(key, streams, jnp.zeros((2,), jnp.int32))
    surf_vae = build_vae("surface", dtype=dtype)
    edge_vae = build_vae("edge", dtype=dtype)
    sp = surf_vae.init(key, jnp.zeros((1, 32, 32, 3)))
    ep = edge_vae.init(key, jnp.zeros((1, 32, 3)))
    opt = make_ldm_optimizer()
    step_fn = ldm_train.make_edgez_step(
        model, opt, make_ddpm_tables(), make_encoder_fn(surf_vae), sp,
        make_encoder_fn(edge_vae), ep,
    )
    state = init_state(params, opt)
    k = jax.random.PRNGKey(1)
    state, m = step_fn(state, batch, k)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(n_steps):
        k = jax.random.fold_in(k, i)
        state, m = step_fn(state, batch, k)
    jax.block_until_ready(state.params)
    assert np.isfinite(float(m["loss"]))
    return (time.perf_counter() - t0) / n_steps


def main():
    batch = build_batch()
    report = {}
    for attn in ("xla", "pallas"):
        try:
            dt = measure(attn, batch)
            report[f"edgez_bs{B}_{attn}_ms"] = round(dt * 1e3, 1)
            report[f"edgez_bs{B}_{attn}_steps_per_s"] = round(1 / dt, 2)
        except Exception as e:  # noqa: BLE001
            report[f"edgez_bs{B}_{attn}_ms"] = f"err: {str(e)[-120:]}"
        print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()

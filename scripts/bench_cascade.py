"""Time the full jitted generation cascade (production sizes, random
weights) on the current backend. Usage: python scripts/bench_cascade.py
[mode] [attn_impl]."""

import sys
import time

import jax
import jax.numpy as jnp

from brepgen_tpu.cli.build import build_denoiser, build_vae
from brepgen_tpu.sampling import CascadeConfig, build_cascade
from brepgen_tpu.train.vae_train import make_decoder_fn

mode = sys.argv[1] if len(sys.argv) > 1 else "deepcad"
attn = sys.argv[2] if len(sys.argv) > 2 else "pallas"
dtype = jnp.bfloat16

key = jax.random.PRNGKey(0)
cfg = CascadeConfig.for_mode(mode)
use_cf = cfg.use_cf

nets, params = {}, {}
B, nf, ne = 1, 4, 3
S = nf * ne
shapes = {
    "surfpos": [(B, nf, 6)],
    "surfz": [(B, nf, 48), (B, nf, 6)],
    "edgepos": [(B, S, 6), (B, S, 6), (B, S, 48)],
    "edgez": [(B, S, 12), (B, S, 6), (B, S, 6), (B, S, 6), (B, S, 48)],
}
label = jnp.zeros((B, 1), jnp.int32) if use_cf else None
for stage in shapes:
    net = build_denoiser(stage, use_cf=use_cf, dtype=dtype, attn_impl=attn)
    nets[stage] = net
    params[stage] = net.init(
        key, tuple(jnp.zeros(s) for s in shapes[stage]), jnp.zeros((B,), jnp.int32),
        None, label,
    )

surf_vae = build_vae("surface", dtype=dtype)
edge_vae = build_vae("edge", dtype=dtype)
sp = surf_vae.init(key, jnp.zeros((1, 32, 32, 3)))
ep = edge_vae.init(key, jnp.zeros((1, 32, 3)))

cascade = build_cascade(
    nets, params, make_decoder_fn(surf_vae), sp, make_decoder_fn(edge_vae), ep, cfg
)

t0 = time.time()
out = cascade(jax.random.PRNGKey(1))
jax.block_until_ready(out)
t_first = time.time() - t0
print(f"first call (compile + run): {t_first:.1f}s")

t0 = time.time()
out = cascade(jax.random.PRNGKey(2))
jax.block_until_ready(out)
t_run = time.time() - t0
bpm = cfg.batch_size / t_run * 60
print(f"steady-state cascade: {t_run:.2f}s/batch{cfg.batch_size} -> {bpm:.1f} breps/min/chip [{mode}, {attn}]")

"""Edge-VAE (production arch) training throughput at the reference batch.

The synthetic analytic family dedups to only ~30 unique edge curves
(lines/arcs normalize identically), so the real CLI cannot form 512-item
deduped batches from it; this bench draws the unique edges WITH
replacement instead -- real curves, real loss, identical step cost
(the conv step is input-independent). Reference budget: 400 epochs at
bs 512 (train_vae.sh).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.cli.build import build_vae
from brepgen_tpu.data.dedup import dedup_primitives
from brepgen_tpu.data.synthetic import make_dataset
from brepgen_tpu.train import vae_train
from brepgen_tpu.train.common import init_state, make_vae_optimizer

BS = int(os.environ.get("BREPGEN_TP_BS", 512))
STEPS = int(os.environ.get("BREPGEN_TP_STEPS", 500))

dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
edges = dedup_primitives(make_dataset(256, seed=0), "edge")
print(f"unique edges: {len(edges)} (drawn with replacement to bs {BS})",
      flush=True)

model = build_vae("edge", dtype=dtype)
key = jax.random.PRNGKey(0)
params = model.init(key, jnp.zeros((1, 32, 3)))
opt = make_vae_optimizer()
state = init_state(params, opt)
step_fn = vae_train.make_train_step(model, opt)

rng = np.random.default_rng(0)
jrng = jax.random.PRNGKey(1)
t_window = None
for step in range(STEPS):
    batch = jnp.asarray(edges[rng.integers(len(edges), size=BS)])
    jrng, sub = jax.random.split(jrng)
    state, m = step_fn(state, batch, sub)
    if step % 10 == 0:
        mse = float(m["mse"])  # host fetch bounds dispatch skew
        if step % 100 == 0:
            print(f"step {step}: mse {mse:.5f}", flush=True)
    if (step + 1) % 100 == 0:
        now = time.perf_counter()
        if t_window is not None:
            dt = (now - t_window) / 100
            print(f"step {step + 1}: {dt * 1e3:.1f} ms/step "
                  f"({1 / dt:.2f} steps/s)", flush=True)
        t_window = now
jax.block_until_ready(state.params)
print("done", flush=True)

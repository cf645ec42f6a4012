"""Save production-shape INIT VAE params as weight stubs.

The d768 training-throughput sweep (train_throughput_r4.sh) times the
latent LDM stages through the real CLI, which loads frozen VAE weights
(`ldm.py --surfvae/--edgevae`). Weight CONTENT is irrelevant to step
timing, so init templates suffice; quality runs use real VAE training.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from brepgen_tpu.cli.build import build_vae
from brepgen_tpu.train.checkpoint import save_params

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tp_r4/vae_stubs"
key = jax.random.PRNGKey(0)
surf = build_vae("surface")
edge = build_vae("edge")
save_params(out, surf.init(key, jnp.zeros((1, 32, 32, 3))), "surfvae")
save_params(out, edge.init(key, jnp.zeros((1, 32, 3))), "edgevae")
print(f"VAE stubs saved to {out}", flush=True)

"""Host input-pipeline vs device train-step throughput (VERDICT r1 item 7).

Measures, at DeepCAD production shapes:
  * host batch assembly rate (Batcher + assemble_* pure functions), with
    0/8 worker threads — batches/s;
  * device train-step rate for surfpos@bs512 and edgez@bs128 (full d768
    models, frozen VAE encodes fused into the edgez step) — steps/s;
and reports the ratio (host >= device means the device is never starved).
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
from brepgen_tpu.data.assembly import assemble_edgez, assemble_surfpos
from brepgen_tpu.data.loader import Batcher
from brepgen_tpu.data.synthetic import make_dataset
from brepgen_tpu.diffusion import make_ddpm_tables
from brepgen_tpu.train import ldm_train
from brepgen_tpu.train.common import init_state, make_ldm_optimizer
from brepgen_tpu.train.vae_train import make_encoder_fn

NF, NE = 30, 20  # deepcad training shapes (train_ldm.sh:5-6)


def host_rate(option, batch_size, workers, n_batches=8, batched=False):
    from functools import partial

    from brepgen_tpu.data import batch_assembly as BA

    ds = make_dataset(max(batch_size, 256), seed=0)
    if option == "surfpos":
        asm = partial(assemble_surfpos, max_face=NF, bbox_scaled=3.0, aug=True)
        basm = partial(BA.assemble_surfpos_batched, max_face=NF,
                       bbox_scaled=3.0, aug=True)
    else:
        asm = partial(
            assemble_edgez, max_face=NF, max_edge=NE, bbox_scaled=3.0, aug=True
        )
        basm = partial(BA.assemble_edgez_batched, max_face=NF, max_edge=NE,
                       bbox_scaled=3.0, aug=True)
    # clamp_to_cpus=False: measure the pool even on a 1-core host (the
    # production Batcher clamps it away there, and this bench documents why)
    b = Batcher(ds, asm, batch_size, num_workers=workers, drop_last=False,
                clamp_to_cpus=False,
                batch_assemble_fn=basm if batched else None)
    it = iter(b)
    next(it)  # warm (includes process-pool spawn cost)
    t0 = time.perf_counter()
    n = 0
    while n < n_batches:
        try:
            next(it)
            n += 1
        except StopIteration:
            it = iter(b)
    rate = n / (time.perf_counter() - t0)
    b.close()
    return rate


def device_rate(option, batch_size, n_steps=20, cached_latents=False):
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    tables = make_ddpm_tables()
    opt = make_ldm_optimizer()
    from brepgen_tpu.cli.build import auto_remat

    # same policy as ldm.py --remat auto: edgez@128 saves 22.8 GB of
    # activations unremat'd and OOMs the 16 GB v5e (BASELINE.md)
    model = build_denoiser(
        option, dtype=dtype,
        remat=auto_remat(option, batch_size, NF, NE),
    )

    if option == "surfpos":
        batch = {"surfpos": jnp.asarray(np.random.randn(batch_size, NF, 6), jnp.float32)}
        params = model.init(key, (batch["surfpos"],), jnp.zeros((batch_size,), jnp.int32))
        step_fn = ldm_train.make_surfpos_step(model, opt, tables, False)
    else:
        S = NF * NE
        rng = np.random.default_rng(0)
        batch = {
            "edgepnt": jnp.asarray(rng.normal(size=(batch_size, NF, NE, 32, 3)), jnp.float32),
            "edgepos": jnp.asarray(rng.normal(size=(batch_size, NF, NE, 6)), jnp.float32),
            "edge_mask": jnp.zeros((batch_size, NF, NE), bool),
            "surfpnt": jnp.asarray(rng.normal(size=(batch_size, NF, 32, 32, 3)), jnp.float32),
            "surfpos": jnp.asarray(rng.normal(size=(batch_size, NF, 6)), jnp.float32),
            "vertpos": jnp.asarray(rng.normal(size=(batch_size, NF, NE, 6)), jnp.float32),
        }
        streams = tuple(
            jnp.zeros((batch_size, S, d)) for d in (12, 6, 6, 6, 48)
        )
        params = model.init(key, streams, jnp.zeros((batch_size,), jnp.int32))
        surf_vae = build_vae("surface", dtype=dtype)
        edge_vae = build_vae("edge", dtype=dtype)
        sp = surf_vae.init(key, jnp.zeros((1, 32, 32, 3)))
        ep = edge_vae.init(key, jnp.zeros((1, 32, 3)))
        surf_enc, edge_enc = make_encoder_fn(surf_vae), make_encoder_fn(edge_vae)
        if cached_latents:
            # steady-state --cache_latents: frozen encodes hoisted off the
            # step (hot cache == precomputed latents for the fixed batch)
            from brepgen_tpu.data.latent_cache import LatentCache

            sc = LatentCache(surf_enc, sp, (32, 32, 3), 48, bucket=batch_size * NF)
            ec = LatentCache(edge_enc, ep, (32, 3), 12, bucket=batch_size * NF * NE)
            z = sc(np.asarray(batch["surfpnt"]).reshape(-1, 32, 32, 3))
            batch["surfz"] = jnp.asarray(z.reshape(batch_size, NF, 48))
            z = ec(np.asarray(batch["edgepnt"]).reshape(-1, 32, 3))
            batch["edgez"] = jnp.asarray(z.reshape(batch_size, NF, NE, 12))
            del batch["surfpnt"], batch["edgepnt"]
        step_fn = ldm_train.make_edgez_step(
            model, opt, tables, surf_enc, sp, edge_enc, ep,
        )

    state = init_state(params, opt)
    k = jax.random.PRNGKey(1)
    state, _ = step_fn(state, batch, k)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(n_steps):
        k = jax.random.fold_in(k, i)
        state, _ = step_fn(state, batch, k)
    jax.block_until_ready(state.params)
    return n_steps / (time.perf_counter() - t0)


def main():
    report = {"host_cpus": os.cpu_count()}
    if "cached_only" in sys.argv:  # just the edgez cached-latents device leg
        r = device_rate("edgez", 128, cached_latents=True)
        report["device_edgez_bs128_cached_latents_steps_per_s"] = round(r, 2)
        print(json.dumps(report), flush=True)
        return
    for option, bs in (("surfpos", 512), ("edgez", 128)):
        for workers in (0, 8):
            r = host_rate(option, bs, workers)
            report[f"host_{option}_bs{bs}_w{workers}_batches_per_s"] = round(r, 2)
        r = host_rate(option, bs, 0, batched=True)
        report[f"host_{option}_bs{bs}_batched_batches_per_s"] = round(r, 2)
        print(json.dumps(report), flush=True)
        r = device_rate(option, bs)
        report[f"device_{option}_bs{bs}_steps_per_s"] = round(r, 2)
        host = report[f"host_{option}_bs{bs}_batched_batches_per_s"]
        report[f"{option}_host_over_device"] = round(host / r, 2)
        print(json.dumps(report), flush=True)
        if option == "edgez":
            r = device_rate(option, bs, cached_latents=True)
            report[f"device_{option}_bs{bs}_cached_latents_steps_per_s"] = round(r, 2)
            print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()

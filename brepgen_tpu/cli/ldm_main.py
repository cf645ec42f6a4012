"""LDM training CLI -- flag parity with reference ``ldm.py`` + ``utils.py:176-207``."""

from __future__ import annotations

import argparse
import functools
import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.cli.build import (
    auto_remat,
    build_denoiser,
    build_vae,
    resolve_samples,
)
from brepgen_tpu.nn import EdgeVAE, SurfVAE
from brepgen_tpu.data.assembly import (
    assemble_edgepos,
    assemble_edgez,
    assemble_surfpos,
    assemble_surfz,
    filter_sample,
)
from brepgen_tpu.data.loader import Batcher
from brepgen_tpu.data.synthetic import make_dataset
from brepgen_tpu.diffusion import make_ddpm_tables
from brepgen_tpu.train import ldm_train
from brepgen_tpu.train.checkpoint import load_params, save_checkpoint, save_params
from brepgen_tpu.train.common import init_state, make_ldm_optimizer
from brepgen_tpu.train.logging import MetricsLogger
from brepgen_tpu.train.vae_train import make_encoder_fn

BATCH_KEYS = {
    "surfpos": ("surfpos",),
    "surfz": ("surfpos", "surfpnt", "surf_mask"),
    "edgepos": ("edgepos", "surfpnt", "surfpos", "surf_mask"),
    "edgez": ("edgepnt", "edgepos", "edge_mask", "surfpnt", "surfpos", "vertpos"),
}


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default="data_process/deepcad_parsed")
    p.add_argument("--list", type=str, default="data_process/deepcad_data_split_6bit.pkl")
    p.add_argument("--surfvae", type=str, default="proj_log/deepcad_surfvae/epoch_400")
    p.add_argument("--edgevae", type=str, default="proj_log/deepcad_edgevae/epoch_300")
    p.add_argument("--option", type=str,
                   choices=["surfpos", "surfz", "edgepos", "edgez"], default="surfpos")
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--train_nepoch", type=int, default=3000)
    p.add_argument("--test_nepoch", type=int, default=25)
    p.add_argument("--save_nepoch", type=int, default=50)
    p.add_argument("--max_face", type=int, default=50)
    p.add_argument("--max_edge", type=int, default=30)
    p.add_argument("--threshold", type=float, default=0.05)
    p.add_argument("--bbox_scaled", type=float, default=3.0)
    p.add_argument("--z_scaled", type=float, default=1.0)
    p.add_argument("--gpu", type=int, nargs="+", default=[0, 1])  # accepted, unused
    p.add_argument("--data_aug", action="store_true")
    p.add_argument("--cf", action="store_true")
    p.add_argument("--env", type=str, default="surface_pos")
    p.add_argument("--dir_name", type=str, default="proj_log")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--small", action="store_true", help="tiny debug architecture")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--cache_latents", action="store_true",
                   help="precompute frozen-VAE latents in a host content "
                        "cache instead of encoding in-step (SURVEY hard "
                        "part 4); requires --data_aug off since rotation "
                        "changes the grids every epoch")
    p.add_argument("--profile", type=str, default=None,
                   help="jax.profiler trace dir (captures steps 10-30 of "
                        "epoch 1; view with TensorBoard/xprof)")
    p.add_argument("--remat", choices=("auto", "on", "off", "dots"),
                   default="auto",
                   help="per-layer activation rematerialization; auto turns "
                        "it on when B x tokens would overflow HBM with "
                        "saved activations (the edge stages at reference "
                        "batch sizes); 'dots' uses selective checkpointing "
                        "(save Dense outputs, recompute elementwise + "
                        "attention) — less recompute than 'on' where the "
                        "saved dots still fit HBM")
    p.add_argument("--assembly", choices=("batched", "per_sample"),
                   default="batched",
                   help="host batch assembly: one vectorized call per batch "
                        "(default; same draws as per-sample) or the "
                        "per-sample reference path")
    p.add_argument("--dp", action="store_true",
                   help="shard the batch over all devices (data parallel)")
    p.add_argument("--resume", action="store_true",
                   help="resume from <save_dir>/latest if present")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    args.save_dir = f"{args.dir_name}/{args.env}"
    return args


def make_assemble_fn(args):
    # functools.partial of module-level functions (not lambdas): the Batcher
    # ships assemble_fn to process-pool workers, so it must be picklable
    if args.option == "surfpos":
        return functools.partial(
            assemble_surfpos, max_face=args.max_face,
            bbox_scaled=args.bbox_scaled, aug=args.data_aug,
        )
    if args.option == "surfz":
        return functools.partial(
            assemble_surfz, max_face=args.max_face,
            bbox_scaled=args.bbox_scaled, aug=args.data_aug,
        )
    if args.option == "edgepos":
        return functools.partial(
            assemble_edgepos, max_face=args.max_face, max_edge=args.max_edge,
            bbox_scaled=args.bbox_scaled, aug=args.data_aug,
        )
    return functools.partial(
        assemble_edgez, max_face=args.max_face, max_edge=args.max_edge,
        bbox_scaled=args.bbox_scaled, aug=args.data_aug,
    )


def make_batch_assemble_fn(args):
    """Vectorized whole-batch twin of ``make_assemble_fn`` (same draws per
    (sample, seed); ``data/batch_assembly.py``)."""
    if args.assembly != "batched":
        return None
    from brepgen_tpu.data import batch_assembly as BA

    if args.option == "surfpos":
        return functools.partial(
            BA.assemble_surfpos_batched, max_face=args.max_face,
            bbox_scaled=args.bbox_scaled, aug=args.data_aug,
        )
    if args.option == "surfz":
        return functools.partial(
            BA.assemble_surfz_batched, max_face=args.max_face,
            bbox_scaled=args.bbox_scaled, aug=args.data_aug,
        )
    if args.option == "edgepos":
        return functools.partial(
            BA.assemble_edgepos_batched, max_face=args.max_face,
            max_edge=args.max_edge, bbox_scaled=args.bbox_scaled,
            aug=args.data_aug,
        )
    return functools.partial(
        BA.assemble_edgez_batched, max_face=args.max_face,
        max_edge=args.max_edge, bbox_scaled=args.bbox_scaled,
        aug=args.data_aug,
    )


def _filter_path(params):
    """Pool worker: open one pkl and apply the training-set filter."""
    path, max_face, max_edge, bbox_scaled, threshold = params
    with open(path, "rb") as f:
        d = pickle.load(f)
    return filter_sample(d, max_face, max_edge, bbox_scaled, threshold)


def load_filtered_samples(args, split):
    """Returns (samples, class_labels or None); samples are dicts or paths."""
    if args.synthetic:
        n = args.synthetic if split == "train" else max(args.synthetic // 10, 2)
        ds = make_dataset(n, seed=args.seed + (0 if split == "train" else 1))
        kept = [d for d in ds if filter_sample(d, args.max_face, args.max_edge,
                                               args.bbox_scaled, args.threshold)]
        print(f"{split}: kept {len(kept)}/{len(ds)} synthetic solids")
        return kept, None

    paths, labels = resolve_samples(args.data, args.list, split)
    params = [
        (p, args.max_face, args.max_edge, args.bbox_scaled, args.threshold)
        for p in paths
    ]
    if args.num_workers > 1 and len(paths) > 256:
        # process-pool filter, like the reference (dataset.py:104-116) --
        # 161k pkl opens at DeepCAD scale are IO/CPU bound on the host
        from multiprocessing import Pool

        with Pool(args.num_workers) as pool:
            keep_flags = list(pool.imap(_filter_path, params, chunksize=64))
    else:
        keep_flags = [_filter_path(q) for q in params]
    kept, kept_labels = [], []
    for i, keep in enumerate(keep_flags):
        if keep:
            kept.append(paths[i])
            if labels is not None:
                kept_labels.append(labels[i])
    print(f"{split}: kept {len(kept)}/{len(paths)}")
    # furniture inflation x50 -- keyed on the dataset layout (labels are
    # only present for furniture), not on a size threshold: the reference's
    # `len(data)<2000` gate (dataset.py:224-226) is an implicit furniture
    # test that would silently change epoch semantics for any small dataset
    if split == "train" and labels is not None:
        kept = kept * 50
        kept_labels = kept_labels * 50
    return kept, (kept_labels if labels is not None else None)


def to_batch(args, raw, surf_cache=None, edge_cache=None):
    keys = BATCH_KEYS[args.option]
    batch = {}
    for k, v in zip(keys, raw):
        if k == "surfpnt" and surf_cache is not None:
            B, nf = v.shape[:2]
            z = surf_cache(np.asarray(v).reshape(B * nf, 32, 32, 3))
            batch["surfz"] = jnp.asarray(z.reshape(B, nf, 48))
        elif k == "edgepnt" and edge_cache is not None:
            B, nf, ne = v.shape[:3]
            z = edge_cache(np.asarray(v).reshape(B * nf * ne, 32, 3))
            batch["edgez"] = jnp.asarray(z.reshape(B, nf, ne, 12))
        else:
            batch[k] = jnp.asarray(v)
    if len(raw) > len(keys):  # trailing class labels
        batch["class_label"] = jnp.asarray(raw[len(keys)])
    return batch


def main(argv=None):
    args = get_args(argv)
    os.makedirs(args.save_dir, exist_ok=True)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    key = jax.random.PRNGKey(args.seed)

    small_kw = (dict(width=32, num_heads=2, ffn_width=64, num_layers=1)
                if args.small else {})
    if args.remat == "dots":
        remat = "dots"
    else:
        remat = (args.remat == "on" or (args.remat == "auto" and auto_remat(
            args.option, args.batch_size, args.max_face, args.max_edge)))
    model = build_denoiser(args.option, use_cf=args.cf, dtype=dtype,
                           remat=remat, **small_kw)
    tables = make_ddpm_tables()
    opt = make_ldm_optimizer()

    # frozen VAEs where needed
    surf_enc = surf_vae_params = edge_enc = edge_vae_params = None
    if args.option in ("surfz", "edgepos", "edgez"):
        surf_vae = (SurfVAE(block_out_channels=(8, 8, 8, 8), dtype=dtype)
                    if args.small else build_vae("surface", dtype=dtype))
        template = surf_vae.init(key, jnp.zeros((1, 32, 32, 3)))
        surf_vae_params = load_params(args.surfvae, template)
        surf_enc = make_encoder_fn(surf_vae)
    if args.option == "edgez":
        edge_vae = (EdgeVAE(block_out_channels=(8, 8, 8), dtype=dtype)
                    if args.small else build_vae("edge", dtype=dtype))
        template = edge_vae.init(key, jnp.zeros((1, 32, 3)))
        edge_vae_params = load_params(args.edgevae, template)
        edge_enc = make_encoder_fn(edge_vae)

    # init denoiser params with a correctly-shaped dummy batch
    nf, ne = args.max_face, args.max_edge
    B0 = 2
    label0 = jnp.zeros((B0, 1), jnp.int32) if args.cf else None
    t0 = jnp.zeros((B0,), jnp.int32)
    if args.option == "surfpos":
        params = model.init(key, (jnp.zeros((B0, nf, 6)),), t0, None, label0)
    elif args.option == "surfz":
        params = model.init(
            key, (jnp.zeros((B0, nf, 48)), jnp.zeros((B0, nf, 6))), t0, None, label0
        )
    elif args.option == "edgepos":
        S = nf * ne
        params = model.init(
            key,
            (jnp.zeros((B0, S, 6)), jnp.zeros((B0, S, 6)), jnp.zeros((B0, S, 48))),
            t0, None, label0,
        )
    else:
        S = nf * ne
        params = model.init(
            key,
            (jnp.zeros((B0, S, 12)), jnp.zeros((B0, S, 6)), jnp.zeros((B0, S, 6)),
             jnp.zeros((B0, S, 6)), jnp.zeros((B0, S, 48))),
            t0, None, label0,
        )

    state = init_state(params, opt)
    if args.resume and os.path.isdir(os.path.join(args.save_dir, "latest")):
        from brepgen_tpu.train.checkpoint import load_checkpoint

        state = load_checkpoint(os.path.join(args.save_dir, "latest"), state)
        print(f"resumed from step {int(state.step)}")

    if args.option == "surfpos":
        step_fn = ldm_train.make_surfpos_step(model, opt, tables, args.cf)
    elif args.option == "surfz":
        step_fn = ldm_train.make_surfz_step(model, opt, tables, surf_enc, surf_vae_params, args.cf)
    elif args.option == "edgepos":
        step_fn = ldm_train.make_edgepos_step(model, opt, tables, surf_enc, surf_vae_params, args.cf)
    else:
        step_fn = ldm_train.make_edgez_step(
            model, opt, tables, surf_enc, surf_vae_params, edge_enc, edge_vae_params, args.cf
        )
    val_fn = ldm_train.make_val_step(
        args.option, model, tables, surf_enc, surf_vae_params, edge_enc, edge_vae_params, args.cf
    )

    # precomputed-latent path (SURVEY hard part 4): host content cache of
    # the deterministic frozen-VAE encodes; only sound with aug off
    surf_cache = edge_cache = None
    if args.cache_latents and args.option in ("surfz", "edgepos", "edgez"):
        if args.data_aug:
            raise SystemExit(
                "--cache_latents requires --data_aug off: rotation aug "
                "changes surf_ncs/edge_ncs every epoch (dataset.py:322,499)"
            )
        from brepgen_tpu.data.latent_cache import LatentCache

        bucket = min(1024, args.batch_size * args.max_face)
        surf_cache = LatentCache(surf_enc, surf_vae_params, (32, 32, 3), 48,
                                 bucket=bucket)
        if args.option == "edgez":
            edge_cache = LatentCache(edge_enc, edge_vae_params, (32, 3), 12,
                                     bucket=bucket)
        print("latent cache enabled (frozen-VAE encodes hoisted off the step)")

    train_samples, train_labels = load_filtered_samples(args, "train")
    val_samples, val_labels = load_filtered_samples(args, "val")
    assemble = make_assemble_fn(args)
    batch_assemble = make_batch_assemble_fn(args)
    batcher = Batcher(train_samples, assemble, args.batch_size, seed=args.seed,
                      class_labels=train_labels, num_workers=args.num_workers,
                      batch_assemble_fn=batch_assemble)
    val_batcher = Batcher(val_samples, assemble, min(args.batch_size, max(len(val_samples), 1)),
                          seed=args.seed, class_labels=val_labels, drop_last=False,
                          batch_assemble_fn=batch_assemble)

    # optional data parallelism over every visible device (the TPU-native
    # replacement for the reference's nn.DataParallel, SURVEY.md section 2.3)
    mesh = None
    if args.dp and len(jax.devices()) > 1 and args.batch_size % len(jax.devices()) == 0:
        from brepgen_tpu.parallel.mesh import batch_sharding, make_mesh, replicate

        mesh = make_mesh((len(jax.devices()), 1))
        state = state._replace(
            params=replicate(state.params, mesh),
            opt_state=replicate(state.opt_state, mesh),
        )
        if surf_vae_params is not None:
            surf_vae_params = replicate(surf_vae_params, mesh)
        if edge_vae_params is not None:
            edge_vae_params = replicate(edge_vae_params, mesh)
        _batch_sharding = batch_sharding(mesh)
        print(f"data parallel over {len(jax.devices())} devices")

    logger = MetricsLogger(args.save_dir, args.env)
    jrng = jax.random.PRNGKey(args.seed + 2)
    val_steps = (10, 50, 100, 200, 500) if args.option in ("surfpos", "surfz") else (10, 50, 100)

    from brepgen_tpu.data.loader import prefetch_to_device

    step = 0
    prof_on = False
    t_window = None  # steps/s over 100-step windows (first window holds
    # the compile; the every-10-step metrics fetch bounds dispatch skew)
    for epoch in range(1, args.train_nepoch + 1):
        # background producer: host assembly + device transfer of batch
        # k+1..k+2 overlap the device compute of batch k (the reference
        # gets this from DataLoader worker processes, trainer.py:54,314)
        stream = prefetch_to_device(
            (to_batch(args, raw, surf_cache, edge_cache) for raw in batcher),
            lookahead=2,
            sharding=_batch_sharding if mesh is not None else None,
            background=True,
        )
        for batch in stream:
            if args.profile and not prof_on and step == 10:
                jax.profiler.start_trace(args.profile)
                prof_on = True
            jrng, sub = jax.random.split(jrng)
            state, m = step_fn(state, batch, sub)
            if step % 10 == 0:
                logger.log({k: float(v) for k, v in m.items()}, step)
            step += 1
            if step % 100 == 0:
                now = time.perf_counter()
                if t_window is not None:
                    dt = (now - t_window) / 100
                    print(f"step {step}: {dt * 1e3:.1f} ms/step "
                          f"({1 / dt:.2f} steps/s)", flush=True)
                t_window = now
            if prof_on and step >= 30:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                prof_on = False
        if prof_on:  # short epoch: close the trace cleanly
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            prof_on = False

        if epoch % args.test_nepoch == 0 and len(val_samples):
            metrics = {}
            for t_fixed in val_steps:
                total, count = 0.0, 0.0
                for raw in val_batcher:
                    batch = to_batch(args, raw, surf_cache, edge_cache)
                    jrng, sub = jax.random.split(jrng)
                    s, c = val_fn(state.params, batch, sub, t_fixed)
                    total += float(s)
                    count += float(c)
                metrics[f"Val-{t_fixed:03d}"] = total / max(count, 1)
            logger.log(metrics, step)
            print(f"epoch {epoch}: {metrics}")

        if epoch % args.save_nepoch == 0 or epoch == args.train_nepoch:
            save_params(args.save_dir, state.params, f"epoch_{epoch}")
            save_checkpoint(args.save_dir, state, "latest")

    return state


if __name__ == "__main__":
    main()

"""VAE training CLI -- flag parity with reference ``vae.py`` + ``utils.py:148-173``.

Extra over the reference: ``--synthetic N`` trains on the analytic fixture
dataset (no extracted data needed), and full resumable checkpoints.
"""

from __future__ import annotations

import argparse
import os
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.cli.build import build_vae, uid_to_path
from brepgen_tpu.data.assembly import assemble_edge_u, assemble_surf_uv
from brepgen_tpu.data.dedup import dedup_primitives
from brepgen_tpu.data.synthetic import make_dataset
from brepgen_tpu.train import vae_train
from brepgen_tpu.train.common import init_state, make_vae_optimizer
from brepgen_tpu.train.checkpoint import load_params, save_checkpoint, save_params
from brepgen_tpu.train.logging import MetricsLogger


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default="data_process/deepcad_parsed")
    p.add_argument("--train_list", type=str, default="data_process/deepcad_data_split_6bit_surface.pkl")
    p.add_argument("--val_list", type=str, default="data_process/deepcad_data_split_6bit.pkl")
    p.add_argument("--option", type=str, choices=["surface", "edge"], default="surface")
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--train_nepoch", type=int, default=200)
    p.add_argument("--save_nepoch", type=int, default=20)
    p.add_argument("--test_nepoch", type=int, default=10)
    p.add_argument("--data_aug", action="store_true")
    p.add_argument("--finetune", action="store_true")
    p.add_argument("--weight", type=str, default=None)
    p.add_argument("--gpu", type=int, nargs="+", default=[0])  # accepted, unused on TPU
    p.add_argument("--env", type=str, default="surface_vae")
    p.add_argument("--dir_name", type=str, default="proj_log")
    p.add_argument("--synthetic", type=int, default=0,
                   help="Train on N synthetic solids instead of extracted data")
    p.add_argument("--bf16", action="store_true", help="bf16 compute (TPU)")
    p.add_argument("--small", action="store_true", help="tiny debug architecture")
    p.add_argument("--resume", action="store_true",
                   help="resume from <save_dir>/latest if present")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    args.save_dir = f"{args.dir_name}/{args.env}"
    return args


def load_train_array(args) -> np.ndarray:
    if args.synthetic:
        ds = make_dataset(args.synthetic, seed=args.seed)
        return dedup_primitives(ds, "surface" if args.option == "surface" else "edge")
    with open(args.train_list, "rb") as f:
        return np.asarray(pickle.load(f))


def load_val_array(args) -> np.ndarray:
    if args.synthetic:
        ds = make_dataset(max(args.synthetic // 10, 2), seed=args.seed + 1)
        key = "surf_ncs" if args.option == "surface" else "edge_ncs"
        return np.concatenate([d[key] for d in ds])
    with open(args.val_list, "rb") as f:
        uids = pickle.load(f)["val"]
    key = "surf_ncs" if args.option == "surface" else "edge_ncs"
    out = []
    for uid in uids:
        with open(uid_to_path(args.data, uid), "rb") as f:
            out.append(pickle.load(f)[key])
    return np.concatenate(out)


def main(argv=None):
    args = get_args(argv)
    os.makedirs(args.save_dir, exist_ok=True)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.small:
        from brepgen_tpu.nn import EdgeVAE, SurfVAE
        model = (SurfVAE(block_out_channels=(8, 8, 8, 8), dtype=dtype)
                 if args.option == "surface"
                 else EdgeVAE(block_out_channels=(8, 8, 8), dtype=dtype))
    else:
        model = build_vae(args.option, dtype=dtype)

    train_data = load_train_array(args)
    val_data = load_val_array(args)
    print(f"train items: {len(train_data)}, val items: {len(val_data)}")

    key = jax.random.PRNGKey(args.seed)
    shape = (1, 32, 32, 3) if args.option == "surface" else (1, 32, 3)
    params = model.init(key, jnp.zeros(shape))
    if args.finetune and args.weight:
        params = load_params(args.weight, params)

    opt = make_vae_optimizer()
    state = init_state(params, opt)
    if args.resume and os.path.isdir(os.path.join(args.save_dir, "latest")):
        from brepgen_tpu.train.checkpoint import load_checkpoint

        state = load_checkpoint(os.path.join(args.save_dir, "latest"), state)
        print(f"resumed from step {int(state.step)}")
    train_step = vae_train.make_train_step(model, opt)
    eval_step = vae_train.make_eval_step(model)
    logger = MetricsLogger(args.save_dir, args.env)

    rng = np.random.default_rng(args.seed)
    jrng = jax.random.PRNGKey(args.seed + 1)
    aug_fn = assemble_surf_uv if args.option == "surface" else assemble_edge_u

    step = 0
    t_window = None  # 100-step ms/step window (first holds the compile)
    for epoch in range(1, args.train_nepoch + 1):
        order = rng.permutation(len(train_data))
        for start in range(0, len(order) - args.batch_size + 1, args.batch_size):
            batch = train_data[order[start : start + args.batch_size]]
            if args.data_aug:
                batch = np.stack([
                    aug_fn({"surf_ncs" if args.option == "surface" else "edge_ncs": g[None]}, rng, aug=True)[0]
                    for g in batch
                ])
            jrng, sub = jax.random.split(jrng)
            state, m = train_step(state, jnp.asarray(batch), sub)
            if step % 10 == 0:
                logger.log({"Loss-mse": float(m["mse"]), "Loss-kl": float(m["kl"])}, step)
            step += 1
            if step % 100 == 0:
                now = time.perf_counter()
                if t_window is not None:
                    dt = (now - t_window) / 100
                    print(f"step {step}: {dt * 1e3:.1f} ms/step "
                          f"({1 / dt:.2f} steps/s)", flush=True)
                t_window = now

        if epoch % args.test_nepoch == 0:
            total, count = 0.0, 0
            for start in range(0, len(val_data), args.batch_size):
                vb = jnp.asarray(val_data[start : start + args.batch_size])
                jrng, sub = jax.random.split(jrng)
                total += float(eval_step(state.params, vb, sub))
                count += len(vb)
            logger.log({"Val-mse": total / max(count, 1)}, step)
            print(f"epoch {epoch}: val mse {total / max(count, 1):.6f}")

        if epoch % args.save_nepoch == 0 or epoch == args.train_nepoch:
            save_params(args.save_dir, state.params, f"epoch_{epoch}")
            save_checkpoint(args.save_dir, state, "latest")

    return state


if __name__ == "__main__":
    main()

"""End-to-end demonstration: train the full pipeline on the synthetic
analytic B-rep family, then generate, post-process, and export solids.

Medium-size models (width 256, 6 layers; VAE channels 32-128) on ~hundreds
of synthetic solids -- small enough to train in minutes on one chip, big
enough to learn the distribution and yield VALID B-reps through the whole
cascade + topology recovery + assembly. Writes STEP/STL to
``demo_out/samples`` and a JSON summary to ``demo_out/summary.json``.

Usage: python scripts/train_synthetic_demo.py [--steps N] [--out DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.data.assembly import (
    assemble_edgepos,
    assemble_edgez,
    assemble_surfpos,
    assemble_surfz,
    filter_sample,
)
from brepgen_tpu.data.dedup import dedup_primitives
from brepgen_tpu.data.synthetic import make_dataset
from brepgen_tpu.diffusion import make_ddpm_tables
from brepgen_tpu.nn import EdgeVAE, SurfVAE, make_edgepos_net, make_edgez_net, make_surfpos_net, make_surfz_net
from brepgen_tpu.sampling import CascadeConfig, build_cascade
from brepgen_tpu.train import ldm_train, vae_train
from brepgen_tpu.train.common import init_state, make_ldm_optimizer, make_vae_optimizer
from brepgen_tpu.train.vae_train import make_decoder_fn, make_encoder_fn

P = argparse.ArgumentParser()
P.add_argument("--solids", type=int, default=400)
P.add_argument("--vae_steps", type=int, default=1500)
P.add_argument("--surfpos_steps", type=int, default=3000)
P.add_argument("--pos_steps", type=int, default=3000)
P.add_argument("--edge_steps", type=int, default=3000)
P.add_argument("--pool", type=int, default=256,
               help="pre-assembled batches per stage (removes the host "
                    "assembly bottleneck from the step loop)")
P.add_argument("--batch", type=int, default=64)
P.add_argument("--out", type=str, default="demo_out")
P.add_argument("--max_face", type=int, default=10)
P.add_argument("--max_edge", type=int, default=8)
P.add_argument("--sample_batches", type=int, default=4)
P.add_argument("--family", type=str, default="all",
               choices=["all", "cuboid", "heldout"])
P.add_argument("--cf", action="store_true",
               help="classifier-free conditioning demo (furniture-mode "
                    "parity): solid kinds cuboid/prism/cylinder are the "
                    "classes; trains with 10%% label dropout and samples "
                    "each class with CFG w=0.6")
P.add_argument("--snapshots", type=float, nargs="*", default=[],
               help="fractions of each denoiser budget to checkpoint "
                    "(validity-vs-budget curve; resample via resample_demo.py)")
P.add_argument("--resume", action="store_true",
               help="reuse per-stage checkpoints already under OUT/ckpt and "
                    "skip those stages (restart protection for the multi-"
                    "stage runs; the host RNG stream then differs from a "
                    "fresh run for the remaining stages, which only changes "
                    "which random batches they see)")
args = P.parse_args()

NF, NE = args.max_face, args.max_edge
DTYPE = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
ARCH = dict(width=256, num_heads=8, ffn_width=512, num_layers=6, dtype=DTYPE)
os.makedirs(args.out, exist_ok=True)
summary = {}
key = jax.random.PRNGKey(0)
t_start = time.time()

print("== generating synthetic dataset ==", flush=True)
CLASS_NAMES = ("cuboid", "prism", "cylinder")  # class ids 0..2; stored +1
if args.cf:
    # kind-prefixed uids carry the class (random_solid's own naming)
    from brepgen_tpu.data.synthetic import random_solid

    rng0 = np.random.default_rng(0)
    ds = [random_solid(rng0) for _ in range(args.solids)]
elif args.family == "cuboid":
    from brepgen_tpu.data.synthetic import make_cuboid

    rng0 = np.random.default_rng(0)
    ds = [make_cuboid(*rng0.uniform(0.4, 2.0, 3), uid=f"c{i}") for i in range(args.solids)]
else:
    ds = make_dataset(args.solids, seed=0, family=args.family)
ds = [d for d in ds if filter_sample(d, NF, NE, 3.0, 0.05)]
class_ids = None
if args.cf:
    def _kind(uid):
        return 0 if uid.startswith("cuboid") else (1 if uid.startswith("prism") else 2)

    class_ids = np.asarray([_kind(d["uid"]) for d in ds], np.int32)
    summary["class_counts"] = {
        CLASS_NAMES[k]: int((class_ids == k).sum()) for k in range(3)
    }
    print("class counts:", summary["class_counts"], flush=True)
print(f"{len(ds)} solids after filtering")
summary["n_solids"] = len(ds)

surf_grids = dedup_primitives(ds, "surface")
edge_grids = dedup_primitives(ds, "edge")
print(f"unique surfaces: {len(surf_grids)}, unique edges: {len(edge_grids)}")

rng = np.random.default_rng(0)


def train_vae(model, grids, steps, name):
    params = model.init(key, jnp.zeros((1,) + grids.shape[1:]))
    opt = make_vae_optimizer()
    state = init_state(params, opt)
    step_fn = vae_train.make_train_step(model, opt)
    bs = min(args.batch * 2, len(grids))
    last = None
    for i in range(steps):
        idx = rng.integers(0, len(grids), bs)
        state, m = step_fn(state, jnp.asarray(grids[idx]), jax.random.PRNGKey(i))
        if i % 200 == 0 or i == steps - 1:
            last = float(m["mse"])
            print(f"[{name}] step {i}: mse {last:.5f}", flush=True)
    summary[f"{name}_final_mse"] = last
    return state.params


from brepgen_tpu.train.checkpoint import load_params, save_params

ckpt_dir = os.path.abspath(os.path.join(args.out, "ckpt"))
os.makedirs(ckpt_dir, exist_ok=True)


def maybe_resume(name):
    """Return previously-saved params for ``name`` under --resume, else None.

    orbax saves atomically (tmp dir + rename), so a directory that exists is
    a completed stage, not a torn write from a killed run.
    """
    path = os.path.join(ckpt_dir, name)
    if args.resume and os.path.isdir(path):
        print(f"[{name}] resumed from {path}", flush=True)
        summary[f"{name}_resumed"] = True
        return load_params(path)
    return None


print("== training surface VAE ==", flush=True)
surf_vae = SurfVAE(block_out_channels=(32, 64, 128, 128), dtype=DTYPE)
surf_vae_params = maybe_resume("surf_vae")
if surf_vae_params is None:
    surf_vae_params = train_vae(surf_vae, surf_grids, args.vae_steps, "surf_vae")
    save_params(ckpt_dir, surf_vae_params, "surf_vae")
print("== training edge VAE ==", flush=True)
edge_vae = EdgeVAE(block_out_channels=(32, 64, 128), dtype=DTYPE)
edge_vae_params = maybe_resume("edge_vae")
if edge_vae_params is None:
    edge_vae_params = train_vae(edge_vae, edge_grids, args.vae_steps, "edge_vae")
    save_params(ckpt_dir, edge_vae_params, "edge_vae")

surf_enc = make_encoder_fn(surf_vae)
edge_enc = make_encoder_fn(edge_vae)
tables = make_ddpm_tables()


def make_batch(stage, bs):
    idx = rng.integers(0, len(ds), bs)
    label = (
        {"class_label": jnp.asarray(class_ids[idx] + 1)[:, None]}
        if args.cf else {}
    )
    if stage == "surfpos":
        return {"surfpos": jnp.asarray(np.stack([
            assemble_surfpos(ds[i], rng, NF) for i in idx])), **label}
    if stage == "surfz":
        items = [assemble_surfz(ds[i], rng, NF) for i in idx]
        return {"surfpos": jnp.asarray(np.stack([x[0] for x in items])),
                "surfpnt": jnp.asarray(np.stack([x[1] for x in items])),
                "surf_mask": jnp.asarray(np.stack([x[2] for x in items])), **label}
    if stage == "edgepos":
        items = [assemble_edgepos(ds[i], rng, NF, NE) for i in idx]
        return {"edgepos": jnp.asarray(np.stack([x[0] for x in items])),
                "surfpnt": jnp.asarray(np.stack([x[1] for x in items])),
                "surfpos": jnp.asarray(np.stack([x[2] for x in items])),
                "surf_mask": jnp.asarray(np.stack([x[3] for x in items])), **label}
    items = [assemble_edgez(ds[i], rng, NF, NE) for i in idx]
    return {"edgepnt": jnp.asarray(np.stack([x[0] for x in items])),
            "edgepos": jnp.asarray(np.stack([x[1] for x in items])),
            "edge_mask": jnp.asarray(np.stack([x[2] for x in items])),
            "surfpnt": jnp.asarray(np.stack([x[3] for x in items])),
            "surfpos": jnp.asarray(np.stack([x[4] for x in items])),
            "vertpos": jnp.asarray(np.stack([x[5] for x in items])), **label}


def make_pool(stage, n_batches):
    """Pre-assemble a pool of device-resident batches; the step loop then
    only samples pool indices (host assembly off the critical path)."""
    print(f"[{stage}] assembling {n_batches}-batch pool...", flush=True)
    return [make_batch(stage, args.batch) for _ in range(n_batches)]


def train_stage(stage, net, step_fn, steps):
    resumed = maybe_resume(stage)
    if resumed is not None:
        return resumed
    b0 = make_batch(stage, 2)
    S = NF * NE
    shapes = {
        "surfpos": [(2, NF, 6)],
        "surfz": [(2, NF, 48), (2, NF, 6)],
        "edgepos": [(2, S, 6), (2, S, 6), (2, S, 48)],
        "edgez": [(2, S, 12), (2, S, 6), (2, S, 6), (2, S, 6), (2, S, 48)],
    }[stage]
    init_label = jnp.ones((2, 1), jnp.int32) if args.cf else None
    params = net.init(key, tuple(jnp.zeros(s) for s in shapes),
                      jnp.zeros((2,), jnp.int32), None, init_label)
    opt = make_ldm_optimizer()
    state = init_state(params, opt)
    pool = make_pool(stage, args.pool)
    snap_at = {max(1, int(round(steps * f))) - 1: f for f in args.snapshots if f < 1.0}
    last = None
    t0 = time.time()
    for i in range(steps):
        batch = pool[int(rng.integers(len(pool)))]
        state, m = step_fn(state, batch, jax.random.PRNGKey(1000 + i))
        if i in snap_at:
            snapshots.setdefault(snap_at[i], {})[stage] = jax.device_get(state.params)
        if i % 1000 == 0 or i == steps - 1:
            last = float(m["loss"])
            print(f"[{stage}] step {i}: loss {last:.4f} "
                  f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)", flush=True)
    summary[f"{stage}_final_loss"] = last
    # save as soon as the stage converges: a hang in a LATER stage or in
    # sampling must not cost this stage's 40k steps (progressive saves)
    save_params(ckpt_dir, jax.device_get(state.params), stage)
    print(f"[{stage}] checkpoint saved", flush=True)
    return state.params


if args.cf:
    ARCH = dict(ARCH, use_cf=True, num_classes=4)  # 3 kinds + uncond 0
nets = {
    "surfpos": make_surfpos_net(**ARCH),
    "surfz": make_surfz_net(**ARCH),
    "edgepos": make_edgepos_net(**ARCH),
    "edgez": make_edgez_net(**ARCH),
}
opt = make_ldm_optimizer()
net_params = {}
snapshots = {}  # frac -> {stage: params} (fractional-budget checkpoints)
print("== training denoisers ==", flush=True)
net_params["surfpos"] = train_stage(
    "surfpos", nets["surfpos"],
    ldm_train.make_surfpos_step(nets["surfpos"], opt, tables, use_cf=args.cf),
    args.surfpos_steps)
net_params["surfz"] = train_stage(
    "surfz", nets["surfz"],
    ldm_train.make_surfz_step(nets["surfz"], opt, tables, surf_enc, surf_vae_params,
                              use_cf=args.cf),
    args.pos_steps)
net_params["edgepos"] = train_stage(
    "edgepos", nets["edgepos"],
    ldm_train.make_edgepos_step(nets["edgepos"], opt, tables, surf_enc, surf_vae_params,
                                use_cf=args.cf),
    args.edge_steps)
net_params["edgez"] = train_stage(
    "edgez", nets["edgez"],
    ldm_train.make_edgez_step(
        nets["edgez"], opt, tables, surf_enc, surf_vae_params, edge_enc, edge_vae_params,
        use_cf=args.cf),
    args.edge_steps)

# fractional-budget denoiser snapshots (final VAEs shared) for the
# validity-vs-training-budget curve
for frac, stages in snapshots.items():
    d = os.path.abspath(os.path.join(args.out, f"ckpt_f{frac:g}"))
    os.makedirs(d, exist_ok=True)
    save_params(d, surf_vae_params, "surf_vae")
    save_params(d, edge_vae_params, "edge_vae")
    for k, v in stages.items():
        save_params(d, v, k)
print("checkpoints saved to", ckpt_dir, flush=True)

print("== sampling ==", flush=True)
from brepgen_tpu.cli.sample_main import make_padded_decoder, process_one

surf_dec = make_padded_decoder(make_decoder_fn(surf_vae), surf_vae_params, (4, 4, 3))
edge_dec = make_padded_decoder(make_decoder_fn(edge_vae), edge_vae_params, (4, 3))

produced, attempted, recovered, nonsolid = 0, 0, 0, 0
failures = {}
recovery_rungs = {}
error_samples = []


def sample_run(cfg, save_dir, n_batches, key_base, tag, plots):
    """One cascade build + n_batches of generation + postprocess; returns
    (valid B-reps produced, per-sample dedup'd face counts)."""
    global produced, attempted, recovered, nonsolid
    cascade = build_cascade(
        nets, net_params, make_decoder_fn(surf_vae), surf_vae_params,
        make_decoder_fn(edge_vae), edge_vae_params, cfg,
    )
    os.makedirs(save_dir, exist_ok=True)
    counts, run_prod = [], 0
    for bi in range(n_batches):
        out = cascade(jax.random.PRNGKey(key_base + bi))
        sample_np = {k: np.asarray(v) for k, v in out.items()}
        counts += list((~sample_np["surf_mask"]).sum(1))
        if bi == 0 and plots:
            from brepgen_tpu.sampling.dedup import dedup_bboxes

            loose = np.asarray(dedup_bboxes(
                jnp.asarray(sample_np["surf_pos"] * 3.0), 0.3))
            summary["valid_face_counts_loose_thr"] = [int(c) for c in loose.sum(1)]
            from brepgen_tpu.utils.viz import plot_sample

            for b in range(min(4, cfg.batch_size)):
                plot_sample(sample_np, b, os.path.join(args.out, f"gen_bbox{tag}_{b}.png"))
        for b in range(cfg.batch_size):
            attempted += 1
            name, err = process_one(
                sample_np, b, surf_dec, edge_dec, cfg.z_threshold, save_dir,
                True)  # recovery on; strict-vs-recovered split in summary
            if name is not None:
                produced += 1
                run_prod += 1
                if err and "nonsolid" in err:  # GEOMETRIC_SET fallback
                    nonsolid += 1
                if err and err.startswith("recovered"):
                    recovered += 1
                    rung_key = err.split(";")[0]
                    recovery_rungs[rung_key] = (
                        recovery_rungs.get(rung_key, 0) + 1)
            else:
                k_ = err.split(":")[0]
                failures[k_] = failures.get(k_, 0) + 1
                if len(error_samples) < 8:
                    error_samples.append(err[:200])
    return run_prod, counts


if args.cf:
    # CFG conditioning demo: one cascade per class (class_label is a
    # compile-time constant per stage program), per-class validity and
    # dedup'd-face-count histograms as conditioning-fidelity evidence
    # (cuboids -> 6 faces, prisms -> 5..9, cylinders -> 4)
    per_class = {}
    for cls_id, cls in enumerate(CLASS_NAMES, start=1):
        cfg = CascadeConfig(batch_size=16, num_surfaces=NF, num_edges=NE,
                            use_cf=True, class_label=cls_id)
        run_prod, counts = sample_run(
            cfg, os.path.join(args.out, "samples", cls),
            args.sample_batches, 5000 + 100 * cls_id, f"_{cls}",
            plots=(cls_id == 1))
        per_class[cls] = {
            "attempted": 16 * args.sample_batches,
            "valid_breps": run_prod,
            "face_counts": [int(c) for c in counts[:32]],
        }
        print(f"[{cls}] {run_prod}/{16 * args.sample_batches} valid, "
              f"face counts {per_class[cls]['face_counts'][:16]}", flush=True)
    summary["per_class"] = per_class
    dedup_counts = [c for v in per_class.values() for c in v["face_counts"]]
else:
    cfg = CascadeConfig(batch_size=16, num_surfaces=NF, num_edges=NE)
    _, dedup_counts = sample_run(
        cfg, os.path.join(args.out, "samples"), args.sample_batches, 5000,
        "", plots=True)
summary["valid_face_counts"] = [int(c) for c in dedup_counts[:32]]
summary["error_samples"] = error_samples

summary["attempted"] = attempted
summary["valid_breps"] = produced
summary["valid_strict"] = produced - recovered
summary["valid_solid"] = produced - nonsolid
summary["recovery_rungs"] = recovery_rungs
summary["failures"] = failures
summary["wall_minutes"] = round((time.time() - t_start) / 60, 1)
print(json.dumps(summary, indent=2))
with open(os.path.join(args.out, "summary.json"), "w") as f:
    json.dump(summary, f, indent=2)

"""Re-sample from saved demo checkpoints at configurable z_threshold.

Supports the validity-scaling evidence (VERDICT r1 item 10): after
``train_synthetic_demo.py`` saved its checkpoints, sweep the edge-merge
``z_threshold`` (the reference exposes it in eval_config.yaml:10) and
batch count without retraining, reporting validity + failure taxonomy
per setting as one JSON line each.
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

from brepgen_tpu.nn import EdgeVAE, SurfVAE, make_edgepos_net, make_edgez_net, \
    make_surfpos_net, make_surfz_net
from brepgen_tpu.sampling import CascadeConfig, build_cascade
from brepgen_tpu.train.checkpoint import load_params
from brepgen_tpu.train.vae_train import make_decoder_fn

P = argparse.ArgumentParser()
P.add_argument("--ckpt", type=str, required=True, help="demo_out/ckpt dir")
P.add_argument("--out", type=str, required=True)
P.add_argument("--max_face", type=int, default=10)
P.add_argument("--max_edge", type=int, default=8)
P.add_argument("--sample_batches", type=int, default=4)
P.add_argument("--z_thresholds", type=float, nargs="+", default=[0.1, 0.2, 0.3, 0.5])
P.add_argument("--width", type=int, default=256)
P.add_argument("--recover", action="store_true",
               help="enable the edge-pairing recovery ladder; reports "
                    "strict and recovered validity separately")
P.add_argument("--dump", action="store_true",
               help="save the raw cascade output batches to OUT/batches.npz "
                    "so the host postprocess can be replayed offline (pure "
                    "numpy -- no chip, no jax) while iterating on recovery")
P.add_argument("--cf", action="store_true",
               help="checkpoints are class-conditional (use_cf); sample per "
                    "class with CFG (reference sample.py:132-134 semantics)")
P.add_argument("--classes", type=int, nargs="+", default=[1, 2, 3],
               help="class ids to sample under --cf (1=cuboid 2=prism "
                    "3=cylinder; 0=uncond)")
P.add_argument("--cfg_weights", type=float, nargs="+", default=[0.6],
               help="guidance weights to sweep under --cf (reference w=0.6)")
P.add_argument("--from_dump", type=str, default=None,
               help="skip generation: load raw cascade batches from a "
                    "batches.npz dumped by an earlier --dump run (e.g. to "
                    "re-postprocess the SAME samples strict vs recovered "
                    "without paying chip time twice)")
args = P.parse_args()

NF, NE = args.max_face, args.max_edge
DTYPE = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
kw = dict(width=args.width, num_heads=8, ffn_width=512, num_layers=6, dtype=DTYPE)
if args.cf:
    kw = dict(kw, use_cf=True, num_classes=4)  # 3 kinds + uncond 0

nets = {
    "surfpos": make_surfpos_net(**kw),
    "surfz": make_surfz_net(**kw),
    "edgepos": make_edgepos_net(**kw),
    "edgez": make_edgez_net(**kw),
}
key = jax.random.PRNGKey(0)
shapes = {
    "surfpos": [(1, 4, 6)],
    "surfz": [(1, 4, 48), (1, 4, 6)],
    "edgepos": [(1, 12, 6), (1, 12, 6), (1, 12, 48)],
    "edgez": [(1, 12, 12), (1, 12, 6), (1, 12, 6), (1, 12, 6), (1, 12, 48)],
}
init_label = jnp.ones((1, 1), jnp.int32) if args.cf else None
net_params = {}
for stage, net in nets.items():
    template = net.init(key, tuple(jnp.zeros(s) for s in shapes[stage]),
                        jnp.zeros((1,), jnp.int32), None, init_label)
    net_params[stage] = load_params(os.path.join(args.ckpt, stage), template)

surf_vae = SurfVAE(block_out_channels=(32, 64, 128, 128), dtype=DTYPE)
edge_vae = EdgeVAE(block_out_channels=(32, 64, 128), dtype=DTYPE)
sv_t = surf_vae.init(key, jnp.zeros((1, 32, 32, 3)))
ev_t = edge_vae.init(key, jnp.zeros((1, 32, 3)))
surf_vae_params = load_params(os.path.join(args.ckpt, "surf_vae"), sv_t)
edge_vae_params = load_params(os.path.join(args.ckpt, "edge_vae"), ev_t)

from brepgen_tpu.cli.sample_main import make_padded_decoder, process_one

surf_dec = make_padded_decoder(make_decoder_fn(surf_vae), surf_vae_params, (4, 4, 3))
edge_dec = make_padded_decoder(make_decoder_fn(edge_vae), edge_vae_params, (4, 3))

CLASS_NAMES = {0: "uncond", 1: "cuboid", 2: "prism", 3: "cylinder"}


def generate(cfg, key_base, dump_path=None):
    """Build one cascade + generate sample_batches of raw outputs."""
    cascade = build_cascade(
        nets, net_params, make_decoder_fn(surf_vae), surf_vae_params,
        make_decoder_fn(edge_vae), edge_vae_params, cfg,
    )
    batches = []
    for bi in range(args.sample_batches):
        out = cascade(jax.random.PRNGKey(key_base + bi))
        batches.append({k: np.asarray(v) for k, v in out.items()})
    if dump_path:
        os.makedirs(os.path.dirname(dump_path), exist_ok=True)
        np.savez_compressed(
            dump_path,
            **{f"{k}__{bi}": v for bi, b in enumerate(batches)
               for k, v in b.items()})
    return batches


def postprocess(batches, z_thr, save_dir, extra):
    os.makedirs(save_dir, exist_ok=True)
    produced, attempted, failures = 0, 0, {}
    recovered_rungs = {}
    n_nonsolid = 0
    error_samples = []
    face_counts = []
    t0 = time.time()
    for sample_np in batches:
        face_counts += [int(c) for c in (~sample_np["surf_mask"]).sum(1)]
        for b in range(sample_np["surf_mask"].shape[0]):
            attempted += 1
            name, err = process_one(sample_np, b, surf_dec, edge_dec, z_thr,
                                    save_dir, args.recover)
            if name is not None:
                produced += 1
                if err and "nonsolid" in err:  # GEOMETRIC_SET fallback
                    n_nonsolid += 1
                if err and err.startswith("recovered"):
                    rung_key = err.split(";")[0]
                    recovered_rungs[rung_key] = (
                        recovered_rungs.get(rung_key, 0) + 1)
            else:
                k_ = err.split(":")[0]
                failures[k_] = failures.get(k_, 0) + 1
                if len(error_samples) < 20:
                    error_samples.append(err[:240])
    n_rec = sum(recovered_rungs.values())
    print(json.dumps({
        **extra,
        "z_threshold": z_thr,
        "attempted": attempted,
        "valid_breps": produced,
        "valid_strict": produced - n_rec,
        "valid_solid": produced - n_nonsolid,
        "recovered": recovered_rungs,
        "validity": round(produced / attempted, 3),
        "validity_strict": round((produced - n_rec) / attempted, 3),
        "validity_solid": round((produced - n_nonsolid) / attempted, 3),
        "dedup_face_counts": face_counts[:64],
        "failures": failures,
        "error_samples": error_samples,
        "postprocess_s": round(time.time() - t0, 1),
    }), flush=True)


if args.cf:
    # per-(class, guidance weight) sampling: conditioning fidelity +
    # guidance sweep evidence (reference CFG w=0.6, sample.py:132-134)
    for w in args.cfg_weights:
        for cls in args.classes:
            cfg = CascadeConfig(batch_size=16, num_surfaces=NF, num_edges=NE,
                                use_cf=True, class_label=cls, cfg_weight=w)
            batches = generate(
                cfg, 5000 + 100 * cls + int(w * 10) * 1000,
                dump_path=(os.path.join(
                    args.out, f"w{w:g}", CLASS_NAMES[cls], "batches.npz")
                    if args.dump else None))
            for z_thr in args.z_thresholds:
                postprocess(
                    batches, z_thr,
                    os.path.join(args.out, f"w{w:g}", CLASS_NAMES[cls]),
                    {"class": CLASS_NAMES[cls], "cfg_weight": w})
else:
    # generate once, post-process per threshold (thresholds are host-side)
    if args.from_dump:
        raw = np.load(args.from_dump)
        n_b = 1 + max(int(k.rsplit("__", 1)[1]) for k in raw.files)
        batches = [
            {k.rsplit("__", 1)[0]: raw[k]
             for k in raw.files if k.endswith(f"__{bi}")}
            for bi in range(n_b)
        ]
    else:
        batches = generate(
            CascadeConfig(batch_size=16, num_surfaces=NF, num_edges=NE), 5000,
            dump_path=(os.path.join(args.out, "batches.npz")
                       if args.dump else None))
    for z_thr in args.z_thresholds:
        postprocess(batches, z_thr, os.path.join(args.out, f"z{z_thr}"), {})

"""Quality-metric protocol for synthetic demo runs (reproducible).

Turns a `train_synthetic_demo.py` output directory into the BASELINE.md
quality row: 2000-pt clouds from the run's exported STLs vs held-out
same-family solids (generated with a seed disjoint from the training
dataset's seed 0), through the corrected per-point-JSD / MMD / COV
protocol (reference ``pc_metric.py:98-192,287-351``; oracles in
``tests/test_eval.py``). Defaults to CPU so it can score a finished run
while the chip trains the next one; pass ``--device tpu`` for large
cloud sets (the 256x256x3-repeat chamfer matrix is hours on the one
host core but minutes on the chip — BASELINE.md "Eval-protocol chamfer
at scale"). Only use --device tpu when nothing else is on the chip
(CLAUDE.md one-jax-process rule).

Usage:
  python scripts/demo_metrics.py --run artifacts/demo_round3/all160k --family all
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --device must be parsed before the first jax device touch
_device = "cpu"
if "--device" in sys.argv:
    _device = sys.argv[sys.argv.index("--device") + 1]

import jax

if _device == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

P = argparse.ArgumentParser()
P.add_argument("--run", required=True, help="train_synthetic_demo.py --out dir")
P.add_argument("--family", default="all",
               choices=["all", "cuboid", "heldout"])
P.add_argument("--heldout", type=int, default=64)
P.add_argument("--heldout_seed", type=int, default=777,
               help="disjoint from the demo trainer's dataset seed 0")
P.add_argument("--times", type=int, default=3)
P.add_argument("--cls", default=None, choices=["cuboid", "prism", "cylinder"],
               help="class-conditional run: score samples/<cls> against "
                    "held-out solids of that kind only (CFG fidelity)")
P.add_argument("--vs", default=None, choices=["cuboid", "prism", "cylinder"],
               help="score --cls samples against held-out solids of a "
                    "DIFFERENT kind (cross-class MMD matrix: conditioning "
                    "works iff cross-class MMD > within-class MMD)")
P.add_argument("--samples_dir", default=None,
               help="explicit STL directory (overrides RUN/samples[/<cls>]"
                    "; e.g. a resample_demo --cf output RUN/w0.6/<cls>)")
P.add_argument("--device", default="cpu", choices=["cpu", "tpu"],
               help="tpu = score on the default (axon) backend; use for "
                    "large cloud sets when the chip is otherwise idle")
args = P.parse_args()

from brepgen_tpu.eval.pipeline import N_POINTS, run_metrics, sample_points_dir
from brepgen_tpu.geometry.ply import write_ply
from brepgen_tpu.geometry.sampling import sample_surface


def grid_triangles(grid: np.ndarray) -> np.ndarray:
    """[32, 32, 3] UV grid -> [2*31*31, 3, 3] triangles."""
    p00 = grid[:-1, :-1]
    p01 = grid[:-1, 1:]
    p10 = grid[1:, :-1]
    p11 = grid[1:, 1:]
    t1 = np.stack([p00, p10, p11], axis=2)
    t2 = np.stack([p00, p11, p01], axis=2)
    return np.concatenate([t1, t2], axis=2).reshape(-1, 3, 3)


HELD_KIND = args.vs or args.cls


def heldout_clouds(out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    if HELD_KIND is not None:
        # same parameter ranges as synthetic.random_solid, one kind only
        from brepgen_tpu.data.synthetic import (
            make_cuboid, make_cylinder, make_prism,
        )

        rng0 = np.random.default_rng(args.heldout_seed)
        ds = []
        for i in range(args.heldout):
            if HELD_KIND == "cuboid":
                ds.append(make_cuboid(*rng0.uniform(0.4, 2.0, 3), uid=f"h{i}"))
            elif HELD_KIND == "prism":
                ds.append(make_prism(int(rng0.integers(3, 8)),
                                     rng0.uniform(0.5, 1.5),
                                     rng0.uniform(0.4, 2.0), uid=f"h{i}"))
            else:
                ds.append(make_cylinder(rng0.uniform(0.5, 1.5),
                                        rng0.uniform(0.4, 2.0), uid=f"h{i}"))
    elif args.family == "cuboid":
        from brepgen_tpu.data.synthetic import make_cuboid

        rng0 = np.random.default_rng(args.heldout_seed)
        ds = [make_cuboid(*rng0.uniform(0.4, 2.0, 3), uid=f"h{i}")
              for i in range(args.heldout)]
    else:
        from brepgen_tpu.data.synthetic import make_dataset

        ds = make_dataset(args.heldout, seed=args.heldout_seed,
                          family=args.family)
    rng = np.random.default_rng(args.heldout_seed + 1)
    for i, d in enumerate(ds):
        tris = np.concatenate([grid_triangles(g) for g in d["surf_wcs"]])
        pts = sample_surface(tris, N_POINTS, rng)
        write_ply(os.path.join(out_dir, f"heldout_{i}.ply"), pts)
    return len(ds)


sub = args.cls or ""
tag = sub + (f"_vs_{args.vs}" if args.vs and args.vs != args.cls else "")
if args.samples_dir:
    # clouds live NEXT TO their STL source: a run dir scored for several
    # sample sets (e.g. the CFG guidance sweep's w0/w0.6/w1.2 per class)
    # must not share one fake_ply dir — _load_clouds reads EVERY .ply in
    # the folder, so stale clouds from another sweep leg would leak in
    fake_ply = args.samples_dir.rstrip("/") + "_fake_ply"
else:
    fake_ply = os.path.join(args.run, "fake_ply" + (f"_{sub}" if sub else ""))
real_ply = os.path.join(
    args.run, "heldout_ply" + (f"_{HELD_KIND}" if HELD_KIND else ""))
stl_dir = args.samples_dir or os.path.join(args.run, "samples", sub)
if os.path.isdir(fake_ply):
    shutil.rmtree(fake_ply)  # never score a stale/mixed cloud set
n_fake = sample_points_dir(stl_dir, fake_ply)
n_real = heldout_clouds(real_ply)
print(f"clouds: {n_fake} fake vs {n_real} held-out", flush=True)
if n_fake == 0:
    print(json.dumps({"error": "no valid samples to score"}))
    sys.exit(1)
out_txt = (
    args.samples_dir.rstrip("/") + f"_metrics{'_vs_' + args.vs if args.vs and args.vs != args.cls else ''}.txt"
    if args.samples_dir
    else os.path.join(args.run, f"metrics_results{'_' + tag if tag else ''}.txt")
)
avg = run_metrics(
    fake_ply, real_ply, n_test=n_real, multi=1, times=args.times, seed=0,
    output=out_txt,
)
avg["n_fake_clouds"] = n_fake
avg["n_heldout"] = n_real
if sub:
    avg["cls"] = sub
    avg["vs"] = HELD_KIND
print(json.dumps(avg))

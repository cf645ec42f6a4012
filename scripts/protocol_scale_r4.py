"""Run the reference eval protocol ONCE at full scale on the chip.

Reference protocol (``pc_metric.py:287-351``, ``README.md:90-94``):
10 repeats x (1000 real vs multi*1000=3000 fake), 2000-pt unit-cube
clouds, MMD-CD / COV-CD / per-point JSD, written to ``<fake>_results.txt``.

No 3000-sample trained pool can exist in this environment (zero egress),
so the FAKE pool is the demo run's valid exports inflated to 3000 clouds
by random SO(3) rotation + sigma=0.01 jitter + point resampling -- this
run measures the PIPELINE at protocol scale (chamfer slicing under the
backend's ~60 s execution kill, wall-clock), NOT quality; the quality
rows stay the honest 64-sample demo protocol (BASELINE.md caveat).
The REAL pool is 1000 held-out synthetic solids (seed disjoint from
training's seed 0).

Usage: python scripts/protocol_scale_r4.py [--run artifacts/demo_round4/all160k]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

P = argparse.ArgumentParser()
P.add_argument("--run", default="artifacts/demo_round4/all160k")
P.add_argument("--out", default=None, help="default <run>/protocol_scale")
P.add_argument("--n_fake", type=int, default=3000)
P.add_argument("--n_real", type=int, default=1000)
P.add_argument("--times", type=int, default=10)
P.add_argument("--seed", type=int, default=777)
args = P.parse_args()

from brepgen_tpu.eval.pipeline import N_POINTS, run_metrics, sample_points_dir
from brepgen_tpu.geometry.ply import read_ply, write_ply
from brepgen_tpu.geometry.sampling import sample_surface

out_root = args.out or os.path.join(args.run, "protocol_scale")
fake_dir = os.path.join(out_root, "fake_ply")
real_dir = os.path.join(out_root, "real_ply")
rng = np.random.default_rng(args.seed)


def rand_rotation(r):
    """Uniform-ish SO(3) via QR of a Gaussian (sign-fixed)."""
    q, _ = np.linalg.qr(r.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


t_prep = time.perf_counter()
# --- fake pool: demo exports inflated to n_fake clouds -----------------
src_dir = os.path.join(args.run, "fake_ply")
if not os.path.isdir(src_dir) or not os.listdir(src_dir):
    n = sample_points_dir(os.path.join(args.run, "samples"), src_dir)
    print(f"sampled {n} source clouds from {args.run}/samples", flush=True)
src = [read_ply(os.path.join(src_dir, f)) for f in sorted(os.listdir(src_dir))
       if f.endswith(".ply")]
assert src, f"no source clouds under {src_dir}"
print(f"inflating {len(src)} source clouds -> {args.n_fake}", flush=True)
os.makedirs(fake_dir, exist_ok=True)
for i in range(args.n_fake):
    pc = src[rng.integers(len(src))]
    pc = pc[rng.integers(len(pc), size=N_POINTS)]
    pc = pc @ rand_rotation(rng).T + rng.normal(scale=0.01, size=pc.shape)
    write_ply(os.path.join(fake_dir, f"fake_{i:04d}.ply"), pc.astype(np.float32))

# --- real pool: held-out synthetic solids ------------------------------
from brepgen_tpu.data.synthetic import make_dataset  # noqa: E402


def grid_triangles(grid: np.ndarray) -> np.ndarray:
    """[32, 32, 3] UV grid -> triangles (same as scripts/demo_metrics.py,
    which parses argv at import and so can't be imported)."""
    p00, p01 = grid[:-1, :-1], grid[:-1, 1:]
    p10, p11 = grid[1:, :-1], grid[1:, 1:]
    t1 = np.stack([p00, p10, p11], axis=2)
    t2 = np.stack([p00, p11, p01], axis=2)
    return np.concatenate([t1, t2], axis=2).reshape(-1, 3, 3)

os.makedirs(real_dir, exist_ok=True)
ds = make_dataset(args.n_real, seed=args.seed + 1)
for i, d in enumerate(ds):
    tris = np.concatenate([grid_triangles(g) for g in d["surf_wcs"]])
    pts = sample_surface(tris, N_POINTS, rng)
    write_ply(os.path.join(real_dir, f"real_{i:04d}.ply"), pts)
print(f"pools ready: {args.n_fake} fake / {len(ds)} real "
      f"({time.perf_counter() - t_prep:.0f}s prep)", flush=True)

# --- the protocol, timed ------------------------------------------------
t0 = time.perf_counter()
avg = run_metrics(fake_dir, real_dir, n_test=args.n_real, multi=3,
                  times=args.times, seed=args.seed)
wall_min = (time.perf_counter() - t0) / 60
print(json.dumps({
    "results_txt": fake_dir.rstrip("/") + "_results.txt",
    "repeats": args.times,
    "pool": [args.n_fake, args.n_real],
    "metric_wall_minutes": round(wall_min, 1),
    **{k: round(v, 5) for k, v in avg.items()},
}), flush=True)

"""Generate a reference-layout parsed tree at input-pipeline-drill scale.

VERDICT r4 item 8: the production input path (load pkl tree -> filter ->
batched assembly -> prefetch -> device step) had only been exercised at
1k-solid probe scale; the reference assumes 161,240 train UIDs
(``dataset.py:84-117``). This writes N synthetic solids (default 10k) in
the reference's sharded ``deepcad_parsed/<shard>/<uid>.pkl`` layout plus
the official-format split json, so the real CLIs run a full epoch at
scale with nothing synthetic-aware in the loop.

Usage: python scripts/make_drill_tree.py <root> [n_solids] [shard_size]
(imports the package, which touches jax at import time — run it inside
the serialized TPU queue, never next to a live TPU job; see CLAUDE.md.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from brepgen_tpu.data.schema import save_brep_pkl  # noqa: E402
from brepgen_tpu.data.synthetic import random_solid  # noqa: E402

root = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
shard_size = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000

parsed = os.path.join(root, "deepcad_parsed")
rng = np.random.default_rng(42)
uids = []
t0 = time.time()
for i in range(n):
    shard = f"{i // shard_size:04d}"
    os.makedirs(os.path.join(parsed, shard), exist_ok=True)
    name = f"{i:08d}"
    d = random_solid(rng, uid=name)
    save_brep_pkl(os.path.join(parsed, shard, f"{name}.pkl"), d)
    uids.append(f"{shard}/{name}")
    if (i + 1) % 2000 == 0:
        print(f"{i + 1}/{n} solids ({time.time() - t0:.0f}s)", flush=True)

n_val = max(n // 50, 2)
split = {
    "train": uids[: n - 2 * n_val],
    "validation": uids[n - 2 * n_val : n - n_val],
    "test": uids[n - n_val :],
}
with open(os.path.join(root, "train_val_test_split.json"), "w") as f:
    json.dump(split, f)

du = sum(
    os.path.getsize(os.path.join(dp, fn))
    for dp, _, fns in os.walk(parsed) for fn in fns
)
print(f"tree: {n} solids, {du / 1e9:.2f} GB, "
      f"{time.time() - t0:.0f}s host wall", flush=True)

"""Time the full jitted generation cascade (production sizes, random
weights) on the current backend, with per-stage wall-clock and optional
AOT executable caching.

Usage: python scripts/bench_cascade.py [mode] [attn_impl] [aot_cache_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from brepgen_tpu.cli.build import build_denoiser, build_vae
from brepgen_tpu.sampling import CascadeConfig, build_cascade
from brepgen_tpu.train.vae_train import make_decoder_fn

mode = sys.argv[1] if len(sys.argv) > 1 else "deepcad"
attn = sys.argv[2] if len(sys.argv) > 2 else "pallas"
aot_dir = sys.argv[3] if len(sys.argv) > 3 else None
dtype = jnp.bfloat16

key = jax.random.PRNGKey(0)
# batch-size sweep override (protocol default 16, eval_config.yaml:20);
# per-chip throughput rises while the per-eval token count keeps the MXU
# busy, so measure before assuming 16 is the right production batch
bench_bs = int(os.environ.get("BREPGEN_BENCH_BATCH", 16))
cfg = CascadeConfig.for_mode(mode, batch_size=bench_bs)
# BREPGEN_BENCH_COMPACT=K: time the END-TO-END compacted cascade with the
# edge stages forced onto a K-face bucket. Random weights dedup nothing,
# so the bucket is forced via granularity=K + a huge bbox threshold
# (every sample collapses to 1 kept face -> bucket exactly K); compute
# cost is mask-independent at fixed shapes, so this is the honest wall
# -clock of a production run whose dedup keeps <= K of the ns face slots
# (reference dedup keeps ~30-60 of 100 ABC slots, sample.py:159-183).
force_bucket = int(os.environ.get("BREPGEN_BENCH_COMPACT", "0"))
if force_bucket:
    import dataclasses

    cfg = dataclasses.replace(
        cfg, compact=True, compact_granularity=force_bucket,
        bbox_threshold=100.0,
    )
use_cf = cfg.use_cf

nets, params = {}, {}
B, nf, ne = 1, 4, 3
S = nf * ne
shapes = {
    "surfpos": [(B, nf, 6)],
    "surfz": [(B, nf, 48), (B, nf, 6)],
    "edgepos": [(B, S, 6), (B, S, 6), (B, S, 48)],
    "edgez": [(B, S, 12), (B, S, 6), (B, S, 6), (B, S, 6), (B, S, 48)],
}
label = jnp.zeros((B, 1), jnp.int32) if use_cf else None
for stage in shapes:
    net = build_denoiser(stage, use_cf=use_cf, dtype=dtype, attn_impl=attn)
    nets[stage] = net
    params[stage] = net.init(
        key, tuple(jnp.zeros(s) for s in shapes[stage]), jnp.zeros((B,), jnp.int32),
        None, label,
    )

surf_vae = build_vae("surface", dtype=dtype)
edge_vae = build_vae("edge", dtype=dtype)
sp = surf_vae.init(key, jnp.zeros((1, 32, 32, 3)))
ep = edge_vae.init(key, jnp.zeros((1, 32, 3)))

stage_times = {}
cascade = build_cascade(
    nets, params, make_decoder_fn(surf_vae), sp, make_decoder_fn(edge_vae), ep, cfg,
    aot_cache_dir=aot_dir, stage_times=stage_times,
)

if len(sys.argv) > 4:  # per-stage mode: "edgez" precompiles; "time:edgez" times
    stage = sys.argv[4]
    if stage.startswith("time:"):
        # Fetch-timed single-stage runs with fresh random inputs. On the
        # remote backend, deserialized executables do NOT block in
        # block_until_ready — only a host value fetch synchronizes — and a
        # process's device lease (~12 min) can't fit the whole ABC cascade
        # plus deserialization, so stages are timed one per process.
        import numpy as _np

        name = stage.split(":", 1)[1]
        # "time:edgepos@24" times the stage on a compacted 24-face bucket
        # (the cfg.compact production path at that kept-face count)
        ns_c = None
        if "@" in name:
            name, bucket = name.split("@", 1)
            ns_c = int(bucket)
        seed = int.from_bytes(os.urandom(4), "little")
        reps = int(sys.argv[5]) if len(sys.argv) > 5 else 2
        times = []
        for i in range(reps):
            t0 = time.time()
            out = cascade.run_stage_random(name, seed + i, ns_c=ns_c)
            # synchronize via a real host fetch of one small leaf
            leaf = jax.tree.leaves(out)[0]
            _np.asarray(jax.device_get(leaf)).ravel()[:1]
            times.append(time.time() - t0)
            print(f"{name} run {i}: {times[-1]:.2f}s", flush=True)
        print(json.dumps({"stage": name, "mode": mode, "attn": attn,
                          "ns_c": ns_c,
                          "times_s": [round(t, 2) for t in times]}), flush=True)
        sys.exit(0)
    t0 = time.time()
    cascade.precompile_stage(stage)
    print(f"precompiled {stage} in {time.time() - t0:.1f}s", flush=True)
    sys.exit(0)

# fresh entropy per process: the remote backend result-caches repeated
# (executable, inputs) pairs across processes, which fakes absurd speed
seed = int.from_bytes(os.urandom(4), "little")
print(f"run seed: {seed}", flush=True)

def fetch_sync(out):
    # block_until_ready does not synchronize AOT Compiled outputs on the
    # remote backend; fetch one element of every leaf instead
    import numpy as _np
    for leaf in jax.tree.leaves(out):
        _np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

t0 = time.time()
out = cascade(jax.random.PRNGKey(seed))
fetch_sync(out)
t_first = time.time() - t0
print(f"first call (compile/AOT-load + run): {t_first:.1f}s", flush=True)

stage_times.clear()
t0 = time.time()
out = cascade(jax.random.PRNGKey(seed + 1))
fetch_sync(out)
t_run = time.time() - t0
bpm = cfg.batch_size / t_run * 60
per_3k = 3000 / cfg.batch_size * t_run / 3600
print(json.dumps({
    "mode": mode,
    "attn": attn,
    "forced_compact_bucket": force_bucket or None,
    "batch_size": cfg.batch_size,
    "first_call_s": round(t_first, 1),
    f"steady_s_per_batch{cfg.batch_size}": round(t_run, 2),
    "breps_per_min_chip": round(bpm, 2),
    "stage_s": {k: round(v, 2) for k, v in stage_times.items()},
    "projected_3k_run_chip_hours": round(per_3k, 2),
    "projected_3k_run_v5e8_hours": round(per_3k / 8, 2),
}))

"""Project the full DeepCAD training recipe from measured d768 steps/s.

Parses the six-stage sweep log (scripts/train_throughput_r4.sh ->
artifacts/train_tp_r4.log), takes the steady 100-step ms/step window per
stage (min over post-compile windows), and projects the reference
training recipe's wall-clock (train_vae.sh: 400 VAE epochs @512;
train_ldm.sh deepcad: surfpos/surfz 3000 epochs @256, edgepos/edgez
1000 epochs @128) on one v5e chip and on a v5e-8 (DP, near-linear for
these batch sizes -- test_parallel certifies gradient equivalence).

The A100 column is a first-principles estimate in the same style as
BASELINE.md's sampling anchor (no GPU in this environment): train step
FLOPs = 3x forward (fwd + bwd ~= 2x fwd) on 2xA100 AMP at 30% effective
of 312 TF/s peak each, matching the reference's --gpu 0 1 launch
(train_ldm.sh). VAE stages are conv nets outside the denoiser FLOP
model, so they get measured steps/s + projection only, no A100 estimate.

Pure host python -- no jax import, safe to run while a TPU job is live.

Accepts MULTIPLE logs; a later log's section for the same stage REPLACES
the earlier one (so a re-measured leg supersedes a stale/truncated one).
Round-5 ADVICE fixes: surfpos projects at the reference's actual batch
512 (train_ldm.sh passes no --batch_size for surfpos; utils.py:189
defaults to 512); steady ms/step is the MEDIAN of post-compile windows
(min was best-case-biased); single-window stages are flagged
low-confidence; a non-empty "incomplete" list is loudly flagged so a
partial sweep can't be read as a full-recipe projection.
"""

import json
import math
import re
import statistics
import sys

LOGS = sys.argv[1:] or ["artifacts/train_tp_r4.log"]

N_TRAIN = 161_240  # DeepCAD train UIDs (train_val_test_split.json);
# 6-bit CAD dedup only shrinks this, so projections are upper bounds.
# Unique deduped primitives for the VAE stages are a property of the real
# dataset we cannot see here (zero egress); N below are ASSUMPTIONS,
# marked as such in the output (avg ~6 unique surfaces, ~12 unique edges
# per solid after dedup).
N_SURF_ASSUMED = 1_000_000
N_EDGE_ASSUMED = 2_000_000

# stage -> (batch, epochs, n_items, seq, stream_dims, out_dim, remat)
RECIPE = {
    "surf_vae@512": (512, 400, N_SURF_ASSUMED, None, None, None, False),
    "edge_vae@512": (512, 400, N_EDGE_ASSUMED, None, None, None, False),
    "surfpos@512": (512, 3000, N_TRAIN, 30, (6,), 6, False),
    "surfz@256": (256, 3000, N_TRAIN, 30, (48, 6), 48, False),
    "edgepos@128": (128, 1000, N_TRAIN, 600, (6, 6, 48), 6, True),
    "edgez@128": (128, 1000, N_TRAIN, 600, (12, 6, 6, 6, 48), 18, True),
}

V5E_PEAK = 197e12
A100_PEAK = 312e12
A100_EFF = 0.30
A100_GPUS = 2


def fwd_flops(batch, seq, stream_dims, out_dim, width=768, ffn=1024,
              layers=12):
    """Same nominal-matmul model as bench.py:denoiser_flops_per_eval."""
    enc = layers * (8 * width**2 + 4 * seq * width + 4 * width * ffn)
    emb = sum(2 * s * width + 2 * width**2 for s in stream_dims)
    head = 2 * width**2 + 2 * width * out_dim
    return batch * seq * (enc + emb + head)


def parse_windows(path):
    """{stage: [ms_per_step, ...]} from '=== stage ===' sections."""
    out, stage = {}, None
    pat = re.compile(r"step \d+: ([\d.]+) ms/step")
    with open(path) as f:
        for line in f:
            m = re.match(r"=== (\S+) ===", line.strip())
            if m:
                stage = m.group(1)
                out.setdefault(stage, [])
                continue
            m = pat.search(line)
            if m and stage:
                out[stage].append(float(m.group(1)))
    return out


def main():
    windows = {}
    for log in LOGS:
        for stage, w in parse_windows(log).items():
            if w:  # later logs replace earlier sections (re-measured legs)
                windows[stage] = w
    rows, total_chip_s, total_a100_s, ldm_chip_s, ldm_a100_s = [], 0, 0, 0, 0
    incomplete, low_confidence = [], []
    for stage, (bs, epochs, n, seq, streams, out_dim, remat) in RECIPE.items():
        w = windows.get(stage, [])
        if not w:
            incomplete.append(stage)
            continue
        if len(w) == 1:
            # the only window may straddle the compile; flag, don't trust
            low_confidence.append(stage)
            steady_ms = w[0]
        else:
            steady_ms = statistics.median(w[1:])
        steps_s = 1000.0 / steady_ms
        steps_total = epochs * math.ceil(n / bs)
        chip_s = steps_total * steady_ms / 1000.0
        total_chip_s += chip_s
        row = {
            "stage": stage,
            "steady_ms_per_step": round(steady_ms, 1),
            "steps_per_s": round(steps_s, 2),
            "recipe_steps": steps_total,
            "chip_hours": round(chip_s / 3600, 1),
            "v5e8_hours": round(chip_s / 3600 / 8, 1),
        }
        if seq is not None:
            # MFU convention: MODEL FLOPs (3x fwd) over wall time -- the
            # remat'd stages' recompute (a 4th fwd) is real chip work but
            # not useful model FLOPs, so it shows up as lower MFU rather
            # than inflating the numerator. The A100 estimate is also 3x:
            # 80 GB HBM needs no remat at these batch sizes.
            tf_step = 3.0 * fwd_flops(bs, seq, streams, out_dim)
            row["train_tflops_per_step"] = round(tf_step / 1e12, 2)
            row["mfu_vs_peak"] = round(tf_step / (steady_ms / 1e3) / V5E_PEAK,
                                       3)
            if remat:
                row["remat"] = True
            a100_step_s = tf_step / (A100_GPUS * A100_PEAK * A100_EFF)
            a100_s = steps_total * a100_step_s
            row["a100x2_hours_est"] = round(a100_s / 3600, 1)
            total_a100_s += a100_s
            ldm_chip_s += chip_s
            ldm_a100_s += a100_s
        rows.append(row)

    summary = {
        "logs": LOGS,
        "stages": rows,
        "incomplete": incomplete,
        "low_confidence": low_confidence,
        "ldm_recipe_chip_hours": round(ldm_chip_s / 3600, 1),
        "ldm_recipe_v5e8_hours": round(ldm_chip_s / 3600 / 8, 1),
        "ldm_recipe_a100x2_hours_est": round(ldm_a100_s / 3600, 1),
        "full_recipe_chip_hours": round(total_chip_s / 3600, 1),
        "full_recipe_v5e8_hours": round(total_chip_s / 3600 / 8, 1),
        "notes": {
            "n_train": N_TRAIN,
            "edge_vae_aug_omitted": (
                "the edge_vae@512 leg trains without --data_aug (the "
                "reference train_vae.sh uses it); its ms/step may "
                "slightly understate host cost — it is <1% of the "
                "recipe's chip time either way"),
            "vae_set_sizes_assumed": [N_SURF_ASSUMED, N_EDGE_ASSUMED],
            "a100_model": f"{A100_GPUS}xA100 AMP @ {A100_EFF:.0%} of "
                          f"{A100_PEAK/1e12:.0f} TF/s (first-principles, "
                          "same style as BASELINE.md sampling anchor)",
            "v5e8_scaling": "DP /8, near-linear assumed "
                            "(test_parallel certifies grad equivalence)",
        },
    }
    if incomplete:
        print(f"WARNING: sweep INCOMPLETE — missing stages {incomplete}; "
              "the recipe totals below omit them and must NOT be quoted "
              "as full-recipe numbers.", file=sys.stderr)
    if low_confidence:
        print(f"WARNING: single-window stages (low confidence): "
              f"{low_confidence}", file=sys.stderr)
    print(json.dumps(summary))

    # markdown table for BASELINE.md
    print("\n| stage | ms/step | steps/s | recipe steps | chip-h | "
          "v5e-8 h | TFLOP/step | MFU | 2xA100 h (est) |", file=sys.stderr)
    print("|---|---|---|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['stage']} | {r['steady_ms_per_step']} | "
              f"{r['steps_per_s']} | {r['recipe_steps']} | "
              f"{r['chip_hours']} | {r['v5e8_hours']} | "
              f"{r.get('train_tflops_per_step', '—')} | "
              f"{r.get('mfu_vs_peak', '—')} | "
              f"{r.get('a100x2_hours_est', '—')} |", file=sys.stderr)


if __name__ == "__main__":
    main()

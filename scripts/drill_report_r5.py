"""Drill verdict: sustained at-scale steps/s vs the synthetic probes.

VERDICT-r4 item 8 pass criterion: a full epoch of surfpos@512 and
edgez@128 over the reference-layout ~12k-solid pkl tree (through the real
CLIs: pkl IO -> filter -> batched assembly -> prefetch -> device step)
sustains steps/s within ~10% of the 320-step synthetic probes
(artifacts/train_tp_r4.log / train_tp_r5.log). Any gap is a host stall in
the at-scale input path.

The trainer's 100-step ms/step windows need >=200 steps to print; the
drill's epoch lengths don't guarantee that, so this reads the per-10-step
JSONL metrics log instead (train/logging.py stamps wall time per record,
and the metric fetch synchronizes the device every 10 steps). The first
window (holds the jit compile) is dropped; epoch boundaries show up as
single slow windows and are reported as stalls if > 2x the median.

Pure host python -- no jax import, safe to run while a TPU job is live.

Usage: python scripts/drill_report_r5.py <stage.jsonl> <probe_steps_s> [name]
"""

import json
import statistics
import sys


def windows(path):
    rows = [json.loads(l) for l in open(path)]
    out = []
    for a, b in zip(rows, rows[1:]):
        dsteps = b["step"] - a["step"]
        if dsteps <= 0:
            continue
        out.append((b["step"], (b["time"] - a["time"]) / dsteps))
    return out


def main():
    path, probe = sys.argv[1], float(sys.argv[2])
    name = sys.argv[3] if len(sys.argv) > 3 else path
    w = windows(path)
    if len(w) < 3:
        print(json.dumps({"stage": name, "error": f"only {len(w)} windows"}))
        return 1
    # drop the compile window (first), then characterize the rest
    body = [dt for _, dt in w[1:]]
    med = statistics.median(body)
    stalls = [
        {"at_step": s, "ms_per_step": round(dt * 1e3, 1)}
        for s, dt in w[1:]
        if dt > 2 * med
    ]
    sustained = 1.0 / med
    ratio = sustained / probe
    print(json.dumps({
        "stage": name,
        "windows": len(body),
        "sustained_steps_per_s": round(sustained, 2),
        "sustained_ms_per_step": round(med * 1e3, 1),
        "probe_steps_per_s": probe,
        "ratio_vs_probe": round(ratio, 3),
        "pass_within_10pct": ratio >= 0.9,
        "p10_ms": round(sorted(body)[max(0, len(body) // 10)] * 1e3, 1),
        "p90_ms": round(sorted(body)[(9 * len(body)) // 10] * 1e3, 1),
        "stall_windows_gt_2x_median": stalls,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

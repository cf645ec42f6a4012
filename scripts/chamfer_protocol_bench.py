"""Protocol-scale chamfer-matrix timing (eval protocol, VERDICT item 6).

One full repeat of the reference metric protocol is a [3000 x 1000]
chamfer matrix over 2000-point clouds (``pc_metric.py:45-95,327-333``).
Times the Pallas tile kernel on that exact shape with salted inputs and
host-fetch synchronization, reports seconds/repeat and the 10-repeat
projection, and sanity-checks MMD/COV finiteness from the matrix.

Usage: python scripts/chamfer_protocol_bench.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from brepgen_tpu.eval.metrics import pairwise_chamfer

N_FAKE, N_REAL, P = 3000, 1000, 2000


def main():
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    fake = rng.normal(size=(N_FAKE, P, 3)).astype(np.float32) * 0.3
    real = rng.normal(size=(N_REAL, P, 3)).astype(np.float32) * 0.3

    # warm-up: one row-slice shape (the full run reuses this compile; the
    # protocol path dispatches bounded slices, see eval/metrics.py)
    rows = int(os.environ.get("BREPGEN_CHAMFER_SLICE", 256))
    d_small = pairwise_chamfer(fake[:rows], real)
    assert np.isfinite(d_small).all()

    t0 = time.perf_counter()
    d = pairwise_chamfer(fake, real)            # host fetch = sync
    t_first = time.perf_counter() - t0

    fake2 = rng.normal(size=(N_FAKE, P, 3)).astype(np.float32) * 0.3
    t0 = time.perf_counter()
    d2 = pairwise_chamfer(fake2, real)
    t_repeat = time.perf_counter() - t0

    assert np.isfinite(d).all() and np.isfinite(d2).all()
    mmd = float(d.min(axis=0).mean())
    cov = float(len(np.unique(np.argmin(d, axis=1)))) / d.shape[1]

    report = {
        "backend": jax.default_backend(),
        "shape": f"{N_FAKE}x{N_REAL} pairs, {P} pts",
        "first_call_s": round(t_first, 2),
        "steady_repeat_s": round(t_repeat, 2),
        "ten_repeat_projection_min": round(10 * t_repeat / 60.0, 2),
        "mmd_sanity": mmd,
        "cov_sanity": cov,
    }
    out_path = sys.argv[1] if len(sys.argv) > 1 else "artifacts/chamfer_protocol.json"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

"""Generative-quality metrics: JSD, MMD-CD, COV-CD.

Protocol parity with reference ``pc_metric.py``:
  * point clouds of 2000 points, centered and scaled to the unit cube
    (``normalize_pc``, ``pc_metric.py:219-226``);
  * pairwise Chamfer = mean of squared nearest-neighbor distances in both
    directions (``distChamfer`` / CUDA kernel, ``pc_metric.py:32-42,70``);
  * MMD-CD: mean over references of the min CD from any sample;
    COV-CD: fraction of references matched as some sample's nearest
    (``compute_cov_mmd``, ``pc_metric.py:83-95``);
  * JSD over 28^3 occupancy grids (``pc_metric.py:98-170``).

The CUDA chamfer kernel is replaced by a jitted XLA program evaluated in
[sample-block x ref-block] tiles on TPU; the occupancy grid uses the
closed-form lattice index instead of a NearestNeighbors tree (the grid is
regular, so nearest cell = rounding).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def normalize_pc(points: np.ndarray) -> np.ndarray:
    points = points - points.mean(0)
    return points / np.max(np.abs(points))


@functools.partial(jax.jit, static_argnames=())
def _chamfer_block(sample: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """[s, P, 3] x [r, P, 3] -> [s, r] chamfer (sum of both mean-sq dirs)."""
    d2 = (
        jnp.sum(sample**2, -1)[:, None, :, None]
        + jnp.sum(ref**2, -1)[None, :, None, :]
        - 2.0 * jnp.einsum("spd,rqd->srpq", sample, ref, precision="highest")
    )
    dl = jnp.min(d2, axis=3).mean(axis=2)  # sample -> ref
    dr = jnp.min(d2, axis=2).mean(axis=2)  # ref -> sample
    return dl + dr


def pairwise_chamfer(
    sample_pcs: np.ndarray, ref_pcs: np.ndarray, block: int = 4,
    backend: str = "auto",
) -> np.ndarray:
    """Full [N_sample, N_ref] chamfer matrix.

    On TPU this runs the chunked-scan XLA tile (``kernels/chamfer.py:
    chamfer_matrix_scan``): bounded [tile_s x tile_r] pair dispatches, no
    [P, P] tensor ever materialized (the distance slab loop-fuses into a
    running chunk min). The Pallas tile kernel exists behind
    ``BREPGEN_CHAMFER_IMPL=pallas`` but is NOT the default: this
    backend's Mosaic compiler takes >15 min on its unrolled body
    (BASELINE.md, round 3). The XLA block path remains for CPU and as the
    golden reference. Sample rows are dispatched in bounded slices
    (``BREPGEN_CHAMFER_SLICE``, def. 256) so no single device execution
    trips remote backends that kill >60 s executions.
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    if backend == "pallas":
        import os

        from brepgen_tpu.kernels import chamfer as CK

        if os.environ.get("BREPGEN_CHAMFER_IMPL", "scan") != "pallas":
            # scan tiles are already bounded dispatches; no outer slicing
            return np.asarray(CK.chamfer_matrix_scan(sample_pcs, ref_pcs))

        S, R = len(sample_pcs), len(ref_pcs)
        rows = int(os.environ.get("BREPGEN_CHAMFER_SLICE", 256))
        if S <= rows:
            return np.asarray(CK.chamfer_matrix(sample_pcs, ref_pcs))
        pad = (-S) % rows
        sp = np.asarray(sample_pcs, np.float32)
        if pad:
            sp = np.concatenate([sp, np.zeros((pad,) + sp.shape[1:], sp.dtype)])
        out = np.empty((S, R), np.float32)
        for i in range(0, len(sp), rows):
            block_out = np.asarray(CK.chamfer_matrix(sp[i : i + rows], ref_pcs))
            take = min(rows, S - i)
            if take > 0:
                out[i : i + take] = block_out[:take]
        return out

    S, R = len(sample_pcs), len(ref_pcs)
    out = np.zeros((S, R), np.float32)
    sp = jnp.asarray(sample_pcs, jnp.float32)
    rp = jnp.asarray(ref_pcs, jnp.float32)
    for i in range(0, S, block):
        si = sp[i : i + block]
        for j in range(0, R, block):
            out[i : i + block, j : j + block] = np.asarray(
                _chamfer_block(si, rp[j : j + block])
            )
    return out


def compute_cov_mmd(sample_pcs, ref_pcs, block: int = 4) -> Dict[str, float]:
    d = pairwise_chamfer(sample_pcs, ref_pcs, block)
    mmd = float(d.min(axis=0).mean())
    matched = np.argmin(d, axis=1)
    cov = float(len(np.unique(matched))) / d.shape[1]
    return {"MMD-CD": mmd, "COV-CD": cov}


# ---------------------------------------------------------------------------
# JSD


def _occupancy_counts(pclouds: np.ndarray, resolution: int) -> np.ndarray:
    """Per-cell count of POINTS landing in the cell, summed over clouds.

    Parity: ``entropy_of_occupancy_grid``'s ``grid_counters`` return value
    (``pc_metric.py:112-148``) — every point increments its nearest grid
    cell, duplicates included — which is the variable the reference feeds to
    ``jensen_shannon_divergence`` (``pc_metric.py:98-108``).  (The reference
    also tracks a per-cloud Bernoulli activation count, but uses it only for
    the entropy value, which JSD never consumes.)  Nearest grid cell on the
    regular [-1,1] lattice is closed-form rounding; exact half-way ties
    (measure zero for real data) may differ from an NN tie-break.
    """
    spacing = 2.0 / (resolution - 1)
    grid_counters = np.zeros(resolution**3)
    for pc in pclouds:
        idx3 = np.clip(np.round((pc + 1.0) / spacing), 0, resolution - 1).astype(int)
        flat = idx3[:, 0] * resolution**2 + idx3[:, 1] * resolution + idx3[:, 2]
        np.add.at(grid_counters, flat, 1)
    return grid_counters


def _jsdiv(P: np.ndarray, Q: np.ndarray) -> float:
    P = P / P.sum()
    Q = Q / Q.sum()
    M = 0.5 * (P + Q)

    def kl(a, b):
        idx = (a > 0) & (b > 0)
        return float(np.sum(a[idx] * np.log2(a[idx] / b[idx])))

    return 0.5 * (kl(P, M) + kl(Q, M))


def jsd_between_point_cloud_sets(
    sample_pcs: np.ndarray, ref_pcs: np.ndarray, resolution: int = 28
) -> float:
    a = _occupancy_counts(sample_pcs, resolution)
    b = _occupancy_counts(ref_pcs, resolution)
    return _jsdiv(a, b)

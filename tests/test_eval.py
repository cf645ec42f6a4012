"""Metric tests: chamfer golden values, MMD/COV behavior, JSD properties."""

import numpy as np
import pytest

from brepgen_tpu.eval import (
    compute_cov_mmd,
    jsd_between_point_cloud_sets,
    normalize_pc,
    pairwise_chamfer,
)


def brute_chamfer(a, b):
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    return d2.min(1).mean() + d2.min(0).mean()


def test_pairwise_chamfer_golden():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(3, 50, 3))
    B = rng.normal(size=(5, 50, 3))
    got = pairwise_chamfer(A, B, block=2)
    want = np.array([[brute_chamfer(a, b) for b in B] for a in A])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pairwise_chamfer_pallas_row_slicing(monkeypatch):
    """The pallas branch dispatches bounded row-slices (remote backends
    kill >60 s executions); the sliced+padded assembly must reproduce the
    whole matrix exactly. The device kernel is stubbed with the brute
    reference so this runs host-only."""
    from brepgen_tpu.eval import metrics as M
    from brepgen_tpu.kernels import chamfer as CK

    rng = np.random.default_rng(7)
    A = rng.normal(size=(11, 20, 3)).astype(np.float32)  # 11 rows: ragged
    B = rng.normal(size=(4, 20, 3)).astype(np.float32)
    want = np.array([[brute_chamfer(a, b) for b in B] for a in A])

    calls = []

    def fake_matrix(sp, rp, **kw):
        calls.append(len(sp))
        return np.array([[brute_chamfer(a, b) for b in np.asarray(rp)]
                         for a in np.asarray(sp)], np.float32)

    monkeypatch.setattr(CK, "chamfer_matrix", fake_matrix)
    monkeypatch.setenv("BREPGEN_CHAMFER_IMPL", "pallas")
    monkeypatch.setenv("BREPGEN_CHAMFER_SLICE", "4")
    got = M.pairwise_chamfer(A, B, backend="pallas")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert calls == [4, 4, 4]  # 11 rows -> 3 padded slices of 4


def test_chamfer_matrix_scan_matches_brute():
    """The chunked-scan XLA tile (the TPU protocol path) vs brute force,
    with ragged tiles and padded points."""
    from brepgen_tpu.kernels.chamfer import chamfer_matrix_scan

    rng = np.random.default_rng(9)
    A = rng.normal(size=(5, 40, 3)).astype(np.float32)
    B = rng.normal(size=(7, 40, 3)).astype(np.float32)
    want = np.array([[brute_chamfer(a, b) for b in B] for a in A])
    got = chamfer_matrix_scan(A, B, tile_s=4, tile_r=4, chunk=16)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_chamfer_identity_zero():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(2, 64, 3))
    d = pairwise_chamfer(A, A, block=2)
    assert np.abs(np.diag(d)).max() < 1e-5


def test_cov_mmd_perfect_match():
    rng = np.random.default_rng(2)
    ref = rng.normal(size=(4, 32, 3))
    res = compute_cov_mmd(ref.copy(), ref, block=2)
    assert res["MMD-CD"] < 1e-6
    assert res["COV-CD"] == 1.0


def test_cov_detects_mode_collapse():
    rng = np.random.default_rng(3)
    ref = rng.normal(size=(4, 32, 3))
    collapsed = np.repeat(ref[:1], 4, axis=0)  # all samples identical
    res = compute_cov_mmd(collapsed, ref, block=2)
    assert res["COV-CD"] == 0.25  # only one ref ever matched


def test_jsd_properties():
    rng = np.random.default_rng(4)
    a = np.clip(rng.normal(scale=0.3, size=(10, 200, 3)), -1, 1)
    b = np.clip(rng.normal(scale=0.3, size=(10, 200, 3)), -1, 1)
    shifted = np.clip(a + 0.8, -1, 1)
    j_same = jsd_between_point_cloud_sets(a, b)
    j_self = jsd_between_point_cloud_sets(a, a)
    j_far = jsd_between_point_cloud_sets(a, shifted)
    assert j_self < 1e-9
    assert 0 <= j_same < j_far <= 1.0


# ---------------------------------------------------------------------------
# Transliteration oracles (reference pc_metric.py, re-expressed in numpy)


def _ref_unit_cube_grid(resolution):
    """Transliteration of ``unit_cube_grid_point_cloud`` (pc_metric.py:151-168)."""
    grid = np.ndarray((resolution, resolution, resolution, 3), np.float32)
    spacing = 1.0 / float(resolution - 1) * 2
    for i in range(resolution):
        for j in range(resolution):
            for k in range(resolution):
                grid[i, j, k, 0] = i * spacing - 0.5 * 2
                grid[i, j, k, 1] = j * spacing - 0.5 * 2
                grid[i, j, k, 2] = k * spacing - 0.5 * 2
    return grid, spacing


def _ref_entropy_of_occupancy_grid(pclouds, grid_resolution):
    """Transliteration of ``entropy_of_occupancy_grid`` (pc_metric.py:112-148).

    sklearn's NearestNeighbors is replaced by an exact brute-force argmin
    over the same grid coordinates (identical result away from exact ties).
    """
    from scipy.stats import entropy

    grid_coordinates, _ = _ref_unit_cube_grid(grid_resolution)
    grid_coordinates = grid_coordinates.reshape(-1, 3)
    grid_counters = np.zeros(len(grid_coordinates))
    grid_bernoulli_rvars = np.zeros(len(grid_coordinates))
    for pc in pclouds:
        d2 = ((pc[:, None, :] - grid_coordinates[None]) ** 2).sum(-1)
        indices = np.argmin(d2, axis=1)
        for i in indices:
            grid_counters[i] += 1
        for i in np.unique(indices):
            grid_bernoulli_rvars[i] += 1
    acc_entropy = 0.0
    n = float(len(pclouds))
    for g in grid_bernoulli_rvars:
        if g > 0:
            p = float(g) / n
            acc_entropy += entropy([p, 1.0 - p])
    return acc_entropy / len(grid_counters), grid_counters


def _ref_jensen_shannon_divergence(P, Q):
    """Transliteration of ``jensen_shannon_divergence`` (pc_metric.py:176-195)."""
    from scipy.stats import entropy

    P_ = P / np.sum(P)
    Q_ = Q / np.sum(Q)
    e1 = entropy(P_, base=2)
    e2 = entropy(Q_, base=2)
    e_sum = entropy((P_ + Q_) / 2.0, base=2)
    return e_sum - ((e1 + e2) / 2.0)


def _ref_jsd_between_point_cloud_sets(sample_pcs, ref_pcs, resolution=28):
    """Transliteration of ``jsd_between_point_cloud_sets`` (pc_metric.py:98-108)."""
    sample_grid_var = _ref_entropy_of_occupancy_grid(sample_pcs, resolution)[1]
    ref_grid_var = _ref_entropy_of_occupancy_grid(ref_pcs, resolution)[1]
    return _ref_jensen_shannon_divergence(sample_grid_var, ref_grid_var)


def _ref_compute_cov_mmd(sample_pcs, ref_pcs):
    """Transliteration of ``distChamfer``+``compute_cov_mmd`` (pc_metric.py:30-95)."""
    all_dist = np.array(
        [[brute_chamfer(s, r) for r in ref_pcs] for s in sample_pcs]
    )  # [N_sample, N_ref]
    min_idx = np.argmin(all_dist, axis=1)  # torch.min(dim=1) per sample
    min_val = np.min(all_dist, axis=0)  # torch.min(dim=0) per ref
    mmd = min_val.mean()
    cov = float(len(np.unique(min_idx))) / float(ref_pcs.shape[0])
    return {"MMD-CD": float(mmd), "COV-CD": cov}


def test_jsd_matches_reference_transliteration():
    """Repo JSD must equal the reference protocol (per-POINT grid_counters).

    Guards the round-2 parity bug: counting clouds (the Bernoulli variable)
    instead of points gives a different, non-comparable JSD.
    """
    rng = np.random.default_rng(6)
    # include duplicate points + points outside the cube (ref only warns)
    a = np.clip(rng.normal(scale=0.4, size=(6, 120, 3)), -1.05, 1.05)
    a[:, 1] = a[:, 0]  # exact duplicates: per-point counts see them twice
    b = np.clip(rng.normal(scale=0.35, size=(5, 120, 3)), -1.05, 1.05)
    got = jsd_between_point_cloud_sets(a, b)
    want = _ref_jsd_between_point_cloud_sets(a, b)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_jsd_self_nonzero_under_point_counts():
    """Per-point counts differ from per-cloud: a cloud set vs its dedup'd
    self must give JSD > 0 when duplicate points shift the distribution."""
    rng = np.random.default_rng(7)
    base = np.clip(rng.normal(scale=0.4, size=(4, 100, 3)), -1, 1)
    doubled = np.concatenate([base, base[:, :50]], axis=1)  # re-weight half
    assert jsd_between_point_cloud_sets(base, doubled[:, :100]) < 1e-12
    assert jsd_between_point_cloud_sets(base, doubled) > 0


def test_cov_mmd_matches_reference_transliteration():
    rng = np.random.default_rng(8)
    sample = rng.normal(size=(6, 40, 3))
    ref = rng.normal(size=(4, 40, 3))
    got = compute_cov_mmd(sample, ref, block=2)
    want = _ref_compute_cov_mmd(sample, ref)
    np.testing.assert_allclose(got["MMD-CD"], want["MMD-CD"], rtol=1e-5)
    assert got["COV-CD"] == want["COV-CD"]


def test_normalize_pc():
    rng = np.random.default_rng(5)
    pc = rng.normal(size=(100, 3)) * 7 + 3
    out = normalize_pc(pc)
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-9)
    assert np.isclose(np.abs(out).max(), 1.0)


def test_eval_pipeline_end_to_end(tmp_path):
    """STL dir -> PLY dir -> metrics report."""
    from brepgen_tpu.data.synthetic import make_dataset
    from brepgen_tpu.eval.pipeline import run_metrics, sample_points_dir
    from brepgen_tpu.geometry import construct_brep

    fake_dir = tmp_path / "fake_stl"
    real_dir = tmp_path / "real_stl"
    fake_dir.mkdir(), real_dir.mkdir()
    ds = make_dataset(6, seed=0)
    for i, d in enumerate(ds):
        solid = construct_brep(
            d["surf_wcs"], d["edge_wcs"], d["faceEdge_adj"], d["edgeCorner_adj"]
        )
        solid.write_stl(str((fake_dir if i % 2 else real_dir) / f"{i}.stl"))

    fake_ply, real_ply = tmp_path / "fake_ply", tmp_path / "real_ply"
    n = sample_points_dir(str(fake_dir), str(fake_ply))
    assert n == 3
    sample_points_dir(str(real_dir), str(real_ply))

    avg = run_metrics(
        str(fake_ply), str(real_ply), n_test=3, multi=1, times=2, block=2, seed=0
    )
    assert set(avg) == {"avg-MMD-CD", "avg-COV-CD", "avg-JSD"}
    assert all(np.isfinite(v) for v in avg.values())
    assert (tmp_path / "fake_ply_results.txt").exists()

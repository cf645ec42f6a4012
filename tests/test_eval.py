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

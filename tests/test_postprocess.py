"""Topology-recovery round-trip: synthetic ground truth -> cascade-format
arrays -> vertex/edge merge -> joint optimization -> geometry parity."""

import numpy as np
import pytest

from brepgen_tpu.data.pad import pad_zero
from brepgen_tpu.data.synthetic import make_cuboid, make_prism
from brepgen_tpu.postprocess.pipeline import postprocess_single
from brepgen_tpu.postprocess.vertex_merge import PostprocessError, edge2loop

MAX_EDGE = 8
BBOX_SCALED = 3.0


def cascade_arrays_from_sample(data):
    """Simulate perfect cascade outputs for one synthetic solid."""
    nf = len(data["surf_ncs"])
    faceEdge_adj = data["faceEdge_adj"]

    edge_ncs_rows, edge_pos_rows, edge_v_rows, edge_z_rows, masks = [], [], [], [], []
    for adj in faceEdge_adj:
        ncs = data["edge_ncs"][adj]
        pos = data["edge_bbox_wcs"][adj]
        corners = data["corner_wcs"][adj]
        v = []
        for c in corners:
            order = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
            v.append(c[order].flatten() * BBOX_SCALED)
        v = np.stack(v)
        # fake latent encoding the unique edge id (deterministic "VAE")
        z = np.stack([np.full(12, eid / 10.0) for eid in adj])
        ncs_p = pad_zero(ncs, MAX_EDGE)
        pos_p, mask = pad_zero(pos, MAX_EDGE, return_mask=True)
        v_p = pad_zero(v, MAX_EDGE)
        z_p = pad_zero(z, MAX_EDGE)
        edge_ncs_rows.append(ncs_p)
        edge_pos_rows.append(pos_p)
        edge_v_rows.append(v_p)
        edge_z_rows.append(z_p)
        masks.append(mask)

    surf_z = np.stack([np.full(48, f / 10.0) for f in range(nf)])
    sample = {
        "surf_mask": np.zeros((1, nf), bool),
        "surf_pos": data["surf_bbox_wcs"][None],
        "surf_z": surf_z[None],
        "edge_mask": np.stack(masks)[None],
        "edge_pos": np.stack(edge_pos_rows)[None],
        "edge_ncs": np.stack(edge_ncs_rows)[None],
        "edge_v": np.stack(edge_v_rows)[None],
        "edge_z": np.stack(edge_z_rows)[None],
    }

    def surf_decode(z):
        ids = np.round(np.asarray(z)[:, 0] * 10).astype(int)
        return data["surf_ncs"][ids]

    def edge_decode(z):
        ids = np.round(np.asarray(z)[:, 0] * 10).astype(int)
        return data["edge_ncs"][ids]

    return sample, surf_decode, edge_decode


def test_edge2loop_square():
    # 4 edges forming a square: each endpoint pairs with exactly one other
    pts = np.array(
        [
            [[0, 0, 0], [1, 0, 0]],
            [[1, 0, 0], [1, 1, 0]],
            [[1, 1, 0], [0, 1, 0]],
            [[0, 1, 0], [0, 0, 0]],
        ],
        float,
    )
    merged = edge2loop(pts)
    assert len(merged) == 4  # one merge per shared corner


@pytest.mark.parametrize("maker", [make_cuboid, lambda: make_prism(5)])
def test_topology_roundtrip(maker):
    data = maker()
    sample, surf_decode, edge_decode = cascade_arrays_from_sample(data)
    rec = postprocess_single(sample, 0, surf_decode, edge_decode)

    nf = len(data["surf_ncs"])
    ne = len(data["edge_ncs"])
    nv = len(data["corner_unique"])
    assert len(rec.surf_wcs) == nf
    assert len(rec.edge_wcs) == ne
    assert len(rec.unique_vertices) == nv

    # vertices recovered (as sets, order-free)
    true_v = np.asarray(data["corner_unique"])
    for v in rec.unique_vertices:
        assert np.min(np.linalg.norm(true_v - v, axis=1)) < 0.05

    # per-face edge counts match ground truth
    true_counts = sorted(len(a) for a in data["faceEdge_adj"])
    got_counts = sorted(len(a) for a in rec.face_edge_adj)
    assert got_counts == true_counts

    # optimized edges interpolate their assigned vertices exactly
    for e, (v0, v1) in zip(rec.edge_wcs, rec.edge_vertex_adj):
        np.testing.assert_allclose(e[0], rec.unique_vertices[v0], atol=1e-5)
        np.testing.assert_allclose(e[-1], rec.unique_vertices[v1], atol=1e-5)

    # geometry close to ground truth (identity reconstruction scenario)
    # edges were fed exact ncs so wcs should match closely
    true_edges = np.asarray(data["edge_wcs"])
    for e in rec.edge_wcs:
        d = np.abs(true_edges - e).max(axis=(1, 2))
        d_rev = np.abs(true_edges - e[::-1]).max(axis=(1, 2))
        assert min(d.min(), d_rev.min()) < 0.05

    # faces land near their ground-truth grids
    true_surfs = np.asarray(data["surf_wcs"])
    for s in rec.surf_wcs:
        err = np.abs(true_surfs - s).reshape(nf, -1).max(1).min()
        assert err < 0.2


def test_mismatched_latents_rejected():
    """If duplicated edges get very different latents, pairing must fail."""
    data = make_cuboid()
    sample, surf_decode, edge_decode = cascade_arrays_from_sample(data)
    rng = np.random.default_rng(0)
    sample["edge_z"] = rng.normal(size=sample["edge_z"].shape)  # destroy pairing
    with pytest.raises(PostprocessError):
        postprocess_single(sample, 0, surf_decode, edge_decode)


def test_scattered_masks_roundtrip():
    """The real cascade leaves valid faces/edges scattered among masked
    slots (in-place dedup); postprocess must handle non-contiguous masks."""
    data = make_cuboid()
    sample, surf_decode, edge_decode = cascade_arrays_from_sample(data)

    nf = len(data["surf_ncs"])
    ns = nf + 4  # add 4 masked face slots interleaved
    rng = np.random.default_rng(0)
    order = rng.permutation(ns)

    def scatter(arr, fill=0.0):
        out = np.full((1, ns) + arr.shape[2:], fill, arr.dtype)
        out[0, order[:nf]] = arr[0]
        return out

    scattered = {
        "surf_mask": np.ones((1, ns), bool),
        "surf_pos": scatter(sample["surf_pos"]),
        "surf_z": scatter(sample["surf_z"]),
        "edge_mask": scatter(sample["edge_mask"], fill=True),
        "edge_pos": scatter(sample["edge_pos"]),
        "edge_ncs": scatter(sample["edge_ncs"]),
        "edge_v": scatter(sample["edge_v"]),
        "edge_z": scatter(sample["edge_z"]),
    }
    scattered["surf_mask"][0, order[:nf]] = False
    # also scatter each face's edges among extra masked edge slots
    rec = postprocess_single(scattered, 0, surf_decode, edge_decode)
    assert len(rec.surf_wcs) == nf
    assert len(rec.edge_wcs) == len(data["edge_wcs"])
    assert len(rec.unique_vertices) == len(data["corner_unique"])

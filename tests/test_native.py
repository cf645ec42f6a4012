"""Native C++ geometry kernel vs numpy fallback parity tests."""

import numpy as np
import pytest

from brepgen_tpu.geometry import native_bindings as nb


requires_native = pytest.mark.skipif(
    not nb.native_available(), reason="libbrepnative.so not built"
)


@requires_native
def test_cells_inside_matches_numpy():
    rng = np.random.default_rng(0)
    # star-ish polygon in a 32x32 index space
    t = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    r = 10 + 4 * np.sin(5 * t)
    poly = np.stack([15 + r * np.cos(t), 15 + r * np.sin(t)], -1)
    want = nb._cells_inside_np([poly], 32, 32)
    got = nb.cells_inside_polygons([poly], 32, 32)
    np.testing.assert_array_equal(got, want)


@requires_native
def test_cells_inside_with_hole():
    outer = np.array([[2, 2], [2, 28], [28, 28], [28, 2]], float)
    inner = np.array([[10, 10], [10, 20], [20, 20], [20, 10]], float)
    inside = nb.cells_inside_polygons([outer, inner], 32, 32)
    assert inside[5, 5] and not inside[15, 15]  # hole carved by even-odd


@requires_native
def test_nearest_grid_index_native():
    rng = np.random.default_rng(1)
    grid = rng.normal(size=(16, 16, 3))
    pts = grid.reshape(-1, 3)[rng.integers(0, 256, 20)] + rng.normal(scale=1e-4, size=(20, 3))
    got = nb.nearest_grid_index(pts, grid)
    # compare against the numpy path
    lib, nb._lib = nb._lib, None
    tried, nb._tried = nb._tried, True
    try:
        want = nb.nearest_grid_index(pts, grid)
    finally:
        nb._lib, nb._tried = lib, tried
    np.testing.assert_array_equal(got, want)


@requires_native
def test_tessellate_cells_native():
    rng = np.random.default_rng(2)
    grid = rng.normal(size=(8, 8, 3))
    inside = rng.random((7, 7)) > 0.5
    got = nb.tessellate_cells(grid, inside)
    assert got.shape == (2 * inside.sum(), 3, 3)
    # spot check a cell
    i, j = np.argwhere(inside)[0]
    np.testing.assert_allclose(got[0][0], grid[i, j])


@requires_native
def test_sample_triangles_native():
    tris = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], float)
    pts = nb.sample_triangles(tris, 500, seed=3)
    assert pts.shape == (500, 3)
    # all inside the triangle (u+v<=1, z=0)
    assert np.all(pts[:, 2] == 0)
    assert np.all(pts[:, 0] + pts[:, 1] <= 1.0 + 1e-9)


@requires_native
def test_chamfer_native_matches_numpy():
    rng = np.random.default_rng(4)
    a, b = rng.normal(size=(40, 3)), rng.normal(size=(30, 3))
    got = nb.chamfer_one_directional(a, b)
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, d2.min(1).sum(), rtol=1e-12)

"""ctypes bindings for the native host geometry kernel (libbrepnative.so).

Auto-builds the library on first import if a toolchain is present; every
entry point has a pure-numpy fallback so the framework works without it.
Use ``native_available()`` to check which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_DIR, "libbrepnative.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.cells_inside_polygons.argtypes = [
        _f64p, _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _u8p
    ]
    lib.nearest_grid_index.argtypes = [
        _f64p, ctypes.c_int64, _f64p, ctypes.c_int64, ctypes.c_int64, _f64p
    ]
    lib.tessellate_cells.argtypes = [
        _f64p, ctypes.c_int64, ctypes.c_int64, _u8p, _f64p
    ]
    lib.tessellate_cells.restype = ctypes.c_int64
    lib.sample_triangles.argtypes = [
        _f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, _f64p
    ]
    lib.chamfer_one_directional.argtypes = [
        _f64p, ctypes.c_int64, _f64p, ctypes.c_int64
    ]
    lib.chamfer_one_directional.restype = ctypes.c_double
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def cells_inside_polygons(polys: List[np.ndarray], nu: int, nv: int) -> np.ndarray:
    """Even-odd containment of every cell center -> [nu-1, nv-1] bool."""
    lib = _load()
    if lib is None or not polys:
        return _cells_inside_np(polys, nu, nv)
    flat = np.ascontiguousarray(np.concatenate(polys), np.float64)
    sizes = np.asarray([len(p) for p in polys], np.int64)
    out = np.zeros((nu - 1) * (nv - 1), np.uint8)
    lib.cells_inside_polygons(flat, sizes, len(polys), nu, nv, out)
    return out.reshape(nu - 1, nv - 1).astype(bool)


def _cells_inside_np(polys, nu, nv):
    ci, cj = np.meshgrid(np.arange(nu - 1) + 0.5, np.arange(nv - 1) + 0.5, indexing="ij")
    inside = np.zeros(ci.shape, bool)
    for poly in polys:
        x, y = poly[:, 0], poly[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        for k in range(len(poly)):
            cond = ((y[k] > cj) != (y2[k] > cj)) & (
                ci < (x2[k] - x[k]) * (cj - y[k]) / (y2[k] - y[k] + 1e-30) + x[k]
            )
            inside ^= cond
    return inside


def nearest_grid_index(points: np.ndarray, grid: np.ndarray) -> np.ndarray:
    lib = _load()
    nu, nv, _ = grid.shape
    if lib is None:
        flat = grid.reshape(-1, 3)
        d2 = (
            np.sum(points**2, -1)[:, None]
            + np.sum(flat**2, -1)[None, :]
            - 2.0 * points @ flat.T
        )
        idx = np.argmin(d2, axis=1)
        return np.stack([idx // nv, idx % nv], -1).astype(float)
    pts = np.ascontiguousarray(points, np.float64)
    g = np.ascontiguousarray(grid, np.float64)
    out = np.zeros((len(pts), 2), np.float64)
    lib.nearest_grid_index(pts, len(pts), g, nu, nv, out)
    return out


def tessellate_cells(grid: np.ndarray, inside: np.ndarray) -> np.ndarray:
    lib = _load()
    nu, nv, _ = grid.shape
    if lib is None:
        tris = []
        for i, j in zip(*np.where(inside)):
            a, b, c, d = grid[i, j], grid[i + 1, j], grid[i + 1, j + 1], grid[i, j + 1]
            tris.append([a, b, c])
            tris.append([a, c, d])
        return np.asarray(tris).reshape(-1, 3, 3)
    g = np.ascontiguousarray(grid, np.float64)
    ins = np.ascontiguousarray(inside.astype(np.uint8))
    out = np.zeros((2 * (nu - 1) * (nv - 1), 3, 3), np.float64)
    n = lib.tessellate_cells(g, nu, nv, ins, out.reshape(-1))
    return out[:n]


def sample_triangles(tris: np.ndarray, n_points: int, seed: int = 0) -> np.ndarray:
    lib = _load()
    if lib is None:
        from brepgen_tpu.geometry.sampling import sample_surface

        return sample_surface(tris, n_points, np.random.default_rng(seed))
    t = np.ascontiguousarray(tris, np.float64)
    out = np.zeros((n_points, 3), np.float64)
    lib.sample_triangles(t.reshape(-1), len(t), n_points, seed, out)
    return out


def chamfer_one_directional(a: np.ndarray, b: np.ndarray) -> float:
    lib = _load()
    if lib is None:
        d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
        return float(d2.min(1).sum())
    aa = np.ascontiguousarray(a, np.float64)
    bb = np.ascontiguousarray(b, np.float64)
    return float(lib.chamfer_one_directional(aa, len(aa), bb, len(bb)))

"""B-rep assembly: fitted parametric geometry + trimmed tessellation.

Native counterpart of the reference's OCC pipeline (``utils.py:819-947``):
fit B-spline surfaces (degree 3) to the optimized 32x32 grids and B-spline
curves to the 32-point edges, order each face's edges into outer/inner
loops, trim the face tessellation by those loops, and export STEP (spline
geometry) + STL (trimmed mesh). When pythonocc-core is installed the OCC
backend (``occ_backend.py``) performs the full trimmed-face sew instead.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

from brepgen_tpu.geometry import step_writer
from brepgen_tpu.geometry.bspline import (
    BsplineCurve,
    BsplineSurface,
    fit_bspline_curve,
    fit_bspline_surface,
)
from brepgen_tpu.geometry.stl import write_stl
from brepgen_tpu.geometry.trimming import order_loops, trim_face_grid


class SolidMesh(NamedTuple):
    """Assembled solid: parametric geometry + per-face trimmed triangles."""

    surfaces: List[BsplineSurface]
    curves: List[BsplineCurve]
    face_triangles: List[np.ndarray]
    face_loops: List[list]

    def triangles(self) -> np.ndarray:
        return np.concatenate([t for t in self.face_triangles if len(t)], axis=0)

    def write_stl(self, path: str) -> None:
        write_stl(path, self.triangles())

    def write_step(self, path: str, name: str = "brepgen_solid") -> None:
        step_writer.write_step(path, self.surfaces, self.curves, name=name)


def construct_brep(
    surf_wcs: np.ndarray,            # [F, 32, 32, 3]
    edge_wcs: np.ndarray,            # [E, 32, 3]
    face_edge_adj: Sequence[Sequence[int]],
    edge_vertex_adj: np.ndarray,     # [E, 2]
) -> SolidMesh:
    try:
        from brepgen_tpu.geometry.occ_backend import construct_brep_occ

        return construct_brep_occ(surf_wcs, edge_wcs, face_edge_adj, edge_vertex_adj)
    except ImportError:
        pass

    surfaces = [fit_bspline_surface(g) for g in surf_wcs]
    curves = [fit_bspline_curve(c) for c in edge_wcs]

    face_tris: List[np.ndarray] = []
    face_loops: List[list] = []
    for f, grid in enumerate(surf_wcs):
        loops = order_loops(face_edge_adj[f], edge_vertex_adj)
        face_loops.append(loops)
        tris = trim_face_grid(grid, loops, edge_wcs)
        face_tris.append(tris)

    return SolidMesh(surfaces, curves, face_tris, face_loops)

"""Optional OpenCASCADE backend (pythonocc-core), mirroring the reference's
trimmed-face + sewing pipeline (``utils.py:779-947``). Imported lazily by
``construct_brep``; raises ImportError when pythonocc is unavailable so the
native path takes over.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

# These imports raise ImportError without pythonocc-core -- intended.
from OCC.Core.gp import gp_Pnt
from OCC.Core.TColgp import TColgp_Array1OfPnt, TColgp_Array2OfPnt
from OCC.Core.GeomAPI import GeomAPI_PointsToBSpline, GeomAPI_PointsToBSplineSurface
from OCC.Core.GeomAbs import GeomAbs_C2
from OCC.Core.BRepBuilderAPI import (
    BRepBuilderAPI_MakeEdge,
    BRepBuilderAPI_MakeFace,
    BRepBuilderAPI_MakeSolid,
    BRepBuilderAPI_MakeWire,
    BRepBuilderAPI_Sewing,
)
from OCC.Core.ShapeFix import ShapeFix_Edge, ShapeFix_Face, ShapeFix_Wire
from OCC.Extend.TopologyUtils import TopologyExplorer, WireExplorer

from brepgen_tpu.geometry.trimming import order_loops, outer_loop_index


def _fix_wires(face):
    exp = TopologyExplorer(face)
    for wire in exp.wires():
        fixer = ShapeFix_Wire(wire, face, 0.01)
        assert fixer.IsReady()
        fixer.Perform()


def _add_pcurves(face):
    fixer = ShapeFix_Edge()
    exp = TopologyExplorer(face)
    for wire in exp.wires():
        for edge in WireExplorer(wire).ordered_edges():
            fixer.FixAddPCurve(edge, face, False, 0.001)


def _fix_face(face):
    fixer = ShapeFix_Face(face)
    fixer.SetPrecision(0.01)
    fixer.SetMaxTolerance(0.1)
    fixer.Perform()
    fixer.FixOrientation()
    return fixer.Face()


def construct_brep_occ(surf_wcs, edge_wcs, face_edge_adj: Sequence, edge_vertex_adj):
    from brepgen_tpu.geometry.brep_build import SolidMesh  # avoid cycle

    # Fit surfaces
    occ_surfaces = []
    for points in surf_wcs:
        arr = TColgp_Array2OfPnt(1, 32, 1, 32)
        for u in range(32):
            for v in range(32):
                p = points[u, v]
                arr.SetValue(u + 1, v + 1, gp_Pnt(float(p[0]), float(p[1]), float(p[2])))
        occ_surfaces.append(
            GeomAPI_PointsToBSplineSurface(arr, 3, 8, GeomAbs_C2, 5e-2).Surface()
        )

    # Fit curves with the reference's 3-level tolerance fallback
    occ_curves = []
    for points in edge_wcs:
        arr = TColgp_Array1OfPnt(1, 32)
        for u in range(32):
            p = points[u]
            arr.SetValue(u + 1, gp_Pnt(float(p[0]), float(p[1]), float(p[2])))
        curve = None
        for tol in (5e-3, 8e-3, 5e-2):
            try:
                curve = GeomAPI_PointsToBSpline(arr, 0, 8, GeomAbs_C2, tol).Curve()
                break
            except Exception:
                continue
        occ_curves.append(curve)

    edge_list = [BRepBuilderAPI_MakeEdge(c).Edge() for c in occ_curves]

    post_faces = []
    for f, surface in enumerate(occ_surfaces):
        loops = order_loops(face_edge_adj[f], edge_vertex_adj)
        out_idx = outer_loop_index(loops, np.asarray(edge_wcs))

        def build_wire(loop):
            wb = BRepBuilderAPI_MakeWire()
            for e, _fwd in loop:
                wb.Add(edge_list[e])
            return wb.Wire()

        face_builder = BRepBuilderAPI_MakeFace(surface, build_wire(loops[out_idx]))
        for i, loop in enumerate(loops):
            if i != out_idx:
                face_builder.Add(build_wire(loop))
        face = face_builder.Shape()
        _fix_wires(face)
        _add_pcurves(face)
        _fix_wires(face)
        post_faces.append(_fix_face(face))

    sewing = BRepBuilderAPI_Sewing()
    for face in post_faces:
        sewing.Add(face)
    sewing.Perform()
    maker = BRepBuilderAPI_MakeSolid()
    maker.Add(sewing.SewedShape())
    maker.Build()
    solid = maker.Solid()

    # Wrap in SolidMesh-compatible object exposing OCC-based writers.
    class OccSolid:
        def __init__(self, solid):
            self.solid = solid

        def write_step(self, path, name="brepgen_solid"):
            from OCC.Extend.DataExchange import write_step_file

            write_step_file(self.solid, path)

        def write_stl(self, path):
            from OCC.Extend.DataExchange import write_stl_file

            write_stl_file(
                self.solid, path, linear_deflection=0.001, angular_deflection=0.5
            )

    return OccSolid(solid)

"""Native (OCC-free) STEP -> pkl extraction for B-spline B-reps.

The reference extraction (``data_process/process_brep.py:13-231``) needs
OpenCASCADE to load STEP and sample UV grids. For B-reps whose geometry is
B-spline surfaces/curves — everything this framework exports, and any
AP203/214 file in that subset — the native STEP reader plus the B-spline
evaluators cover the same pipeline end to end:

  parse topology (``step_reader``) -> sample each face's surface on a
  32x32 uniform grid over its knot domain and each edge's curve at 32
  parameters (the reference also samples the surface's FULL parametric
  domain, ``convert_utils.py:290-313``) -> adjacency from the face bounds
  -> ``build_brep_sample`` (normalization, corner merge, bboxes, schema).

Used by ``process_main`` as the extraction backend when pythonocc is not
installed.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from brepgen_tpu.data.schema import build_brep_sample
from brepgen_tpu.geometry.bspline import eval_bspline_curve, eval_bspline_surface
from brepgen_tpu.geometry.step_reader import StepBrep, load_brep

MAX_FACE = 70  # reference process_brep.py:11


def _domain(knots: np.ndarray) -> tuple:
    return float(knots[0]), float(knots[-1])


def sample_surface_grid(surface, num: int = 32) -> np.ndarray:
    """[num, num, 3] points over the surface's full parametric domain."""
    u0, u1 = _domain(surface.knots_u)
    v0, v1 = _domain(surface.knots_v)
    u = np.linspace(u0, u1, num)
    v = np.linspace(v0, v1, num)
    return eval_bspline_surface(surface, u, v)


def sample_curve_grid(curve, num: int = 32) -> np.ndarray:
    t0, t1 = _domain(curve.knots)
    return eval_bspline_curve(curve, np.linspace(t0, t1, num))


def extract_brep_sample(brep: StepBrep, uid: str, max_face: int = MAX_FACE) -> Optional[Dict]:
    """StepBrep -> schema pkl dict; None when the solid is out of scope
    (too many faces / non-manifold edges), mirroring the reference's skip
    semantics (process_brep.py:81,199-201)."""
    if not brep.faces or len(brep.faces) > max_face:
        return None

    # face -> edge ids from the bounds; edge -> faces inverted
    face_edges = []
    for face in brep.faces:
        ids = []
        for _outer, chain in face.bounds:
            ids += [ei for ei, _same in chain]
        face_edges.append(sorted(set(ids)))
    edge_faces: Dict[int, list] = {}
    for f, ids in enumerate(face_edges):
        for e in ids:
            edge_faces.setdefault(e, []).append(f)

    # keep only manifold edges (exactly 2 distinct faces), compact ids
    kept = sorted(e for e, fs in edge_faces.items() if len(set(fs)) == 2)
    if not kept:
        return None
    compact = {e: i for i, e in enumerate(kept)}

    surf_pnts = [sample_surface_grid(face.surface) for face in brep.faces]
    edge_pnts, corners = [], []
    for e in kept:
        edge = brep.edges[e]
        edge_pnts.append(sample_curve_grid(edge.curve))
        corners.append(
            np.stack([brep.vertices[edge.v_start], brep.vertices[edge.v_end]])
        )

    faceEdge_adj = [
        np.array(sorted(compact[e] for e in ids if e in compact), int)
        for ids in face_edges
    ]
    if any(len(a) == 0 for a in faceEdge_adj):
        return None
    edgeFace_adj = np.array([sorted(set(edge_faces[e])) for e in kept], int)

    return build_brep_sample(
        surf_pnts, edge_pnts, np.stack(corners), faceEdge_adj, edgeFace_adj, uid
    )


def extract_step_file(path: str, uid: Optional[str] = None) -> Optional[Dict]:
    import os

    uid = uid or os.path.splitext(os.path.basename(path))[0] + ".pkl"
    return extract_brep_sample(load_brep(path), uid)

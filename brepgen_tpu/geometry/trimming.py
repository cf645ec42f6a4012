"""Loop ordering and UV-domain face trimming for tessellation.

The reference trims faces with OpenCASCADE wires + ShapeFix
(``utils.py:819-931``). Native equivalent used for tessellation/STL:

  * ``order_loops``: walk each face's edges through the vertex adjacency
    into closed loops; the outer loop is the one with the largest bbox
    diagonal (same heuristic as ``utils.py:897-905``).
  * ``trim_face_grid``: map the boundary loops into the face's UV index
    space (nearest grid sample), then keep grid cells whose centers are
    inside the boundary polygon(s) by even-odd crossing -- holes from
    inner loops fall out automatically. Falls back to the full grid if
    the mapped polygon is degenerate.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from brepgen_tpu.data.augment import get_bbox_norm
from brepgen_tpu.geometry.native_bindings import (
    cells_inside_polygons,
    nearest_grid_index,
    tessellate_cells,
)


def order_loops(
    face_edge_ids: Sequence[int], edge_vertex_adj: np.ndarray
) -> List[List[Tuple[int, bool]]]:
    """Group a face's edges into ordered closed loops.

    Returns loops as lists of (edge_id, forward) where ``forward`` means
    the edge is traversed start->end.
    """
    remaining = {int(e): tuple(int(v) for v in edge_vertex_adj[e]) for e in face_edge_ids}
    loops = []
    while remaining:
        e0, (v0, v1) = next(iter(remaining.items()))
        del remaining[e0]
        loop = [(e0, True)]
        current = v1
        start = v0
        while current != start:
            found = False
            for e, (a, b) in list(remaining.items()):
                if a == current:
                    loop.append((e, True))
                    current = b
                    del remaining[e]
                    found = True
                    break
                if b == current:
                    loop.append((e, False))
                    current = a
                    del remaining[e]
                    found = True
                    break
            if not found:
                break  # open chain -- treat as a loop anyway
        loops.append(loop)
    return loops


def outer_loop_index(loops, edge_wcs: np.ndarray) -> int:
    spans = []
    for loop in loops:
        pts = np.concatenate([edge_wcs[e].reshape(-1, 3) for e, _ in loop])
        spans.append(get_bbox_norm(pts))
    return int(np.argmax(spans))


def loop_polyline(loop, edge_wcs: np.ndarray) -> np.ndarray:
    """Concatenate oriented edge curves into one closed 3D polyline."""
    parts = []
    for e, forward in loop:
        c = edge_wcs[e]
        parts.append(c if forward else c[::-1])
    return np.concatenate(parts)


def trim_face_grid(
    grid: np.ndarray,                 # [Nu, Nv, 3]
    loops,                            # from order_loops
    edge_wcs: np.ndarray,
) -> np.ndarray:
    """Tessellate the trimmed face -> triangles [T, 3, 3]."""
    Nu, Nv, _ = grid.shape
    polys = []
    for loop in loops:
        poly3d = loop_polyline(loop, edge_wcs)
        uv = nearest_grid_index(poly3d, grid)
        # drop consecutive duplicates
        keep = np.ones(len(uv), bool)
        keep[1:] = np.any(np.diff(uv, axis=0) != 0, axis=1)
        uv = uv[keep]
        if len(uv) >= 3:
            polys.append(uv)

    if polys:
        inside = cells_inside_polygons(polys, Nu, Nv)
        if not inside.any():
            inside = np.ones((Nu - 1, Nv - 1), bool)
    else:
        inside = np.ones((Nu - 1, Nv - 1), bool)

    return tessellate_cells(grid, inside)

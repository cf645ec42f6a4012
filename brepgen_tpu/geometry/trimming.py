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


def _points_to_uv_index(points: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Map 3D points to fractional (i, j) indices of their nearest grid
    samples. grid: [Nu, Nv, 3]."""
    Nu, Nv, _ = grid.shape
    flat = grid.reshape(-1, 3)
    d2 = (
        np.sum(points**2, -1)[:, None]
        + np.sum(flat**2, -1)[None, :]
        - 2.0 * points @ flat.T
    )
    idx = np.argmin(d2, axis=1)
    return np.stack([idx // Nv, idx % Nv], -1).astype(float)


def _even_odd_inside(px: np.ndarray, py: np.ndarray, polys: List[np.ndarray]) -> np.ndarray:
    """Vectorized even-odd point-in-polygon over multiple polygons."""
    inside = np.zeros(px.shape, bool)
    for poly in polys:
        x, y = poly[:, 0], poly[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        for k in range(len(poly)):
            cond = ((y[k] > py) != (y2[k] > py)) & (
                px < (x2[k] - x[k]) * (py - y[k]) / (y2[k] - y[k] + 1e-30) + x[k]
            )
            inside ^= cond
    return inside


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
        uv = _points_to_uv_index(poly3d, grid)
        # drop consecutive duplicates
        keep = np.ones(len(uv), bool)
        keep[1:] = np.any(np.diff(uv, axis=0) != 0, axis=1)
        uv = uv[keep]
        if len(uv) >= 3:
            polys.append(uv)

    ci, cj = np.meshgrid(
        np.arange(Nu - 1) + 0.5, np.arange(Nv - 1) + 0.5, indexing="ij"
    )
    if polys:
        inside = _even_odd_inside(ci, cj, polys)
        if not inside.any():
            inside = np.ones_like(inside)
    else:
        inside = np.ones(ci.shape, bool)

    tris = []
    for i, j in zip(*np.where(inside)):
        a, b, c, d = grid[i, j], grid[i + 1, j], grid[i + 1, j + 1], grid[i, j + 1]
        tris.append([a, b, c])
        tris.append([a, c, d])
    return np.asarray(tris)

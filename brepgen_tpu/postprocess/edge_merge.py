"""Shared-edge detection: pair the per-face edge duplicates back together.

Host-side numpy re-implementation of the reference (``utils.py:588-645``):
re-assign edge endpoints to the merged unique vertices, then pair edges
that connect the same vertex set AND whose latent z differ by less than
``z_threshold`` (mean abs). Every generated edge must pair with exactly
one mate (mating duplication doubles each real edge), otherwise the sample
is rejected ("edge not reduced by 2", ``utils.py:622-623``).

Returns (unique_faces_z, unique_edges_z, FaceEdgeAdj, EdgeVertexAdj).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from brepgen_tpu.postprocess.vertex_merge import PostprocessError


def detect_shared_edge(
    unique_vertices: np.ndarray,
    new_vertex_dict: Dict[int, List[int]],
    edge_z_cad: np.ndarray,    # [E, 12] latent of each kept (duplicated) edge
    surf_z_cad: np.ndarray,    # [F, 48]
    z_threshold: float,
    edge_mask_cad: np.ndarray, # [nf, ne]
):
    E = len(edge_z_cad)

    # old endpoint id -> unique vertex id (must be exactly one group)
    old2new = np.full(2 * E, -1, np.int64)
    for new_id, olds in new_vertex_dict.items():
        for o in olds:
            if o < 2 * E:
                if old2new[o] != -1:
                    raise PostprocessError(f"endpoint {o} in multiple groups")
                old2new[o] = new_id
    if (old2new < 0).any():
        raise PostprocessError("unassigned edge endpoint")

    EdgeVertexAdj = old2new.reshape(-1, 2)

    # pair edges with identical vertex sets and close latents
    similar = []
    vsets = [frozenset(ev) for ev in EdgeVertexAdj]
    for i in range(E):
        for j in range(E):
            if i != j and vsets[i] == vsets[j]:
                if np.abs(edge_z_cad[i] - edge_z_cad[j]).mean() < z_threshold:
                    similar.append(tuple(sorted((i, j))))
    similar = np.unique(np.array(similar).reshape(-1, 2), axis=0) if similar else np.zeros((0, 2), int)

    if 2 * len(similar) != E:
        raise PostprocessError(
            f"edge not reduced by 2: {E} edges, {len(similar)} pairs"
        )

    unique_edge_id = similar[:, 0]
    EdgeVertexAdj = EdgeVertexAdj[unique_edge_id]
    unique_edges = edge_z_cad[unique_edge_id]

    # map each face's duplicated edges to the unique edge ids
    FaceEdgeAdj = []
    ranges = np.concatenate([[0], np.cumsum((~edge_mask_cad).sum(1))])
    for f in range(len(ranges) - 1):
        ids = []
        for old in range(ranges[f], ranges[f + 1]):
            row = np.where(similar == old)[0]
            if len(row) != 1:
                raise PostprocessError(f"edge {old} pairs {len(row)} times")
            ids.append(int(row[0]))
        FaceEdgeAdj.append(ids)

    return surf_z_cad, unique_edges, FaceEdgeAdj, EdgeVertexAdj

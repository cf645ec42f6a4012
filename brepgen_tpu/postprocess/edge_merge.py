"""Shared-edge detection: pair the per-face edge duplicates back together.

Host-side numpy re-implementation of the reference (``utils.py:588-645``):
re-assign edge endpoints to the merged unique vertices, then pair edges
that connect the same vertex set AND whose latent z differ by less than
``z_threshold`` (mean abs). Every generated edge must pair with exactly
one mate (mating duplication doubles each real edge), otherwise the sample
is rejected ("edge not reduced by 2", ``utils.py:622-623``).

The reference's check is all-or-nothing: ANY ambiguity in the pair list
(three mutually-similar edges, one unpairable stray) rejects the whole
sample. ``recovery=True`` adds a bounded ladder the reference does not
have, tried only after the strict check fails:

  rung 1  greedy minimum-z-distance perfect matching over the strict
          candidate pairs (resolves over-pairing ambiguity, the dominant
          observed failure: E edges with > E/2 candidate pairs);
  rung 2  re-match leftover unmatched edges at 2.5x the z threshold
          (same-vertex-set requirement kept -- it is topological);
  rung 3  match leftover edges sharing a vertex set regardless of z;
  rung 4  DROP edges that still have no mate, then require every face's
          remaining wire to stay closed (every vertex used by the face
          has even degree) -- otherwise the sample is rejected as before.
          The drop is WIRE-AWARE: an unmatched edge may swap places with
          any same-vertex-set group member (the group is interchangeable
          under the pairing), so the ladder drops the member whose face
          wire is repaired by the removal -- both its endpoints have odd
          degree there, i.e. that face carries the hallucinated extra
          duplicate. The dominant odd-group failure ("57 edges, 43
          pairs") is exactly this shape.

The strict path is byte-identical to the reference semantics; the ladder
only runs where the reference would have discarded the sample. (A fifth
rung -- greedy endpoint matching when a face's wire loop cannot be closed
by nearest-neighbor endpoints -- lives in vertex_merge.py and is reported
as recovery_rung 5 by the pipeline.)

Returns (unique_faces_z, unique_edges_z, FaceEdgeAdj, EdgeVertexAdj).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from brepgen_tpu.postprocess.vertex_merge import PostprocessError


def _ladder_matching(
    vsets: List[frozenset],
    edge_z_cad: np.ndarray,
    z_threshold: float,
    face_ranges: np.ndarray,
    EdgeVertexAdj: np.ndarray,
    unique_vertices: np.ndarray,
    info: Optional[dict],
    allow_singletons: bool = False,
):
    """Greedy min-z-distance perfect matching with threshold relaxation.

    Returns (pairs [P,2] sorted, dropped edge-id list). Records the deepest
    rung used and dropped count in ``info`` when given. May MUTATE
    ``vsets``/``EdgeVertexAdj``/``unique_vertices`` in place when the
    vertex-unification step fires (see below).
    """
    E = len(vsets)
    matched = np.full(E, -1, np.int64)
    deepest = 0
    face_of = np.searchsorted(face_ranges, np.arange(E), side="right") - 1

    def run_rungs():
        """rung 1: base threshold; rung 2: 2.5x; rung 3: vertex set only."""
        nonlocal deepest
        matched[:] = -1
        for rung, thr in enumerate(
                (z_threshold, 2.5 * z_threshold, None), start=1):
            unmatched = [i for i in range(E) if matched[i] < 0]
            cands = []
            for a in range(len(unmatched)):
                for b in range(a + 1, len(unmatched)):
                    i, j = unmatched[a], unmatched[b]
                    if vsets[i] != vsets[j]:
                        continue
                    d = float(np.abs(edge_z_cad[i] - edge_z_cad[j]).mean())
                    if thr is None or d < thr:
                        cands.append((d, i, j))
            for _, i, j in sorted(cands):
                if matched[i] < 0 and matched[j] < 0:
                    matched[i], matched[j] = j, i
                    deepest = max(deepest, rung)

    run_rungs()

    # rung 4 (vertex unification): two leftover edges that share one
    # endpoint and have near-identical latents are almost certainly the
    # same true edge whose OTHER endpoint got merged into two different
    # unique vertices (the missing-mate failure). Unify those vertices --
    # a global rename, which never changes any face's wire parity -- and
    # re-match. Bounded by the leftover count; each step removes a vertex.
    n_unified = 0
    while True:
        left = [i for i in range(E) if matched[i] < 0]
        best = None
        for a in range(len(left)):
            for b in range(a + 1, len(left)):
                i, j = left[a], left[b]
                si, sj = vsets[i], vsets[j]
                if si == sj or len(si) != len(sj):
                    continue
                if face_of[i] == face_of[j]:
                    # mating duplicates live on two DIFFERENT faces; two
                    # leftovers in one face are a duplicated-face artifact
                    # (let the pipeline's face drop handle it), not a
                    # missing mate -- unifying would glue its corners
                    continue
                if len(si) == 2 and len(si & sj) != 1:
                    continue  # open edges must anchor on a shared vertex
                d = float(np.abs(edge_z_cad[i] - edge_z_cad[j]).mean())
                if d < 2.5 * z_threshold and (best is None or d < best[0]):
                    best = (d, i, j)
        if best is None:
            break
        _, i, j = best
        inter = vsets[i] & vsets[j]
        va = next(iter(vsets[i] - inter))
        vb = next(iter(vsets[j] - inter))
        va, vb = min(va, vb), max(va, vb)
        EdgeVertexAdj[EdgeVertexAdj == vb] = va
        unique_vertices[va] = (unique_vertices[va] + unique_vertices[vb]) / 2
        vsets[:] = [frozenset(ev) for ev in EdgeVertexAdj]
        n_unified += 1
        deepest = 4
        run_rungs()
    if info is not None:
        info["unified_vertices"] = n_unified

    # rung 4 (wire-aware drops): every leftover edge belongs to an odd-size
    # vertex-set group (within a group all pairings are topologically
    # interchangeable, so groups of even size always fully match at rung 3).
    # Which member is left unmatched is a free choice -- make it the member
    # whose FACE wire is repaired by the drop: both its endpoints have odd
    # degree in that face (the face carries the extra duplicate). Degrees
    # are tracked across successive drops so multiple odd groups compose.
    leftover = [i for i in range(E) if matched[i] < 0]
    dropped: List[int] = []
    n_single = 0
    if leftover:
        deepest = 4
        deg: Dict[tuple, int] = {}
        kept = {f: 0 for f in range(len(face_ranges) - 1)}
        for e in range(E):
            f = int(face_of[e])
            kept[f] += 1
            for v in (int(EdgeVertexAdj[e, 0]), int(EdgeVertexAdj[e, 1])):
                deg[(f, v)] = deg.get((f, v), 0) + 1

        def safe_drop(e: int) -> bool:
            """Dropping ``e`` must leave its face no worse: parity repaired
            (or parity-neutral for closed curves) and >= 1 edge kept."""
            f = int(face_of[e])
            if kept[f] < 2:
                return False
            v0, v1 = int(EdgeVertexAdj[e, 0]), int(EdgeVertexAdj[e, 1])
            if v0 == v1:  # closed curve contributes 2 -- parity-neutral
                return True
            return deg[(f, v0)] % 2 == 1 and deg[(f, v1)] % 2 == 1

        for d in leftover:
            pick = d if safe_drop(d) else None
            if pick is None:
                for m in range(E):
                    if m != d and vsets[m] == vsets[d] and matched[m] >= 0 \
                            and safe_drop(m):
                        # swap: d inherits m's mate, m becomes the drop
                        mate = int(matched[m])
                        matched[d], matched[mate] = mate, d
                        matched[m] = -1
                        pick = m
                        break
            if pick is None:
                if not allow_singletons:
                    # let the pipeline try dropping a redundant FACE first
                    # (redundant_faces) -- the cleaner fix when the edge
                    # belongs to a hallucinated duplicate face
                    raise PostprocessError(
                        f"unresolvable unpaired edge {d} "
                        f"(vertex set {sorted(vsets[d])})")
                # last resort: KEEP the edge as a single-adjacency unique
                # edge instead of breaking a wire. The strict path never
                # checks wire closure either -- the B-rep builder downstream
                # is the arbiter, and an unchanged wire beats a torn one.
                matched[d] = d
                n_single += 1
                continue
            f = int(face_of[pick])
            kept[f] -= 1
            deg[(f, int(EdgeVertexAdj[pick, 0]))] -= 1
            deg[(f, int(EdgeVertexAdj[pick, 1]))] -= 1
            dropped.append(pick)

    pairs = sorted({(min(i, int(matched[i])), max(i, int(matched[i])))
                    for i in range(E) if matched[i] >= 0})
    pairs = np.asarray(pairs, np.int64).reshape(-1, 2)
    if info is not None:
        info["recovery_rung"] = deepest
        info["dropped_edges"] = len(dropped)
        info["singleton_edges"] = n_single
    return pairs, dropped


def _check_wires_closed(
    face_ranges: np.ndarray,
    EdgeVertexAdj: np.ndarray,
    dropped: set,
):
    """Recovery drops must leave every face NO WORSE than it started:
    no face loses all its edges, and no vertex that had even degree in the
    face's wire (a closed edge, v0 == v1, contributes 2) turns odd. A face
    whose wire was already open flows through -- the strict path never
    checked closure either; the B-rep builder downstream is the arbiter."""
    for f in range(len(face_ranges) - 1):
        deg: Dict[int, List[int]] = {}
        kept = 0
        for old in range(face_ranges[f], face_ranges[f + 1]):
            keep = old not in dropped
            kept += keep
            v0, v1 = int(EdgeVertexAdj[old, 0]), int(EdgeVertexAdj[old, 1])
            for v in (v0, v1):
                pre, post = deg.get(v, (0, 0))
                deg[v] = (pre + 1, post + keep)
        if kept == 0:
            raise PostprocessError(f"recovery dropped all edges of face {f}")
        worse = [v for v, (pre, post) in deg.items()
                 if post % 2 and not pre % 2]
        if worse:
            raise PostprocessError(
                f"recovery broke face {f} wire: odd-degree vertices {worse}"
            )


def redundant_faces(vsets: List[frozenset], ranges, max_faces: int = 2):
    """Faces whose removal fixes odd vertex-set-group parity: hallucinated
    duplicate faces the bbox dedup missed.

    The dominant converged-demo failure is NOT a stray edge but a whole
    supernumerary FACE: its edges show up as third copies (groups of 3) or
    orphans (groups of 1) while every face wire is individually closed.
    Dropping a face only affects its own wire, so the search is safe: a
    face qualifies when every even-size group it touches loses an even
    number of members (no new odd groups) and at least one odd group is
    repaired. Greedy, bounded at ``max_faces`` drops (beyond two redundant
    faces the sample is garbage, reject as before).

    Returns indices into the ``ranges`` face order (valid-face space).
    """
    from collections import Counter

    sizes = Counter(vsets)
    drops: List[int] = []
    while len(drops) < max_faces and any(c % 2 for c in sizes.values()):
        best, best_gain = None, 0
        for f in range(len(ranges) - 1):
            if f in drops:
                continue
            cnt = Counter(vsets[e] for e in range(ranges[f], ranges[f + 1]))
            if not cnt:
                continue
            if any(c % 2 and sizes[vs] % 2 == 0 for vs, c in cnt.items()):
                continue  # would break an even (healthy) group
            gain = sum(1 for vs, c in cnt.items() if c % 2 and sizes[vs] % 2)
            if gain > best_gain:
                best, best_gain = f, gain
        if best is None:
            break
        drops.append(best)
        for e in range(ranges[best], ranges[best + 1]):
            sizes[vsets[e]] -= 1
    return drops


def detect_shared_edge(
    unique_vertices: np.ndarray,
    new_vertex_dict: Dict[int, List[int]],
    edge_z_cad: np.ndarray,    # [E, 12] latent of each kept (duplicated) edge
    surf_z_cad: np.ndarray,    # [F, 48]
    z_threshold: float,
    edge_mask_cad: np.ndarray, # [nf, ne]
    recovery: bool = False,
    info: Optional[dict] = None,
    allow_singletons: bool = False,
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

    ranges = np.concatenate([[0], np.cumsum((~edge_mask_cad).sum(1))])
    if info is not None:
        # expose the pairing structure so the pipeline's face-drop retry
        # (redundant_faces) can run when this call raises
        info["vsets"] = vsets
        info["ranges"] = ranges
    dropped: set = set()
    counts = np.bincount(similar.flatten(), minlength=E) if len(similar) else np.zeros(E, int)
    strict_ok = 2 * len(similar) == E and (counts == 1).all()
    if not strict_ok and not recovery:
        # reference semantics: reject outright when the pair count is off
        # (utils.py:622-623); a count-preserving ambiguity falls through to
        # the per-edge check in the face loop below, as in the reference.
        if 2 * len(similar) != E:
            raise PostprocessError(
                f"edge not reduced by 2: {E} edges, {len(similar)} pairs"
            )
    elif not strict_ok:
        similar, dropped_list = _ladder_matching(
            vsets, edge_z_cad, z_threshold, ranges, EdgeVertexAdj,
            unique_vertices, info, allow_singletons)
        dropped = set(dropped_list)
        if dropped:
            _check_wires_closed(ranges, EdgeVertexAdj, dropped)
    elif info is not None:
        info["recovery_rung"] = 0
        info["dropped_edges"] = 0

    unique_edge_id = similar[:, 0]
    EdgeVertexAdj = EdgeVertexAdj[unique_edge_id]
    unique_edges = edge_z_cad[unique_edge_id]

    # map each face's duplicated edges to the unique edge ids
    FaceEdgeAdj = []
    for f in range(len(ranges) - 1):
        ids = []
        for old in range(ranges[f], ranges[f + 1]):
            if old in dropped:
                continue
            # a singleton-kept edge appears as a [d, d] row -- dedupe hits
            row = np.unique(np.where(similar == old)[0])
            if len(row) != 1:
                raise PostprocessError(f"edge {old} pairs {len(row)} times")
            ids.append(int(row[0]))
        FaceEdgeAdj.append(ids)

    return surf_z_cad, unique_edges, FaceEdgeAdj, EdgeVertexAdj

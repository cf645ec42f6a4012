"""Replay the host topology-recovery half of postprocess offline.

Loads the raw cascade outputs dumped by ``resample_demo.py --dump``
(``batches.npz``) and runs vertex merge + edge pairing per sample with
full error reporting -- PURE NUMPY, no jax import, so it can run while a
TPU job owns the backend (CLAUDE.md: one jax process at a time). This is
the iteration harness for the recovery ladder: the stages it replays are
exactly where every 'postprocess failed' sample dies; VAE decode /
joint_optimize / construct_brep (the jax+geometry half) are NOT replayed,
so a sample reported rescued here still has to clear those on the chip.

Usage: python scripts/replay_postprocess.py artifacts/demo_round4/resample_dbg/batches.npz [--strict]
"""

import argparse
import json
import sys
import traceback
import types

import numpy as np

# HARD no-jax guarantee: trap any accidental import (None in sys.modules
# makes ``import jax`` raise instead of touching the backend), and pre-seed
# dummy parent packages so loading the two pure-numpy modules below cannot
# trigger brepgen_tpu/__init__ (which pulls jax).
sys.modules["jax"] = None
for _name in ("brepgen_tpu", "brepgen_tpu.postprocess"):
    sys.modules.setdefault(_name, types.ModuleType(_name))

import importlib.util


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_root = __file__.rsplit("/", 2)[0]
vertex_merge = _load("brepgen_tpu.postprocess.vertex_merge",
                     f"{_root}/brepgen_tpu/postprocess/vertex_merge.py")
edge_merge = _load("brepgen_tpu.postprocess.edge_merge",
                   f"{_root}/brepgen_tpu/postprocess/edge_merge.py")

P = argparse.ArgumentParser()
P.add_argument("npz")
P.add_argument("--strict", action="store_true", help="disable the ladder")
P.add_argument("--z_threshold", type=float, default=0.2)
P.add_argument("--tracebacks", action="store_true")
P.add_argument("--ablate", type=int, nargs="*", default=[], choices=[4, 5, 6],
               help="disable individual recovery rungs (rung ablation): "
                    "4 = edge-pairing ladder (matching/unification/drops/"
                    "singletons), 5 = greedy loop closure, 6 = face drops")
args = P.parse_args()
ABLATE = set(args.ablate)

raw = np.load(args.npz)
n_batches = 1 + max(int(k.rsplit("__", 1)[1]) for k in raw.files)
batches = [
    {k.rsplit("__", 1)[0]: raw[k] for k in raw.files if k.endswith(f"__{bi}")}
    for bi in range(n_batches)
]


def endpoints_from_bbox(edge_pos, edge_ncs, edge_mask):
    """pipeline.edge_endpoints_from_bbox, inlined to stay jax-free."""
    out = []
    for bbox_row, ncs_row, mask_row in zip(edge_pos, edge_ncs, edge_mask):
        startends = []
        for bb, ee in zip(bbox_row[~mask_row], ncs_row[~mask_row]):
            center = (bb[0:3] + bb[3:]) / 2.0
            size = float(np.max(bb[3:] - bb[0:3]))
            wcs = ee * (size / 2) + center
            startends.append(wcs[[0, -1]].reshape(1, 2, 3))
        out.append(np.vstack(startends))
    return out


def manifold_audit(face_edge_adj, edge_vertex_adj):
    """Replicates SolidMesh.topology_ok (geometry/brep_build.py) on the
    pairing outputs alone -- order each face's edges into loops (the same
    walk as trimming.order_loops) and require closed chains with every
    unique edge used by exactly two faces, AND an orientable gluing (a
    2-colorable flip-constraint graph, mirroring
    step_writer._coherent_face_flips; closed edges a==b are exempt because
    the STEP writer toggles their direction freely). The coloring here is
    per-LOOP, not per-face (the walk has no UV data to relate a face's
    inner loops to its outer one), so it is slightly more permissive than
    topology_ok on multi-loop faces -- the on-chip check is the authority.
    Returns (ok, reason)."""
    use = {}
    uses_dir = {}  # edge -> [(loop_id, traversed a->b?)]
    loop_id = 0
    for ids in face_edge_adj:
        # slot-keyed: a face may traverse the same unique edge twice (seam)
        remaining = {
            s: (int(e), (int(edge_vertex_adj[e, 0]),
                         int(edge_vertex_adj[e, 1])))
            for s, e in enumerate(ids)
        }
        if not remaining:
            return False, "empty face"
        while remaining:
            s0 = next(iter(remaining))
            e0, (v0, v1) = remaining.pop(s0)
            use[e0] = use.get(e0, 0) + 1
            uses_dir.setdefault(e0, []).append((loop_id, True))
            current, start = v1, v0
            while current != start:
                found = False
                for s, (e, (a, b)) in list(remaining.items()):
                    if a == current or b == current:
                        fwd = a == current
                        current = b if fwd else a
                        del remaining[s]
                        use[e] = use.get(e, 0) + 1
                        uses_dir.setdefault(e, []).append((loop_id, fwd))
                        found = True
                        break
                if not found:
                    return False, "open chain"
            loop_id += 1
    if not use:
        return False, "no edges"
    singles = sum(1 for c in use.values() if c == 1)
    if singles:
        return False, f"single-adjacency x{singles}"
    if any(c != 2 for c in use.values()):
        return False, "edge used >2"
    # orientability: flip_f XOR flip_g == (t_f == t_g) per shared edge
    graph = {}
    for e, us in uses_dir.items():
        if len(us) != 2:
            continue
        if int(edge_vertex_adj[e, 0]) == int(edge_vertex_adj[e, 1]):
            continue  # closed edge: direction is writer-fixable
        (f, tf), (g, tg) = us
        if f == g:
            if tf == tg:
                return False, "non-orientable (seam same-direction)"
            continue
        parity = tf == tg
        graph.setdefault(f, []).append((g, parity))
        graph.setdefault(g, []).append((f, parity))
    color = {}
    for root in list(graph):
        if root in color:
            continue
        color[root] = False
        queue = [root]
        while queue:
            f = queue.pop()
            for g, parity in graph[f]:
                want = color[f] ^ parity
                if g not in color:
                    color[g] = want
                    queue.append(g)
                elif color[g] != want:
                    return False, "non-orientable"
    return True, ""


def topology_once(sample, b, recovery, face_drops, allow_singletons):
    """vertex merge + edge pairing for one sample (the failing stages)."""
    valid = ~np.asarray(sample["surf_mask"][b])
    if face_drops:
        valid = valid.copy()
        valid[list(face_drops)] = False
    edge_mask_cad = np.asarray(sample["edge_mask"][b])[valid]
    edge_pos_cad = np.asarray(sample["edge_pos"][b])[valid]
    edge_ncs_cad = np.asarray(sample["edge_ncs"][b])[valid]
    edgeV_cad = np.asarray(sample["edge_v"][b])[valid]
    edge_z_cad = np.asarray(sample["edge_z"][b])[valid][~edge_mask_cad]
    surf_z_cad = np.asarray(sample["surf_z"][b])[valid]
    ebb = endpoints_from_bbox(edge_pos_cad, edge_ncs_cad, edge_mask_cad)
    info = {}
    try:
        uv, groups = vertex_merge.detect_shared_vertex(
            edgeV_cad, edge_mask_cad, ebb, recovery=recovery, info=info,
            greedy_closure=5 not in ABLATE)
        _, _, fea, eva = edge_merge.detect_shared_edge(
            uv, groups, edge_z_cad, surf_z_cad, args.z_threshold,
            edge_mask_cad, recovery=recovery and 4 not in ABLATE, info=info,
            allow_singletons=allow_singletons)
    except Exception as e:
        e.pairing_info = info
        e.valid = valid
        raise
    rung = info.get("recovery_rung", 0)
    if info.get("vertex_rescued_faces", 0) or info.get(
            "chained_proximity_merges", 0):
        rung = max(rung, 5)
    return rung, manifold_audit(fea, eva), info


ok, rungs, failures = 0, {}, {}
attempted = 0
solid_by_rung = {}     # rung -> [manifold-solid count, nonsolid reasons]
ladder_actions = {}    # which ladder mechanisms fired, summed over samples
face_counts = []       # (pre-drop, post-drop) per rung-6 rescue: the
#                        false-rescue audit compares post-drop counts to
#                        the generating family's legitimate face counts
for sample in batches:
    B = sample["surf_mask"].shape[0]
    for b in range(B):
        attempted += 1
        face_drops = set()
        allow_single = False
        for _ in range(4):  # mirror postprocess_single's retry staging
            try:
                rung, (solid, why), info = topology_once(
                    sample, b, not args.strict, face_drops, allow_single)
                for act in ("unified_vertices", "dropped_edges",
                            "singleton_edges", "vertex_rescued_faces",
                            "chained_proximity_merges"):
                    if info.get(act, 0):
                        ladder_actions[act] = (
                            ladder_actions.get(act, 0) + info[act])
                if face_drops:
                    rung = 6
                    n_valid = int((~np.asarray(sample["surf_mask"][b])).sum())
                    face_counts.append([n_valid, n_valid - len(face_drops)])
                ok += 1
                rungs[rung] = rungs.get(rung, 0) + 1
                ent = solid_by_rung.setdefault(rung, [0, {}])
                if solid:
                    ent[0] += 1
                else:
                    ent[1][why] = ent[1].get(why, 0) + 1
                break
            except Exception as e:  # noqa: BLE001 -- full taxonomy wanted
                info = getattr(e, "pairing_info", None)
                new = []
                if not args.strict and 6 not in ABLATE and not allow_single \
                        and info and "vsets" in info:
                    new = edge_merge.redundant_faces(
                        info["vsets"], info["ranges"],
                        max_faces=2 - len(face_drops))
                if not new:
                    if not args.strict and 4 not in ABLATE \
                            and not allow_single \
                            and info and "vsets" in info:
                        allow_single = True
                        continue
                    key = f"{type(e).__name__}: {e}"[:160]
                    failures[key] = failures.get(key, 0) + 1
                    if args.tracebacks:
                        traceback.print_exc()
                    break
                valid_idx = np.where(e.valid)[0]
                face_drops.update(int(valid_idx[f]) for f in new)

print(json.dumps({
    "attempted": attempted,
    "ablated_rungs": sorted(ABLATE),
    "topology_ok": ok,
    "rungs": {str(k): v for k, v in sorted(rungs.items())},
    "manifold_solid_by_rung": {
        str(k): {"solid": v[0], "nonsolid": v[1]}
        for k, v in sorted(solid_by_rung.items())
    },
    "rung6_face_counts_pre_post": face_counts,
    "ladder_actions": ladder_actions,
    "failures": failures,
}, indent=2))

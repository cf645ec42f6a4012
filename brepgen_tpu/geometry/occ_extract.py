"""OCC-backed STEP extraction (gated on pythonocc-core + occwl).

Re-implementation of reference ``data_process/process_brep.py`` +
``convert_utils.py``: load a STEP solid, split closed faces/edges, sample
32x32 UV grids (visible region) and 32-point u-grids, build face-edge /
edge-corner adjacency via occwl's EntityMapper (skipping seam edges),
normalize, and write the schema pkl. Parallel over a process pool with
per-item isolation.
"""

from __future__ import annotations

import math
import os
import pickle
from multiprocessing.pool import Pool

import numpy as np

# Gated imports -- ImportError propagates to the CLI which explains.
from occwl.io import load_step
from occwl.uvgrid import ugrid, uvgrid
from occwl.entity_mapper import EntityMapper

from brepgen_tpu.data.schema import build_brep_sample

MAX_FACE = 70


def face_edge_adj(solid):
    """Face->edges adjacency, skipping seam/degenerate edges
    (reference convert_utils.py:202-249)."""
    mapper = EntityMapper(solid)
    adj = {}
    for face in solid.faces():
        f_idx = mapper.face_index(face)
        adj[f_idx] = []
    for edge in solid.edges():
        if not edge.has_curve():
            continue
        connected = list(solid.faces_from_edge(edge))
        if len(connected) < 2:
            continue
        if len(set(mapper.face_index(f) for f in connected)) < 2:
            continue  # seam edge (same face twice)
        e_idx = mapper.edge_index(edge)
        for f in connected:
            adj[mapper.face_index(f)].append(e_idx)
    return adj, mapper


def extract_primitive(solid):
    faces, edges = list(solid.faces()), list(solid.edges())
    adj, mapper = face_edge_adj(solid)

    face_pnts = []
    for face in faces:
        pts = uvgrid(face, method="point", num_u=32, num_v=32)
        face_pnts.append(pts)

    edge_pnts, edge_corner, used_edges = [], [], {}
    edgeFace = {}
    for f_idx, e_idxs in adj.items():
        for e in e_idxs:
            edgeFace.setdefault(e, []).append(f_idx)

    # keep only edges adjacent to exactly 2 faces, compacting indices
    kept = sorted(e for e, fs in edgeFace.items() if len(fs) == 2)
    compact = {e: i for i, e in enumerate(kept)}

    edge_objs = {mapper.edge_index(e): e for e in edges if e.has_curve()}
    for e in kept:
        edge = edge_objs[e]
        pts = ugrid(edge, method="point", num_u=32)
        edge_pnts.append(pts)
        s = np.array(edge.start_vertex().point())
        t = np.array(edge.end_vertex().point())
        edge_corner.append(np.stack([s, t]))

    faceEdge_adj = [
        np.array(sorted(compact[e] for e in e_idxs if e in compact))
        for f_idx, e_idxs in sorted(adj.items())
    ]
    edgeFace_adj = np.array([sorted(edgeFace[e]) for e in kept])
    return face_pnts, edge_pnts, np.stack(edge_corner), faceEdge_adj, edgeFace_adj


def process_one(args):
    """Extract one STEP file; returns 1 on success, 0 on failure/timeout.

    A SIGALRM watchdog bounds each item (the reference isolates shards with
    ``timeout``+``pkill``, ``process.sh:10-11``; per-item alarms are finer).
    """
    import signal

    step_path, out_dir = args

    def _timeout(signum, frame):
        raise TimeoutError(step_path)

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(300)
    try:
        loaded = load_step(step_path)
        if len(loaded) != 1:
            return 0
        solid = loaded[0]
        solid = solid.split_all_closed_faces(num_splits=0)
        solid = solid.split_all_closed_edges(num_splits=0)
        if len(list(solid.faces())) > MAX_FACE:
            return 0
        face_pnts, edge_pnts, corners, fe_adj, ef_adj = extract_primitive(solid)
        uid = os.path.splitext(os.path.basename(step_path))[0] + ".pkl"
        data = build_brep_sample(face_pnts, edge_pnts, corners, fe_adj, ef_adj, uid)
        try:
            shard = str(math.floor(int(uid.split(".")[0]) / 10000)).zfill(4)
        except ValueError:
            shard = ""
        os.makedirs(os.path.join(out_dir, shard), exist_ok=True)
        with open(os.path.join(out_dir, shard, uid), "wb") as f:
            pickle.dump(data, f)
        return 1
    except Exception:
        return 0
    finally:
        signal.alarm(0)


def process_step_dir(
    in_dir: str, out_dir: str, option: str = "abc", roots=None
) -> int:
    """Extract every STEP under ``in_dir`` (or only under ``roots`` — the
    shard driver passes per-shard folder lists)."""
    paths = []
    for base in roots if roots is not None else [in_dir]:
        if os.path.isfile(base):
            paths.append(base)
            continue
        for root, _dirs, files in os.walk(base):
            for f in files:
                if f.lower().endswith((".step", ".stp")):
                    paths.append(os.path.join(root, f))
    os.makedirs(out_dir, exist_ok=True)
    ok = 0
    with Pool(os.cpu_count()) as pool:
        for r in pool.imap(process_one, [(p, out_dir) for p in paths]):
            ok += r
    print(f"extracted {ok}/{len(paths)} solids")
    return ok

"""Do the ladder's kept singleton edges have geometric mates? (No.)

Pure numpy (no jax import, safe to run beside a TPU job) -- replays
vertex+edge merge on a cascade dump, and for every sample that keeps
single-adjacency edges (edge_merge.py allow_singletons last resort),
measures the best endpoint-coordinate match between singleton pairs on
different faces.

Measured on the held-out-family dump
(artifacts/demo_round5/held_resample/batches.npz, 54 samples with
singletons, 338 candidates): the NEAREST other-singleton endpoints sit
0.99-2.0 apart in world space (10th-90th pct) and z-latent distances are
~1.7 -- i.e. singletons are genuinely hallucinated unmated edges, not
split pairs a geometric "sewing" rung could re-join. That is why the
ladder stops at keeping them single-adjacency (the honest option) and
why manifold-solid rate on hard families is bounded by model quality,
not by recovery (BASELINE.md held-out-family section).

Usage: python scripts/singleton_mates_probe.py <batches.npz>
"""
import argparse
import sys, types
import numpy as np
sys.modules["jax"] = None
for _n in ("brepgen_tpu", "brepgen_tpu.postprocess"):
    sys.modules.setdefault(_n, types.ModuleType(_n))
import importlib.util
def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec); sys.modules[name] = mod
    spec.loader.exec_module(mod); return mod
vm = _load("brepgen_tpu.postprocess.vertex_merge", "brepgen_tpu/postprocess/vertex_merge.py")
em = _load("brepgen_tpu.postprocess.edge_merge", "brepgen_tpu/postprocess/edge_merge.py")

_ap = argparse.ArgumentParser()
_ap.add_argument("npz", nargs="?",
                 default="artifacts/demo_round5/held_resample/batches.npz")
raw = np.load(_ap.parse_args().npz)
nb = 1 + max(int(k.rsplit("__", 1)[1]) for k in raw.files)
keys = sorted({k.rsplit("__", 1)[0] for k in raw.files})
batches = [{k: raw[f"{k}__{b}"] for k in keys} for b in range(nb)]

def endpoints_from_bbox(edge_pos, edge_ncs, edge_mask):
    from_scratch = []
    for bbox_row, ncs_row, mask_row in zip(edge_pos, edge_ncs, edge_mask):
        epos = bbox_row[~mask_row]; curves = ncs_row[~mask_row]
        ses = []
        for bb, ee in zip(epos, curves):
            center = (bb[0:3] + bb[3:]) / 2.0
            size = np.abs(bb[3:] - bb[0:3])
            wcs = ee * (size / 2) + center
            ses.append(wcs[[0, -1]].reshape(1, 2, 3))
        from_scratch.append(np.vstack(ses))
    return from_scratch

import math
mate_dists = []     # best geometric mate distance per singleton
n_samples_with_single = 0
for sample in batches:
    B = sample["surf_mask"].shape[0]
    for b in range(B):
        valid = ~np.asarray(sample["surf_mask"][b])
        edge_mask_cad = np.asarray(sample["edge_mask"][b])[valid]
        edge_pos_cad = np.asarray(sample["edge_pos"][b])[valid]
        edge_ncs_cad = np.asarray(sample["edge_ncs"][b])[valid]
        edgeV_cad = np.asarray(sample["edge_v"][b])[valid]
        edge_z_cad = np.asarray(sample["edge_z"][b])[valid][~edge_mask_cad]
        ebb = endpoints_from_bbox(edge_pos_cad, edge_ncs_cad, edge_mask_cad)
        info = {}
        try:
            uv, groups = vm.detect_shared_vertex(edgeV_cad, edge_mask_cad, ebb,
                                                 recovery=True, info=info)
        except Exception:
            continue
        # rebuild old2new + run ladder matching manually to find singletons
        E = len(edge_z_cad)
        old2new = np.full(2 * E, -1, np.int64)
        bad = False
        for new_id, olds in groups.items():
            for o in olds:
                if o < 2 * E:
                    if old2new[o] != -1: bad = True
                    old2new[o] = new_id
        if bad or (old2new < 0).any(): continue
        eva = old2new.reshape(-1, 2)
        vsets = [frozenset(ev) for ev in eva]
        ranges = np.concatenate([[0], np.cumsum((~edge_mask_cad).sum(1))])
        inf2 = {}
        try:
            pairs, dropped = em._ladder_matching(
                list(vsets), edge_z_cad, 0.2, ranges, eva.copy(), uv.copy(),
                inf2, allow_singletons=True)
        except Exception:
            continue
        if not inf2.get("singleton_edges"): continue
        n_samples_with_single += 1
        # identify singletons: pairs with i==j
        singles = [int(p[0]) for p in pairs if p[0] == p[1]]
        face_of = np.searchsorted(ranges, np.arange(E), side="right") - 1
        for i in singles:
            best = None
            for j in singles:
                if j == i or face_of[i] == face_of[j]: continue
                # best endpoint assignment distance (wcs space)
                pi = uv[list(eva[i])]; pj = uv[list(eva[j])]
                d1 = np.linalg.norm(pi[0]-pj[0]) + np.linalg.norm(pi[1]-pj[1])
                d2 = np.linalg.norm(pi[0]-pj[1]) + np.linalg.norm(pi[1]-pj[0])
                dz = float(np.abs(edge_z_cad[i] - edge_z_cad[j]).mean())
                d = min(d1, d2)
                if best is None or d < best[0]: best = (d, dz)
            if best: mate_dists.append(best)

md = np.array(mate_dists)
print("samples with singletons:", n_samples_with_single)
print("singleton-pair candidates:", len(md))
if len(md):
    print("geom dist percentiles:", np.percentile(md[:,0], [10,25,50,75,90]).round(3))
    print("z dist percentiles:", np.percentile(md[:,1], [10,25,50,75,90]).round(3))
    for thr in (0.1, 0.2, 0.3, 0.5):
        sel = md[:,0] < thr
        print(f"geom<{thr}: {sel.sum()} ({sel.mean():.0%}), of those z<0.5: {(md[sel,1]<0.5).mean() if sel.any() else 0:.0%}")

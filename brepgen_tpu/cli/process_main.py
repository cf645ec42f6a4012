"""Data-extraction CLI -- parity with reference ``data_process/process_brep.py``.

Two backends:
  * ``--synthetic N``: generate N analytic solids (cuboids/prisms/
    cylinders) into the sharded pkl layout + a train/val/test split pkl --
    the full pipeline runs end-to-end with no CAD kernel;
  * STEP extraction via occwl/pythonocc when installed (the reference's
    path); gated import, parallel over a process pool with per-item
    isolation (the reference uses timeout+pkill, ``process.sh:10-11``).
"""

from __future__ import annotations

import argparse
import math
import os
import pickle

import numpy as np

from brepgen_tpu.data.dedup import dedup_solids
from brepgen_tpu.data.synthetic import make_dataset


def write_sharded(samples, out_dir):
    paths = []
    for i, data in enumerate(samples):
        uid = f"{i:08d}.pkl"
        shard = str(math.floor(i / 10000)).zfill(4)
        os.makedirs(os.path.join(out_dir, shard), exist_ok=True)
        path = os.path.join(out_dir, shard, uid)
        with open(path, "wb") as f:
            pickle.dump(data, f)
        paths.append(uid)
    return paths


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", type=str, default=None, help="STEP root dir (OCC backend)")
    p.add_argument("--output", type=str, required=True, help="parsed pkl output dir")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--option", type=str, default="abc",
                   choices=["abc", "deepcad", "furniture"])
    p.add_argument("--bit", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--uid_list", type=str, default=None,
                   help="file of STEP dirs/files to restrict extraction to "
                        "(written by the shard driver)")
    args = p.parse_args(argv)

    if args.synthetic:
        samples = make_dataset(args.synthetic, seed=args.seed)
        # whole-solid dedup (reference deduplicate_cad.py)
        keep = dedup_solids(samples, n_bits=args.bit)
        samples = [samples[i] for i in keep]
        uids = write_sharded(samples, args.output)
        rng = np.random.default_rng(args.seed)
        order = rng.permutation(len(uids))
        n_val = max(len(uids) // 10, 1)
        n_test = max(len(uids) // 10, 1)
        split = {
            "train": [uids[i] for i in order[: len(uids) - n_val - n_test]],
            "val": [uids[i] for i in order[len(uids) - n_val - n_test : len(uids) - n_test]],
            "test": [uids[i] for i in order[len(uids) - n_test :]],
        }
        split_path = f"{args.option}_data_split_{args.bit}bit.pkl"
        with open(split_path, "wb") as f:
            pickle.dump(split, f)
        print(f"wrote {len(uids)} solids to {args.output}; split -> {split_path}")
        return

    roots = None
    if args.uid_list:
        with open(args.uid_list) as f:
            roots = [line.strip() for line in f if line.strip()]

    # OCC-backed STEP extraction when pythonocc is installed; otherwise the
    # native reader covers B-spline-geometry B-reps (our own exports)
    try:
        from brepgen_tpu.geometry.occ_extract import process_step_dir

        process_step_dir(args.input, args.output, args.option, roots=roots)
        return
    except ImportError:
        pass
    print("pythonocc not installed: extracting with the native STEP reader "
          "(B-spline geometry subset)")
    n_ok = native_process_dir(args.input, args.output, roots=roots)
    print(f"extracted {n_ok} solids natively")


def native_process_dir(in_dir, out_dir, roots=None) -> int:
    from brepgen_tpu.geometry.native_extract import extract_step_file

    paths = []
    for base in roots if roots is not None else [in_dir]:
        if os.path.isfile(base):
            paths.append(base)
            continue
        for root, _dirs, files in os.walk(base):
            for f in sorted(files):
                if f.lower().endswith((".step", ".stp")):
                    paths.append(os.path.join(root, f))
    n_ok = 0
    for path in paths:
        try:
            data = extract_step_file(path)
        except Exception:  # noqa: BLE001 -- skip-on-failure parity
            continue
        if data is None:
            continue
        uid = data["uid"]
        try:
            shard = str(math.floor(int(uid.split(".")[0]) / 10000)).zfill(4)
        except ValueError:
            shard = ""
        os.makedirs(os.path.join(out_dir, shard), exist_ok=True)
        with open(os.path.join(out_dir, shard, uid), "wb") as f:
            pickle.dump(data, f)
        n_ok += 1
    return n_ok


if __name__ == "__main__":
    main()

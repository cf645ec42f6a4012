"""Evaluation CLIs: point sampling (reference ``sample_points.py``) and the
JSD/MMD/COV metric protocol (reference ``pc_metric.py``)."""

from __future__ import annotations

import argparse


def sample_points_main(argv=None):
    from brepgen_tpu.eval.pipeline import sample_points_dir

    p = argparse.ArgumentParser()
    p.add_argument("--in_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--workers", type=int, default=0)
    args = p.parse_args(argv)
    n = sample_points_dir(args.in_dir, args.out_dir, workers=args.workers)
    print(f"sampled {n} meshes")


def pc_metric_main(argv=None):
    from brepgen_tpu.eval.pipeline import run_metrics

    p = argparse.ArgumentParser()
    p.add_argument("--fake", type=str, required=True)
    p.add_argument("--real", type=str, required=True)
    p.add_argument("--n_test", type=int, default=1000)
    p.add_argument("--multi", type=int, default=3)
    p.add_argument("--times", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=4, help="device tile size")
    args = p.parse_args(argv)
    avg = run_metrics(
        args.fake, args.real, n_test=args.n_test, multi=args.multi,
        times=args.times, block=args.batch_size,
    )
    print("average result:")
    print(avg)


def dedup_main(argv=None):
    """Deduplicate parsed solids / primitives (reference deduplicate_*.py)."""
    import os
    import pickle

    from brepgen_tpu.data.dedup import dedup_primitives, solid_hash
    from brepgen_tpu.cli.build import uid_to_path

    from brepgen_tpu.data.discovery import discover_split

    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, required=True, help="parsed pkl dir")
    p.add_argument("--list", type=str, default=None,
                   help="split pkl (primitive dedup mode); omit for CAD dedup")
    p.add_argument("--edge", action="store_true")
    p.add_argument("--bit", type=int, default=6)
    p.add_argument("--option", type=str, default="abc",
                   choices=["abc", "deepcad", "furniture"])
    p.add_argument("--split_json", type=str, default="train_val_test_split.json",
                   help="official DeepCAD split (reference reads it from cwd)")
    args = p.parse_args(argv)

    if args.list is None:
        # CAD dedup (reference deduplicate_cad.py:23-72): discover the
        # dataset split, dedup ONLY the training list by 6-bit surface
        # hash, and preserve the official val/test lists untouched.
        train_uids, val, test = discover_split(
            args.data, args.option, split_json=args.split_json
        )
        seen, train = set(), []
        for uid in train_uids:
            with open(uid_to_path(args.data, uid), "rb") as fh:
                data = pickle.load(fh)
            h = solid_hash(data["surf_wcs"], args.bit)
            if h not in seen:
                seen.add(h)
                train.append(uid)
        out = f"{args.option}_data_split_{args.bit}bit.pkl"
        split = {"train": train, "val": val, "test": test}
        with open(out, "wb") as fh:
            pickle.dump(split, fh)
        print(
            f"{len(train)}/{len(train_uids)} unique train"
            f" (+{len(val)} val, +{len(test)} test) -> {out}"
        )
        return

    with open(args.list, "rb") as fh:
        uids = pickle.load(fh)["train"]
    samples = []
    for uid in uids:
        with open(uid_to_path(args.data, uid), "rb") as fh:
            samples.append(pickle.load(fh))
    arr = dedup_primitives(samples, "edge" if args.edge else "surface", args.bit)
    suffix = "_edge.pkl" if args.edge else "_surface.pkl"
    out = args.list.split(".")[0] + suffix
    with open(out, "wb") as fh:
        pickle.dump(arr, fh)
    print(f"{len(arr)} unique primitives -> {out}")

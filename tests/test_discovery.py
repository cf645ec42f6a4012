"""Real-dataset layout discovery + official-split preservation
(reference convert_utils.py:40-183, deduplicate_cad.py:23-72)."""

import json
import os
import pickle

import numpy as np
import pytest

from brepgen_tpu.data.discovery import (
    discover_split,
    load_abc_pkl,
    load_abc_step,
    load_furniture_pkl,
    load_furniture_step,
)


def _write_pkl(path, surf=None, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    data = {"surf_wcs": surf if surf is not None else rng.normal(size=(3, 4, 4, 3))}
    with open(path, "wb") as f:
        pickle.dump(data, f)


@pytest.fixture
def deepcad_tree(tmp_path):
    """Reference-layout tree: 10k-id shard folders + official split json."""
    root = tmp_path / "deepcad_parsed"
    ids = [0, 1, 2, 7, 10000, 10001, 20005]
    for i in ids:
        shard = str(i // 10000).zfill(4)
        _write_pkl(str(root / shard / f"{str(i).zfill(8)}.pkl"), seed=i)
    split = {
        "train": [f"{str(i // 10000).zfill(4)}/{str(i).zfill(8)}" for i in (0, 1, 2, 10000)],
        "validation": [f"0000/{str(7).zfill(8)}", f"0001/{str(10001).zfill(8)}"],
        "test": [f"0002/{str(20005).zfill(8)}"],
    }
    sj = tmp_path / "train_val_test_split.json"
    with open(sj, "w") as f:
        json.dump(split, f)
    return str(root), str(sj)


def test_load_abc_pkl_deepcad_split(deepcad_tree):
    root, sj = deepcad_tree
    train, val, test = load_abc_pkl(root, use_deepcad=True, split_json=sj)
    assert sorted(train) == ["00000000.pkl", "00000001.pkl", "00000002.pkl", "00010000.pkl"]
    assert sorted(val) == ["00000007.pkl", "00010001.pkl"]
    assert test == ["00020005.pkl"]


def test_load_abc_pkl_random_split(deepcad_tree):
    root, _ = deepcad_tree
    train, val, test = load_abc_pkl(root, use_deepcad=False, seed=0)
    assert len(train) + len(val) + len(test) == 7
    assert len(train) == 6  # 90% of 7 -> 6
    # deterministic for a fixed seed
    train2, val2, test2 = load_abc_pkl(root, use_deepcad=False, seed=0)
    assert (train, val, test) == (train2, val2, test2)


def test_dedup_main_preserves_official_split(deepcad_tree, monkeypatch, tmp_path):
    root, sj = deepcad_tree
    # make two train solids identical -> dedup should drop one
    dup = np.ones((2, 4, 4, 3))
    _write_pkl(os.path.join(root, "0000", "00000001.pkl"), surf=dup)
    _write_pkl(os.path.join(root, "0000", "00000002.pkl"), surf=dup)

    from brepgen_tpu.cli.eval_main import dedup_main

    monkeypatch.chdir(tmp_path)
    dedup_main(["--data", root, "--option", "deepcad", "--split_json", sj])
    with open(tmp_path / "deepcad_data_split_6bit.pkl", "rb") as f:
        out = pickle.load(f)
    assert len(out["train"]) == 3  # one duplicate removed
    assert sorted(out["val"]) == ["00000007.pkl", "00010001.pkl"]  # untouched
    assert out["test"] == ["00020005.pkl"]


def test_furniture_discovery_and_labels(tmp_path):
    root = tmp_path / "furniture"
    for cls in ("chair", "table"):
        for i in range(10):
            _write_pkl(str(root / cls / f"{cls}_{i}.pkl"), seed=i)
    train, val, test = load_furniture_pkl(str(root), seed=1)
    assert len(train) == 18 and len(val) == 1 and len(test) == 1
    assert all("/" in uid for uid in train)  # class/file.pkl tails

    from brepgen_tpu.cli.build import resolve_samples

    split_pkl = tmp_path / "furniture_split.pkl"
    with open(split_pkl, "wb") as f:
        pickle.dump({"train": train, "val": val, "test": test}, f)
    paths, labels = resolve_samples(str(root), str(split_pkl), "train")
    assert labels is not None and set(labels) <= {5, 9}  # chair=5, table=9
    assert all(os.path.exists(p) for p in paths)


def test_load_abc_step_layout(deepcad_tree):
    _, sj = deepcad_tree
    dirs = load_abc_step("/abc", use_deepcad=True, split_json=sj, n_chunks=3)
    assert f"/abc/abc_0000_step_v00/{str(7).zfill(8)}" in dirs
    assert f"/abc/abc_0001_step_v00/{str(10001).zfill(8)}" in dirs
    assert f"/abc/abc_0002_step_v00/{str(20005).zfill(8)}" in dirs
    assert len(dirs) == 7
    # unfiltered: every solid folder of every chunk
    dirs = load_abc_step("/abc", use_deepcad=False, n_chunks=2)
    assert len(dirs) == 20000
    assert dirs[0] == "/abc/abc_0000_step_v00/00000000"


def test_furniture_step_walk(tmp_path):
    root = tmp_path / "fsteps"
    os.makedirs(root / "chair")
    for n in ("a.step", "b.step", "c.txt"):
        (root / "chair" / n).write_text("x")
    assert len(load_furniture_step(str(root))) == 2


def test_discover_split_flat_fallback(tmp_path):
    root = tmp_path / "flat"
    for i in range(20):
        _write_pkl(str(root / f"solid_{i}.pkl"), seed=i)
    train, val, test = discover_split(str(root), "abc")
    assert len(train) == 18 and len(val) == 1 and len(test) == 1

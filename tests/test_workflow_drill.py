"""Reference-layout workflow drill (full command-chain parity).

Builds a synthetic dataset in the REFERENCE on-disk layouts — sharded
``deepcad_parsed/0000/<id>.pkl`` folders with the official
``train_val_test_split.json``, and a ``furniture_parsed/<class>/*.pkl``
class tree — then runs the reference's ENTIRE workflow through the parity
CLIs with no code edits (``/root/reference/README.md:30-94``):

  deduplicate_cad -> deduplicate_surfedge (surface + edge) ->
  vae (surface, edge) -> ldm x4 stages -> sample (cascade + export) ->
  sample_points -> pc_metric

Tiny models / 1-epoch budgets: asserts the chain wires together and every
artifact lands where the next command expects it, not model quality.
"""

import json
import os
import pickle

import numpy as np
import pytest
import yaml

from brepgen_tpu.data.schema import save_brep_pkl
from brepgen_tpu.data.synthetic import make_dataset


@pytest.fixture(scope="module")
def deepcad_tree(tmp_path_factory):
    """Sharded parsed tree + official-format split json, from synthetic
    solids saved under numeric DeepCAD-style uids."""
    root = tmp_path_factory.mktemp("drill")
    parsed = root / "deepcad_parsed"
    (parsed / "0000").mkdir(parents=True)
    ds = make_dataset(24, seed=0)
    # two exact duplicates so CAD dedup has something to remove
    ds[5] = dict(ds[0], uid=ds[5]["uid"])
    ds[6] = dict(ds[1], uid=ds[6]["uid"])
    uids = []
    for i, d in enumerate(ds):
        name = f"{i:08d}"
        save_brep_pkl(str(parsed / "0000" / f"{name}.pkl"), dict(d, uid=name))
        uids.append(f"0000/{name}")
    split = {
        "train": uids[:20],
        "validation": uids[20:22],
        "test": uids[22:],
    }
    with open(root / "train_val_test_split.json", "w") as f:
        json.dump(split, f)
    return root


def test_deepcad_workflow_chain(deepcad_tree):
    from brepgen_tpu.cli import eval_main, ldm_main, sample_main, vae_main
    from brepgen_tpu.eval.pipeline import sample_points_dir

    root = deepcad_tree
    cwd = os.getcwd()
    os.chdir(root)
    try:
        # --- deduplicate_cad (writes deepcad_data_split_6bit.pkl to cwd) ---
        eval_main.dedup_main([
            "--data", "deepcad_parsed", "--bit", "6", "--option", "deepcad",
            "--split_json", "train_val_test_split.json",
        ])
        assert os.path.exists("deepcad_data_split_6bit.pkl")
        with open("deepcad_data_split_6bit.pkl", "rb") as f:
            sp = pickle.load(f)
        # the two injected duplicates are deduped from train; official
        # val/test lists preserved untouched
        assert len(sp["train"]) == 18
        assert len(sp["val"]) == 2 and len(sp["test"]) == 2

        # --- deduplicate_surfedge (surface + edge VAE arrays) ---
        for extra in ([], ["--edge"]):
            eval_main.dedup_main([
                "--data", "deepcad_parsed", "--list",
                "deepcad_data_split_6bit.pkl", "--bit", "6",
                "--option", "deepcad", *extra,
            ])
        assert os.path.exists("deepcad_data_split_6bit_surface.pkl")
        assert os.path.exists("deepcad_data_split_6bit_edge.pkl")

        # --- VAE training from the dedup arrays ---
        log = str(root / "proj_log")
        for option, train_list in (
            ("surface", "deepcad_data_split_6bit_surface.pkl"),
            ("edge", "deepcad_data_split_6bit_edge.pkl"),
        ):
            vae_main.main([
                "--option", option, "--small", "--data", "deepcad_parsed",
                "--train_list", train_list,
                "--val_list", "deepcad_data_split_6bit.pkl",
                "--batch_size", "8", "--train_nepoch", "1",
                "--test_nepoch", "1", "--save_nepoch", "1",
                "--dir_name", log, "--env", f"vae_{option}",
            ])
            assert os.path.isdir(f"{log}/vae_{option}/epoch_1")

        # --- 4 LDM stages from the parsed tree + dedup split list ---
        common = [
            "--data", "deepcad_parsed", "--list", "deepcad_data_split_6bit.pkl",
            "--small", "--batch_size", "4", "--train_nepoch", "1",
            "--test_nepoch", "1", "--save_nepoch", "1",
            "--max_face", "10", "--max_edge", "8", "--num_workers", "0",
            "--dir_name", log,
            "--surfvae", f"{log}/vae_surface/epoch_1",
            "--edgevae", f"{log}/vae_edge/epoch_1",
        ]
        for stage in ("surfpos", "surfz", "edgepos", "edgez"):
            ldm_main.main(common + ["--option", stage, "--env", f"ldm_{stage}"])
            assert os.path.isdir(f"{log}/ldm_{stage}/epoch_1")

        # --- sampling through the yaml config path ---
        cfg = {
            "surfpos_weight": f"{log}/ldm_surfpos/epoch_1",
            "surfz_weight": f"{log}/ldm_surfz/epoch_1",
            "edgepos_weight": f"{log}/ldm_edgepos/epoch_1",
            "edgez_weight": f"{log}/ldm_edgez/epoch_1",
            "surfvae_weight": f"{log}/vae_surface/epoch_1",
            "edgevae_weight": f"{log}/vae_edge/epoch_1",
            "save_folder": str(root / "samples"),
            "batch_size": 2,
            "z_threshold": 0.2,
            "bbox_threshold": 0.08,
            "num_surfaces": 4,
            "num_edges": 3,
            "use_cf": False,
            "class_label": [],
        }
        with open(root / "cfg.yaml", "w") as f:
            yaml.safe_dump({"deepcad": cfg}, f)
        with open(root / "cfg.yaml") as f:
            eval_args = yaml.safe_load(f)["deepcad"]
        produced = sample_main.sample_loop(
            eval_args, max_batches=1, small=True, workers=2,
            step_overrides=dict(pndm_steps=10, pos_pndm_calls=8, ddpm_tail=4),
        )
        assert produced >= 0 and os.path.isdir(root / "samples")

        # --- eval: STL -> PLY -> JSD/MMD/COV (ground-truth STLs so the
        # metric chain always has clouds, independent of sample validity) ---
        from brepgen_tpu.geometry import construct_brep

        for split_name, idxs in (("real_stl", range(6)), ("fake_stl", range(6, 12))):
            os.makedirs(split_name, exist_ok=True)
            for i in idxs:
                with open(f"deepcad_parsed/0000/{i:08d}.pkl", "rb") as f:
                    d = pickle.load(f)
                solid = construct_brep(
                    d["surf_wcs"], d["edge_wcs"], d["faceEdge_adj"],
                    d["edgeCorner_adj"],
                )
                solid.write_stl(f"{split_name}/{i:08d}.stl")
        eval_main.sample_points_main(
            ["--in_dir", "real_stl", "--out_dir", "real_ply"]
        )
        eval_main.sample_points_main(
            ["--in_dir", "fake_stl", "--out_dir", "fake_ply"]
        )
        eval_main.pc_metric_main([
            "--fake", "fake_ply", "--real", "real_ply",
            "--n_test", "4", "--multi", "1", "--times", "2",
            "--batch_size", "2",
        ])
        assert os.path.exists("fake_ply_results.txt")
        with open("fake_ply_results.txt") as f:
            txt = f.read()
        assert "JSD" in txt and "MMD" in txt and "COV" in txt
    finally:
        os.chdir(cwd)


def test_furniture_layout_and_inflation(tmp_path):
    """Furniture class tree: labels derived from the class folder, train
    list inflated x50 (keyed on the dataset layout, not a size threshold)."""
    from brepgen_tpu.cli import ldm_main

    parsed = tmp_path / "furniture_parsed"
    ds = make_dataset(12, seed=3)
    classes = ["chair", "table", "lamp"]
    for i, d in enumerate(ds):
        cls = classes[i % 3]
        (parsed / cls).mkdir(parents=True, exist_ok=True)
        save_brep_pkl(str(parsed / cls / f"{cls}_{i:04d}.pkl"), d)

    # build the split list through the dedup CLI (furniture discovery path)
    from brepgen_tpu.cli import eval_main

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        eval_main.dedup_main([
            "--data", "furniture_parsed", "--bit", "6", "--option", "furniture",
        ])
        assert os.path.exists("furniture_data_split_6bit.pkl")

        args = ldm_main.get_args([
            "--data", "furniture_parsed", "--list", "furniture_data_split_6bit.pkl",
            "--option", "surfpos", "--max_face", "10", "--max_edge", "8",
            "--num_workers", "0", "--dir_name", str(tmp_path / "log"),
        ])
        samples, labels = ldm_main.load_filtered_samples(args, "train")
        assert labels is not None and len(samples) == len(labels)
        kept = len(set(samples))
        assert kept > 0 and len(samples) == 50 * kept  # x50 inflation
        assert set(labels) <= set(range(10))
    finally:
        os.chdir(cwd)

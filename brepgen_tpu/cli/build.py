"""Production-size model factories and data resolution for the CLIs."""

from __future__ import annotations

import math
import os
import pickle
from typing import List, Optional, Tuple

import jax.numpy as jnp

from brepgen_tpu.nn import (
    EdgeVAE,
    SurfVAE,
    make_edgepos_net,
    make_edgez_net,
    make_surfpos_net,
    make_surfz_net,
)

DENOISER_FACTORIES = {
    "surfpos": make_surfpos_net,
    "surfz": make_surfz_net,
    "edgepos": make_edgepos_net,
    "edgez": make_edgez_net,
}


def build_vae(option: str, dtype=jnp.float32):
    """Production VAE configs (reference trainer.py:20-30,146-157)."""
    if option == "surface":
        return SurfVAE(block_out_channels=(128, 256, 512, 512), dtype=dtype)
    if option == "edge":
        return EdgeVAE(block_out_channels=(128, 256, 512), dtype=dtype)
    raise ValueError(option)


def build_denoiser(option: str, use_cf: bool = False, dtype=jnp.float32, **kw):
    return DENOISER_FACTORIES[option](use_cf=use_cf, dtype=dtype, **kw)


def auto_remat(option: str, batch_size: int, max_face: int, max_edge: int) -> bool:
    """Layer remat policy for production training (the bf16-era GradScaler's
    TPU-native sibling is trading FLOPs for HBM, not loss scaling).

    Saved activations for the production encoder are ~B*S*768*2 bytes x
    ~150 tensors (12 layers x ~12 intermediates); past B*S ~= 32k that
    tops 7.5 GB and the edge stages (S = max_face*max_edge: deepcad 600,
    ABC 1500 — reference train_ldm.sh) blow the 16 GB v5e HBM at their
    reference batch sizes (edgez@128 measured 22.8 GB unremat'd,
    BASELINE.md). Per-layer remat keeps only layer boundaries live.
    """
    tokens = max_face * max_edge if option in ("edgepos", "edgez") else max_face
    return batch_size * tokens >= 32768


def uid_to_path(data_dir: str, uid: str) -> str:
    """DeepCAD/ABC pkls are sharded into 10k-id folders; furniture is flat
    (reference dataset.py:94-100)."""
    try:
        shard = str(math.floor(int(uid.split(".")[0]) / 10000)).zfill(4)
        return os.path.join(data_dir, shard, uid)
    except ValueError:
        return os.path.join(data_dir, uid)


def load_split_list(list_path: str, split: str) -> List[str]:
    with open(list_path, "rb") as f:
        return pickle.load(f)[split]


def resolve_samples(
    data_dir: str, list_path: str, split: str
) -> Tuple[List[str], Optional[List[int]]]:
    """Returns (paths, class_labels or None)."""
    uids = load_split_list(list_path, split)
    paths, labels = [], []
    furniture = False
    for uid in uids:
        paths.append(uid_to_path(data_dir, uid))
        try:
            int(uid.split(".")[0])
            labels.append(-1)
        except ValueError:
            furniture = True
            labels.append(_furniture_label(uid))
    return paths, (labels if furniture else None)


FURNITURE_LABELS = {
    "bathtub": 0, "bed": 1, "bench": 2, "bookshelf": 3, "cabinet": 4,
    "chair": 5, "couch": 6, "lamp": 7, "sofa": 8, "table": 9,
}


def _furniture_label(uid: str) -> int:
    return FURNITURE_LABELS[uid.split("/")[0]]

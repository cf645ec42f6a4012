"""Pack an orbax demo checkpoint directory into committable .npz files.

VERDICT r4 item 3: demo checkpoints were gitignored orbax trees and kept
getting wiped by workspace resets — which destroyed the evidence behind
BASELINE.md quality rows twice. This packs each stage's weights into one
compressed ``.npz`` (width-256 demo models are a few MB each) that is
committed with the round artifacts; ``load_params`` transparently loads
either format, so ``resample_demo.py --ckpt <packed_dir>`` reproduces
sampling/scoring from a fresh clone without retraining.

Usage: python scripts/pack_ckpt.py <orbax_ckpt_dir> <out_dir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from brepgen_tpu.train.checkpoint import load_params, save_params_npz

src, dst = sys.argv[1], sys.argv[2]
stages = sorted(
    d for d in os.listdir(src) if os.path.isdir(os.path.join(src, d))
)
if not stages:
    sys.exit(f"no stage checkpoints under {src}")
os.makedirs(dst, exist_ok=True)
for stage in stages:
    params = load_params(os.path.join(src, stage))
    path = save_params_npz(dst, params, stage)
    print(f"{stage}: {os.path.getsize(path) / 1e6:.1f} MB -> {path}")

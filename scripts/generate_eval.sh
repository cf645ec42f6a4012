#!/bin/bash
# Config #5 protocol: 3000-sample ABC generation + JSD/MMD/COV evaluation
# (BASELINE.json graded slice; reference README.md:90-94).
set -e
MODE=${1:-abc}
N=${2:-3000}
REAL_PCD=${3:?usage: generate_eval.sh MODE N REAL_PCD_DIR}
python sample.py --mode $MODE --num_samples $N --bf16
python sample_points.py --in_dir samples_$MODE --out_dir samples_${MODE}_pcd --workers 8
python pc_metric.py --fake samples_${MODE}_pcd --real $REAL_PCD

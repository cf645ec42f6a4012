#!/bin/bash
# Evaluate generated B-reps (parity with reference eval.sh).
python sample_points.py --in_dir $1 --out_dir $1_pcd --workers 8
python pc_metric.py --fake $1_pcd --real $2

#!/bin/bash
# Extract training data (parity with reference data_process/process.sh).
# OCC backend when pythonocc+occwl are installed:
#   python -m brepgen_tpu.cli.process_main --input STEP_DIR --output abc_parsed --option abc
# Synthetic analytic dataset (no CAD kernel needed):
python -m brepgen_tpu.cli.process_main --synthetic ${1:-1000} --output data_process/synthetic_parsed --option abc

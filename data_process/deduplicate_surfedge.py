"""Per-primitive dedup CLI (parity with reference data_process/deduplicate_surfedge.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from brepgen_tpu.cli.eval_main import dedup_main

if __name__ == "__main__":
    dedup_main()

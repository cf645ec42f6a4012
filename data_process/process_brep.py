"""Extraction CLI (parity path with reference data_process/process_brep.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from brepgen_tpu.cli.process_main import main

if __name__ == "__main__":
    main()

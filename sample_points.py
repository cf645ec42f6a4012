"""STL -> 2000-point PLY clouds (parity with reference ``sample_points.py``)."""

from brepgen_tpu.cli.eval_main import sample_points_main

if __name__ == "__main__":
    sample_points_main()

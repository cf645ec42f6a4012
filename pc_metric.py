"""JSD/MMD/COV evaluation (parity with reference ``pc_metric.py``)."""

from brepgen_tpu.cli.eval_main import pc_metric_main

if __name__ == "__main__":
    pc_metric_main()

"""Generate B-reps with the cascade (parity with reference ``sample.py``)."""

from brepgen_tpu.cli.sample_main import main

if __name__ == "__main__":
    main()

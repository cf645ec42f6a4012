"""Train a latent-diffusion stage (parity with reference ``ldm.py``)."""

from brepgen_tpu.cli.ldm_main import main

if __name__ == "__main__":
    main()

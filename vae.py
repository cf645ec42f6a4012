"""Train the surface / edge VAE (parity with reference ``vae.py``)."""

from brepgen_tpu.cli.vae_main import main

if __name__ == "__main__":
    main()

"""BrepGen-TPU: a TPU-native (JAX/XLA/Pallas) framework for generating CAD
B-reps with cascaded latent diffusion.

This is a from-scratch re-design of the capabilities of samxuxiang/BrepGen
(SIGGRAPH 2024, arXiv 2401.15563) for TPU hardware:

  * two KL-VAEs (2D surface / 1D edge) compressing UV-grid geometry,
  * four cascaded transformer denoisers generating face bboxes, face
    latents, edge bboxes and edge latents + vertices top-down,
  * diffusion schedulers (DDPM + PNDM) as pure-JAX `lax.scan` programs,
  * a device-resident sampling cascade with masked on-device dedup,
  * host-side geometry post-processing and B-rep assembly.

Layout:
  nn/          flax modules (VAEs, denoiser transformer)
  kernels/     Pallas TPU kernels (fused attention, chamfer)
  diffusion/   schedulers as pure functions + static per-step plans
  data/        pkl schema, synthetic B-rep fixtures, dataset assembly
  train/       jit/shard_map training loop, optax, orbax checkpoints
  sampling/    the 4-stage generation cascade
  postprocess/ vertex/edge merge, joint optimization, B-rep assembly
  geometry/    B-spline fitting, STEP/STL writers, optional OCC backend
  eval/        point sampling + JSD/MMD/COV metrics
  parallel/    mesh + sharding helpers
  cli/         command-line entry points (vae/ldm/sample/eval parity)
"""

__version__ = "0.1.0"

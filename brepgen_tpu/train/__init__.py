from brepgen_tpu.train.common import (
    TrainState,
    make_vae_optimizer,
    make_ldm_optimizer,
    masked_mse,
)
from brepgen_tpu.train import vae_train, ldm_train

__all__ = [
    "TrainState",
    "make_vae_optimizer",
    "make_ldm_optimizer",
    "masked_mse",
    "vae_train",
    "ldm_train",
]

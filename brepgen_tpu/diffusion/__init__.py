from brepgen_tpu.diffusion.ddpm import (
    DDPMTables,
    make_ddpm_tables,
    add_noise,
    ddpm_step,
    make_ddpm_plan,
    ddpm_scan,
)
from brepgen_tpu.diffusion.pndm import (
    make_pndm_plan,
    pndm_scan,
    PNDMPlan,
)

__all__ = [
    "DDPMTables",
    "make_ddpm_tables",
    "add_noise",
    "ddpm_step",
    "make_ddpm_plan",
    "ddpm_scan",
    "make_pndm_plan",
    "pndm_scan",
    "PNDMPlan",
]

from brepgen_tpu.diffusion.ddpm import (
    DDPMTables,
    make_ddpm_tables,
    add_noise,
    ddpm_step,
    make_ddpm_plan,
    ddpm_scan,
)
from brepgen_tpu.diffusion.ddim import make_ddim_plan, ddim_scan, DDIMStepCoeffs
from brepgen_tpu.diffusion.pndm import (
    make_pndm_plan,
    pndm_init_carry,
    pndm_scan,
    pndm_scan_carry,
    PNDMPlan,
)

__all__ = [
    "DDPMTables",
    "make_ddpm_tables",
    "add_noise",
    "ddpm_step",
    "make_ddpm_plan",
    "ddpm_scan",
    "make_ddim_plan",
    "ddim_scan",
    "DDIMStepCoeffs",
    "make_pndm_plan",
    "pndm_init_carry",
    "pndm_scan",
    "pndm_scan_carry",
    "PNDMPlan",
]

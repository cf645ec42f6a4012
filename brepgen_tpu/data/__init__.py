from brepgen_tpu.data.schema import BREP_KEYS, load_brep_pkl, save_brep_pkl, validate_brep
from brepgen_tpu.data.pad import pad_repeat, pad_zero
from brepgen_tpu.data import augment, assembly, synthetic

__all__ = [
    "BREP_KEYS",
    "load_brep_pkl",
    "save_brep_pkl",
    "validate_brep",
    "pad_repeat",
    "pad_zero",
    "augment",
    "assembly",
    "synthetic",
]

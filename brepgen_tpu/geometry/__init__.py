from brepgen_tpu.geometry.bspline import (
    fit_bspline_curve,
    fit_bspline_surface,
    eval_bspline_curve,
    eval_bspline_surface,
)
from brepgen_tpu.geometry.stl import write_stl, read_stl
from brepgen_tpu.geometry.ply import write_ply, read_ply
from brepgen_tpu.geometry.brep_build import construct_brep, SolidMesh
from brepgen_tpu.geometry.step_reader import load_brep, parse_step, validate_solid

__all__ = [
    "load_brep",
    "parse_step",
    "validate_solid",
    "fit_bspline_curve",
    "fit_bspline_surface",
    "eval_bspline_curve",
    "eval_bspline_surface",
    "write_stl",
    "read_stl",
    "write_ply",
    "read_ply",
    "construct_brep",
    "SolidMesh",
]

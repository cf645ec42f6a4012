from brepgen_tpu.eval.metrics import (
    pairwise_chamfer,
    compute_cov_mmd,
    jsd_between_point_cloud_sets,
    normalize_pc,
)

__all__ = [
    "pairwise_chamfer",
    "compute_cov_mmd",
    "jsd_between_point_cloud_sets",
    "normalize_pc",
]

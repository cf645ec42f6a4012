from brepgen_tpu.sampling.dedup import dedup_bboxes, dedup_edges_per_face
from brepgen_tpu.sampling.cascade import CascadeConfig, build_cascade, MODE_PRESETS

__all__ = [
    "dedup_bboxes",
    "dedup_edges_per_face",
    "CascadeConfig",
    "build_cascade",
    "MODE_PRESETS",
]

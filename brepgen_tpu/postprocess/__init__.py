from brepgen_tpu.postprocess.vertex_merge import detect_shared_vertex
from brepgen_tpu.postprocess.edge_merge import detect_shared_edge
from brepgen_tpu.postprocess.joint_opt import joint_optimize

__all__ = ["detect_shared_vertex", "detect_shared_edge", "joint_optimize"]

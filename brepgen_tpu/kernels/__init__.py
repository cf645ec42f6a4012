from brepgen_tpu.kernels.attention import fused_set_attention

__all__ = ["fused_set_attention"]

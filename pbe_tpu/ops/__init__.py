from pbe_tpu.ops.norms import GroupNorm32, LayerNormF32
from pbe_tpu.ops.attention import multi_head_attention
from pbe_tpu.ops import image

__all__ = ["GroupNorm32", "LayerNormF32", "multi_head_attention", "image"]

from nans_clip_tpu.ops.activations import ACT2FN, dropout, gelu_erf, quick_gelu
from nans_clip_tpu.ops.attention import (attention_pallas, attention_xla,
                                         fused_attention, merge_heads, mha,
                                         split_heads)
from nans_clip_tpu.ops.layernorm import layer_norm, pallas_layer_norm

__all__ = [
    "ACT2FN", "dropout", "gelu_erf", "quick_gelu",
    "attention_pallas", "attention_xla", "fused_attention",
    "merge_heads", "mha", "split_heads",
    "layer_norm", "pallas_layer_norm",
]

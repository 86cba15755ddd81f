from glimpseprune_tpu.ops.rope import (
    apply_rotary,
    mrope_cos_sin,
    rotate_half,
    vision_rope_cos_sin,
)
from glimpseprune_tpu.ops.attention import (
    causal_segment_attention,
    decode_attention,
    segment_attention,
)
from glimpseprune_tpu.ops.keep_policy import keep_scores_with_policy, select_keep_mask
from glimpseprune_tpu.ops.compaction import compact_sequence, CompactedState

__all__ = [
    "apply_rotary",
    "mrope_cos_sin",
    "rotate_half",
    "vision_rope_cos_sin",
    "causal_segment_attention",
    "decode_attention",
    "segment_attention",
    "keep_scores_with_policy",
    "select_keep_mask",
    "compact_sequence",
    "CompactedState",
]

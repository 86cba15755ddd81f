from glimpseprune_tpu.models.qwen2_5_vl.vision import VisionTransformer
from glimpseprune_tpu.models.qwen2_5_vl.language import TextDecoder

__all__ = ["VisionTransformer", "TextDecoder"]

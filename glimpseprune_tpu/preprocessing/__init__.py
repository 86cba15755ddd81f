from glimpseprune_tpu.preprocessing.image import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    normalize_image,
    patchify_image,
    preprocess_image,
    smart_resize,
)
from glimpseprune_tpu.preprocessing.geometry import (
    cu_seqlens_from_grid,
    get_window_index,
    segment_ids_from_cu_seqlens,
    vision_pos_ids,
    VisionGeometry,
    build_vision_geometry,
)
from glimpseprune_tpu.preprocessing.ref_masks import (
    bbox_grid_indices,
    ref_token_mask_from_bboxes,
)
from glimpseprune_tpu.preprocessing.mrope import get_rope_index

__all__ = [
    "OPENAI_CLIP_MEAN",
    "OPENAI_CLIP_STD",
    "normalize_image",
    "patchify_image",
    "preprocess_image",
    "smart_resize",
    "cu_seqlens_from_grid",
    "get_window_index",
    "segment_ids_from_cu_seqlens",
    "vision_pos_ids",
    "VisionGeometry",
    "build_vision_geometry",
    "bbox_grid_indices",
    "ref_token_mask_from_bboxes",
    "get_rope_index",
]

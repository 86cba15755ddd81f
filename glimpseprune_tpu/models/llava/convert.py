"""HF LLaVA checkpoint (CLIP tower + Llama + mm projector) -> Flax params.

Accepts the merged llava-1.5 state dict layout
(model.vision_tower.vision_tower.vision_model.*, model.mm_projector.*,
model.layers.*) or separate CLIPVisionModel / LlamaForCausalLM dicts.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from glimpseprune_tpu.config import ModelConfig
from glimpseprune_tpu.models.llava.gp_model import CLIPTowerConfig
from glimpseprune_tpu.models.qwen2_5_vl.convert import _dense, _np, convert_text


def _ln(sd, name) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _strip_llava_prefixes(sd: Mapping[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        nk = k
        for old, new in (
            ("model.vision_tower.vision_tower.vision_model.", "clip."),
            ("vision_tower.vision_model.", "clip."),
            ("vision_model.", "clip."),
            ("model.mm_projector.", "projector."),
            ("mm_projector.", "projector."),
            ("model.layers.", "language.layers."),
            ("model.embed_tokens.", "language.embed_tokens."),
            ("model.norm.", "language.norm."),
        ):
            if nk.startswith(old):
                nk = new + nk[len(old):]
                break
        out[nk] = v
    return out


def _clip_block(sd: Mapping[str, Any], b: str) -> Dict[str, Any]:
    return {
        "layer_norm1": _ln(sd, f"{b}.layer_norm1"),
        "layer_norm2": _ln(sd, f"{b}.layer_norm2"),
        "self_attn": {
            "q_proj": _dense(sd, f"{b}.self_attn.q_proj", bias=True),
            "k_proj": _dense(sd, f"{b}.self_attn.k_proj", bias=True),
            "v_proj": _dense(sd, f"{b}.self_attn.v_proj", bias=True),
            "out_proj": _dense(sd, f"{b}.self_attn.out_proj", bias=True),
        },
        "mlp": {
            "fc1": _dense(sd, f"{b}.mlp.fc1", bias=True),
            "fc2": _dense(sd, f"{b}.mlp.fc2", bias=True),
        },
    }


def convert_clip(sd: Mapping[str, Any], clip_cfg: CLIPTowerConfig) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    conv = _np(sd["clip.embeddings.patch_embedding.weight"])  # [out, in, kh, kw]
    p["patch_embedding"] = {"kernel": conv.transpose(2, 3, 1, 0)}
    p["class_embedding"] = _np(sd["clip.embeddings.class_embedding"])
    p["position_embedding"] = _np(sd["clip.embeddings.position_embedding.weight"])
    p["pre_layrnorm"] = _ln(sd, "clip.pre_layrnorm")
    for i in range(clip_cfg.depth):
        p[f"layers_{i}"] = _clip_block(sd, f"clip.encoder.layers.{i}")
    if "visual_projection.weight" in sd and clip_cfg.with_text_tower:
        # CDPruner relevance path (CLIPVisionModelWithProjection; reference
        # clip_encoder.py load_text_tower grafts visual_projection on)
        p["post_layernorm"] = _ln(sd, "clip.post_layernorm")
        p["visual_projection"] = {"kernel": _np(sd["visual_projection.weight"]).T}
    return p


def convert_clip_text(sd: Mapping[str, Any], clip_cfg: CLIPTowerConfig) -> Dict[str, Any]:
    """CLIPTextModelWithProjection state dict -> CLIPTextTower params
    (CDPruner's text relevance tower, reference clip_encoder.py:38-46)."""
    p: Dict[str, Any] = {
        "token_embedding": {
            "embedding": _np(sd["text_model.embeddings.token_embedding.weight"])
        },
        "position_embedding": _np(
            sd["text_model.embeddings.position_embedding.weight"]
        ),
        "final_layer_norm": _ln(sd, "text_model.final_layer_norm"),
        "text_projection": {"kernel": _np(sd["text_projection.weight"]).T},
    }
    for i in range(clip_cfg.text_depth):
        p[f"layers_{i}"] = _clip_block(sd, f"text_model.encoder.layers.{i}")
    return p


def convert_llava_state_dict(
    state_dict: Mapping[str, Any], cfg: ModelConfig, clip_cfg: CLIPTowerConfig
) -> Dict[str, Any]:
    sd = _strip_llava_prefixes(state_dict)
    params: Dict[str, Any] = {
        "visual": convert_clip(sd, clip_cfg),
        "text": convert_text(sd, cfg),
    }
    if "projector.0.weight" in sd:
        params["mm_projector_fc1"] = _dense(sd, "projector.0", bias=True)
        params["mm_projector_fc2"] = _dense(sd, "projector.2", bias=True)
    return params

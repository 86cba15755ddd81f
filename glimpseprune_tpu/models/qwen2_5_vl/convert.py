"""HF Qwen2.5-VL checkpoint -> Flax param pytree conversion.

Maps the torch state dict (either the 4.5x layout `model.visual.*` /
`model.language_model.*` or the older `visual.*` / `model.*`) onto our
module tree. Kernels are transposed (torch Linear stores [out, in]); the
Conv3d patch embed collapses to a Dense kernel because our patch rows are
already flattened in (C, T, H, W) order (preprocessing/image.py patchify).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from glimpseprune_tpu.config import ModelConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        try:
            return t.numpy()
        except TypeError:
            return t.float().numpy()
    return np.asarray(t)


def _dense(sd: Mapping[str, Any], name: str, bias: bool) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _norm(sd, name) -> Dict[str, np.ndarray]:
    return {"weight": _np(sd[f"{name}.weight"])}


def _strip_prefixes(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Normalize to {visual.*, language.*, lm_head.*} key space."""
    out = {}
    for k, v in sd.items():
        nk = k
        for old, new in (
            ("model.visual.", "visual."),
            ("model.language_model.", "language."),
            ("language_model.model.", "language."),
            ("model.layers.", "language.layers."),
            ("model.embed_tokens.", "language.embed_tokens."),
            ("model.norm.", "language.norm."),
        ):
            if nk.startswith(old):
                nk = new + nk[len(old):]
                break
        out[nk] = v
    return out


def convert_vision(sd: Mapping[str, Any], cfg: ModelConfig) -> Dict[str, Any]:
    v = cfg.vision
    p: Dict[str, Any] = {}
    pe = _np(sd["visual.patch_embed.proj.weight"])  # [hidden, C, tps, ps, ps]
    p["patch_embed"] = {"kernel": pe.reshape(v.hidden_size, -1).T}
    per_block = []
    for i in range(v.depth):
        b = f"visual.blocks.{i}"
        per_block.append({
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "attn": {
                "qkv": _dense(sd, f"{b}.attn.qkv", bias=True),
                "proj": _dense(sd, f"{b}.attn.proj", bias=True),
            },
            "mlp": {
                "gate_proj": _dense(sd, f"{b}.mlp.gate_proj", bias=True),
                "up_proj": _dense(sd, f"{b}.mlp.up_proj", bias=True),
                "down_proj": _dense(sd, f"{b}.mlp.down_proj", bias=True),
            },
        })
    import jax

    p["blocks"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_block)
    p["merger_ln_q"] = _norm(sd, "visual.merger.ln_q")
    p["merger_fc1"] = _dense(sd, "visual.merger.mlp.0", bias=True)
    p["merger_fc2"] = _dense(sd, "visual.merger.mlp.2", bias=True)
    return p


def convert_text(sd: Mapping[str, Any], cfg: ModelConfig) -> Dict[str, Any]:
    t = cfg.text
    p: Dict[str, Any] = {
        "embed_tokens": {"embedding": _np(sd["language.embed_tokens.weight"])},
        "norm": _norm(sd, "language.norm"),
    }
    # stacked-layer layout (leading [L] axis on every leaf) for lax.scan
    per_layer = []
    for i in range(t.num_hidden_layers):
        b = f"language.layers.{i}"
        per_layer.append({
            "input_layernorm": _norm(sd, f"{b}.input_layernorm"),
            "post_attention_layernorm": _norm(sd, f"{b}.post_attention_layernorm"),
            "self_attn": {
                "q_proj": _dense(sd, f"{b}.self_attn.q_proj", bias=t.attention_bias),
                "k_proj": _dense(sd, f"{b}.self_attn.k_proj", bias=t.attention_bias),
                "v_proj": _dense(sd, f"{b}.self_attn.v_proj", bias=t.attention_bias),
                "o_proj": _dense(sd, f"{b}.self_attn.o_proj", bias=False),
            },
            "mlp": {
                "gate_proj": _dense(sd, f"{b}.mlp.gate_proj", bias=False),
                "up_proj": _dense(sd, f"{b}.mlp.up_proj", bias=False),
                "down_proj": _dense(sd, f"{b}.mlp.down_proj", bias=False),
            },
        })
    import jax

    p["layers"] = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *per_layer)
    if not t.tie_word_embeddings:
        if "lm_head.weight" in sd:
            p["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}
        else:  # tied checkpoints loaded into untied config
            p["lm_head"] = {"kernel": _np(sd["language.embed_tokens.weight"]).T}
    return p


def convert_hf_state_dict(state_dict: Mapping[str, Any], cfg: ModelConfig) -> Dict[str, Any]:
    sd = _strip_prefixes(state_dict)
    return {"visual": convert_vision(sd, cfg), "text": convert_text(sd, cfg)}


def hf_config_to_model_config(hf_cfg, **gp_kwargs) -> ModelConfig:
    """Build our ModelConfig from a transformers Qwen2_5_VLConfig."""
    from glimpseprune_tpu.config import GPConfig, TextConfig, VisionConfig

    vc = hf_cfg.vision_config
    tc = hf_cfg.text_config if hasattr(hf_cfg, "text_config") else hf_cfg
    return ModelConfig(
        vision=VisionConfig(
            depth=vc.depth,
            hidden_size=vc.hidden_size,
            intermediate_size=vc.intermediate_size,
            num_heads=vc.num_heads,
            in_channels=getattr(vc, "in_channels", 3),
            patch_size=vc.patch_size,
            spatial_merge_size=vc.spatial_merge_size,
            temporal_patch_size=vc.temporal_patch_size,
            window_size=vc.window_size,
            fullatt_block_indexes=tuple(vc.fullatt_block_indexes),
            out_hidden_size=vc.out_hidden_size,
            hidden_act=getattr(vc, "hidden_act", "silu"),
        ),
        text=TextConfig(
            vocab_size=tc.vocab_size,
            hidden_size=tc.hidden_size,
            intermediate_size=tc.intermediate_size,
            num_hidden_layers=tc.num_hidden_layers,
            num_attention_heads=tc.num_attention_heads,
            num_key_value_heads=tc.num_key_value_heads,
            hidden_act=tc.hidden_act,
            rms_norm_eps=tc.rms_norm_eps,
            rope_theta=tc.rope_theta,
            mrope_section=tuple(tc.rope_scaling["mrope_section"]),
            tie_word_embeddings=getattr(hf_cfg, "tie_word_embeddings", False),
        ),
        gp=GPConfig(**gp_kwargs),
        image_token_id=hf_cfg.image_token_id,
        video_token_id=hf_cfg.video_token_id,
        vision_start_token_id=hf_cfg.vision_start_token_id,
        vision_end_token_id=hf_cfg.vision_end_token_id,
        eos_token_id=hf_cfg.eos_token_id if isinstance(hf_cfg.eos_token_id, int) else 151645,
        pad_token_id=getattr(hf_cfg, "pad_token_id", None) or 151643,
    )

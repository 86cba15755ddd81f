"""LLaVA-1.5 + GlimpsePrune: CLIP tower + Llama decoder + GP modules.

Mirror of the Qwen GP model for the LLaVA family (reference llava_gp/,
SURVEY.md §2.2). The glimpse machinery (le splice, harvest, fuser, keep
policy, compaction, resume, decode) is inherited unchanged from
Qwen2_5_VL_GP — it is vision-agnostic once image embeds arrive as a packed
[Pm, H] buffer. Differences handled here:

- vision: CLIP ViT-L penultimate patch features -> mlp2x_gelu projector,
  fixed 24x24 grid (no windows, no dynamic resolution)
- text: Llama (no qkv bias, 1-D rope = single mrope section with identical
  (t,h,w) position channels)
- fuser geometry: identity permutation, one global segment (reference
  llava_llama.py:130 "attention_mask=None because grid same")
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from glimpseprune_tpu.config import GPConfig, ModelConfig, TextConfig, VisionConfig
from glimpseprune_tpu.gp.fuser import make_fuser
from glimpseprune_tpu.models.layers import RMSNorm
from glimpseprune_tpu.models.llava.clip import CLIPTextTower, CLIPVisionTower
from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
from glimpseprune_tpu.models.qwen2_5_vl.language import TextDecoder


def llama_text_config(
    hidden_size=4096, intermediate_size=11008, num_hidden_layers=32,
    num_attention_heads=32, num_key_value_heads=32, vocab_size=32000,
    rms_norm_eps=1e-5, rope_theta=10000.0,
) -> TextConfig:
    head_dim = hidden_size // num_attention_heads
    return TextConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        num_key_value_heads=num_key_value_heads,
        rms_norm_eps=rms_norm_eps,
        rope_theta=rope_theta,
        mrope_section=(head_dim // 2,),  # 1-D rope
        attention_bias=False,
    )


@dataclass(frozen=True)
class CLIPTowerConfig:
    depth: int = 24
    hidden_size: int = 1024
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    image_size: int = 336
    feature_layer: int = -2
    # CDPruner text-conditioned relevance (reference llava_cdpruner loads the
    # CLIP text tower + projections next to the vision tower,
    # clip_encoder.py load_text_tower): off by default — enables the
    # text_tower/visual_projection params only when CDPruner fidelity is used
    with_text_tower: bool = False
    projection_dim: int = 768
    text_depth: int = 12
    text_hidden_size: int = 768
    text_num_heads: int = 12
    text_intermediate_size: int = 3072
    text_vocab_size: int = 49408
    text_max_positions: int = 77

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


def llava_config(
    clip: CLIPTowerConfig = CLIPTowerConfig(),
    text: TextConfig = None,
    gp: GPConfig = None,
) -> ModelConfig:
    """ModelConfig for the LLaVA family. `vision` reuses VisionConfig fields
    where they overlap (hidden/patch); CLIP-only knobs ride in LlavaConfig."""
    text = text or llama_text_config()
    gp = gp or GPConfig(
        selected_layers=(21,),
        reduce_layer=21,
        selected_visual_layers=(22, 16, 10, 4),
        attn_fuse_size=256,
        visual_cond_size=512,
        attn_fuse_num_heads=4,
        attn_fuse_global=True,
        le_layers=tuple(range(text.num_hidden_layers)),
        le_length=1,
    )
    vision = VisionConfig(
        depth=clip.depth,
        hidden_size=clip.hidden_size,
        intermediate_size=clip.intermediate_size,
        num_heads=clip.num_heads,
        patch_size=clip.patch_size,
        spatial_merge_size=1,
        temporal_patch_size=1,
        out_hidden_size=text.hidden_size,
    )
    return ModelConfig(
        vision=vision,
        text=text,
        gp=gp,
        image_token_id=31999,   # any reserved id: embeds are overwritten
        video_token_id=31998,
        vision_start_token_id=31997,
        vision_end_token_id=31996,
        eos_token_id=2,
        pad_token_id=0,
        model_family="llava",
    )


# keep the dataclass-style alias the package exports
LlavaConfig = llava_config


class Llava_GP(Qwen2_5_VL_GP):
    """LLaVA GP model: overrides vision; inherits the GP pipeline.

    `clip_cfg` carries CLIP-only geometry (image size, feature layer).
    vision_encode consumes [B, H, W, C] normalized pixels and returns the
    packed ([B*G*G, H_text], taps) buffers the inherited glimpse expects.
    """

    clip_cfg: CLIPTowerConfig = CLIPTowerConfig()

    def setup(self):
        c = self.cfg
        cc = self.clip_cfg
        self.visual = CLIPVisionTower(
            depth=cc.depth,
            hidden_size=cc.hidden_size,
            num_heads=cc.num_heads,
            intermediate_size=cc.intermediate_size,
            patch_size=cc.patch_size,
            image_size=cc.image_size,
            feature_layer=cc.feature_layer,
            tap_layers=tuple(c.gp.selected_visual_layers),
            with_projection=cc.with_text_tower,
            projection_dim=cc.projection_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if cc.with_text_tower:
            self.clip_text = CLIPTextTower(
                depth=cc.text_depth,
                hidden_size=cc.text_hidden_size,
                num_heads=cc.text_num_heads,
                intermediate_size=cc.text_intermediate_size,
                vocab_size=cc.text_vocab_size,
                max_positions=cc.text_max_positions,
                projection_dim=cc.projection_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
        self.mm_projector_fc1 = nn.Dense(
            c.text.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype
        )
        self.mm_projector_fc2 = nn.Dense(
            c.text.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype
        )
        self.text = TextDecoder(c.text, dtype=self.dtype, param_dtype=self.param_dtype)
        self.attn_fuser = make_fuser(c, dtype=self.dtype)
        if c.gp.has_le:
            self.learnable_embeddings = self.param(
                "learnable_embeddings",
                nn.initializers.normal(stddev=0.02),
                (len(c.gp.le_layers), c.gp.le_length, c.text.hidden_size),
                jnp.float32,
            )
            self.le_proj = nn.Dense(c.text.hidden_size, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
            if c.gp.le_norm_type == "rmsnorm":
                self.le_norm = RMSNorm(c.text.hidden_size, c.text.rms_norm_eps)
            else:
                self.le_norm = nn.LayerNorm(dtype=self.dtype)
            self.le_dropout = nn.Dropout(rate=c.gp.le_dropout_prob)

    def vision_encode(self, pixels, pos_ids=None, full_seg=None,
                      vis_valid=None, emit_importance: bool = False,
                      dense_attn: bool = False):
        """pixels [B, S, S, 3] -> (packed projected embeds [B*G*G, H], taps
        [, importance]). Importance = (cls_attention, keys, cls_attention)
        packed to [B*G*G, ...] — the LLaVA VisionZip dominant metric
        (reference llava_visionzip/main.py + clip_encoder hook); VScan's
        local/global scans both use the CLS map here.

        The Qwen-style geometry args (pos_ids/full_seg/vis_valid) are
        accepted and ignored so the inherited jitted pipelines can pass them
        positionally.
        """
        if emit_importance:
            feats, taps, (cls_attn, keys_mean) = self.visual(
                pixels, emit_importance=True
            )
        else:
            feats, taps = self.visual(pixels)
        b, n, d = feats.shape
        proj = self.mm_projector_fc1(feats)
        proj = nn.gelu(proj, approximate=False)
        proj = self.mm_projector_fc2(proj)
        packed = proj.reshape(b * n, -1)
        packed_taps = [t.reshape(b * n, -1) for t in taps]
        if emit_importance:
            imp = cls_attn.reshape(b * n)
            keys = keys_mean.reshape(b * n, -1)
            return packed, packed_taps, (imp, keys, imp)
        return packed, packed_taps

    def __call__(self, *args, **kwargs):
        # init/traversal path: touch the CDPruner text tower so its params
        # materialize (setup-defined linen modules only create params when
        # called during init)
        if self.clip_cfg.with_text_tower:
            self.clip_text(
                jnp.zeros((1, self.clip_cfg.text_max_positions), jnp.int32)
            )
        return super().__call__(*args, **kwargs)

    def cdpruner_relevance(self, pixels, clip_text_ids, text_valid=None):
        """Reference CDPruner query relevance (llava_cdpruner
        llava_arch.py:156-160): negated mean cosine similarity between each
        CLIP-projected patch embed and the CLIP text embeds of the question
        segments. Returns [B*N] packed scores (caller min-max normalizes in
        cdpruner_select).

        pixels [B, S, S, 3]; clip_text_ids [M, 77] zero-padded segments
        shared across the batch (reference embeds the batch's texts once,
        clip_encoder.py:77-87).
        """
        assert self.clip_cfg.with_text_tower, "build with with_text_tower=True"
        _, _, img_embeds = self.visual(pixels, emit_embeds=True)  # [B, N, C]
        txt = self.clip_text(clip_text_ids, text_valid)  # [M, C]
        in_ = img_embeds.astype(jnp.float32)
        in_ = in_ / jnp.maximum(jnp.linalg.norm(in_, axis=-1, keepdims=True), 1e-8)
        tn = txt.astype(jnp.float32)
        tn = tn / jnp.maximum(jnp.linalg.norm(tn, axis=-1, keepdims=True), 1e-8)
        rel = -jnp.einsum("bnc,mc->bnm", in_, tn).mean(-1)  # [B, N]
        return rel.reshape(-1)

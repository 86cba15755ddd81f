"""CLIP ViT-L vision tower (LLaVA-1.5's frozen encoder) with feature taps.

Architecture matches openai/clip-vit-large-patch14-336 as used by the
reference (llava/model/multimodal_encoder/clip_encoder.py): conv patch embed
+ CLS token + learned position embeddings, pre-norm blocks with quick-gelu
MLPs, penultimate-layer patch features for the projector (`feature_select`,
clip_encoder.py:35), plus hidden-state taps at `selected_visual_layers` for
the GP fuser (reference llava_gp encode_images, llava_llama.py:741-751).
Fixed 24x24 grid -> plain batched [B, 577, D] tensors, no packing needed.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class CLIPVisionConfig:
    pass  # sizes live in LlavaConfig.vision (see gp_model.py)


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emit_importance: bool = False, key_valid=None):
        b, s, _ = x.shape
        hd = self.hidden_size // self.num_heads
        kw = dict(use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Dense(self.hidden_size, name="q_proj", **kw)(x).reshape(b, s, self.num_heads, hd)
        k = nn.Dense(self.hidden_size, name="k_proj", **kw)(x).reshape(b, s, self.num_heads, hd)
        v = nn.Dense(self.hidden_size, name="v_proj", **kw)(x).reshape(b, s, self.num_heads, hd)
        scale = 1.0 / jnp.sqrt(jnp.float32(hd))
        logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32) * scale
        if self.causal:
            cm = jnp.tril(jnp.ones((s, s), dtype=bool))
            logits = jnp.where(cm[None, None], logits, -1e30)
        if key_valid is not None:
            logits = jnp.where(key_valid[:, None, None, :], logits, -1e30)
        probs = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhst,bthd->bshd", probs, v).reshape(b, s, self.hidden_size)
        out = nn.Dense(self.hidden_size, name="out_proj", **kw)(out)
        if emit_importance:
            # VisionZip (LLaVA): dominant ranking = CLS-query attention over
            # patches (reference llava_visionzip CLIP hook); keys for the
            # contextual merge metric
            cls_attn = probs[:, :, 0, 1:].astype(jnp.float32).mean(axis=1)  # [B, N]
            keys_mean = k[:, 1:].astype(jnp.float32).mean(axis=2)  # [B, N, hd]
            return out, (cls_attn, keys_mean)
        return out


class CLIPMLP(nn.Module):
    hidden_size: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Dense(self.intermediate_size, name="fc1", **kw)(x)
        h = h * nn.sigmoid(1.702 * h)  # quick_gelu
        return nn.Dense(self.hidden_size, name="fc2", **kw)(h)


class CLIPBlock(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emit_importance: bool = False):
        ln = dict(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        attn_out = CLIPAttention(self.hidden_size, self.num_heads,
                                 dtype=self.dtype, param_dtype=self.param_dtype,
                                 name="self_attn")(
            nn.LayerNorm(name="layer_norm1", **ln)(x), emit_importance
        )
        importance = None
        if emit_importance:
            attn_out, importance = attn_out
        x = x + attn_out
        x = x + CLIPMLP(self.hidden_size, self.intermediate_size, self.dtype,
                        self.param_dtype, name="mlp")(
            nn.LayerNorm(name="layer_norm2", **ln)(x)
        )
        if emit_importance:
            return x, importance
        return x


class CLIPTextBlock(nn.Module):
    """Pre-norm causal text block (HF CLIPTextModel encoder layer)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_valid=None):
        ln = dict(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        x = x + CLIPAttention(
            self.hidden_size, self.num_heads, causal=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name="self_attn",
        )(nn.LayerNorm(name="layer_norm1", **ln)(x), key_valid=key_valid)
        x = x + CLIPMLP(self.hidden_size, self.intermediate_size, self.dtype,
                        self.param_dtype, name="mlp")(
            nn.LayerNorm(name="layer_norm2", **ln)(x)
        )
        return x


class CLIPTextTower(nn.Module):
    """CLIPTextModelWithProjection: pooled text embeds for CDPruner relevance.

    Reference llava_cdpruner loads the CLIP text tower next to the vision
    tower (clip_encoder.py load_text_tower) and embeds the question in
    max_position_embeddings-sized segments (:77-87); the pooled output is the
    hidden state at the EOT position (HF convention: argmax over token ids),
    passed through text_projection.
    """

    depth: int = 12
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    vocab_size: int = 49408
    max_positions: int = 77
    projection_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_ids, text_valid=None):
        """text_ids [M, max_positions] (zero-padded segments) ->
        projected pooled embeds [M, projection_dim]."""
        m, s = text_ids.shape
        tok = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="token_embedding")(text_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (self.max_positions, self.hidden_size), self.param_dtype,
        )
        x = tok + pos[None, :s].astype(tok.dtype)
        for i in range(self.depth):
            x = CLIPTextBlock(
                self.hidden_size, self.num_heads, self.intermediate_size,
                self.dtype, self.param_dtype, name=f"layers_{i}",
            )(x, key_valid=text_valid)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="final_layer_norm")(x)
        # EOT pooling: position of the max token id (HF CLIP convention;
        # zero padding keeps the true EOT the argmax)
        eot = jnp.argmax(text_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return nn.Dense(self.projection_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="text_projection")(pooled)


class CLIPVisionTower(nn.Module):
    """Returns (patch features [B, G*G, D] from `feature_layer`, taps)."""

    depth: int = 24
    hidden_size: int = 1024
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    image_size: int = 336
    feature_layer: int = -2            # penultimate (llava default)
    tap_layers: Tuple[int, ...] = ()
    with_projection: bool = False      # CDPruner: visual_projection embeds
    projection_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, emit_importance: bool = False,
                 emit_embeds: bool = False):
        """pixels [B, H, W, C] normalized."""
        b = pixels.shape[0]
        g = self.image_size // self.patch_size
        x = nn.Conv(
            self.hidden_size,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embedding",
        )(pixels.astype(self.dtype))
        x = x.reshape(b, g * g, self.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.hidden_size,),
            self.param_dtype,
        )
        cls = jnp.broadcast_to(cls[None, None].astype(x.dtype), (b, 1, self.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (g * g + 1, self.hidden_size), self.param_dtype,
        )
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="pre_layrnorm")(x)

        feature_layer = self.feature_layer % self.depth
        taps: List[Optional[jnp.ndarray]] = [None] * len(self.tap_layers)
        features = None
        importance = None
        for i in range(self.depth):
            want_imp = emit_importance and i == feature_layer
            out = CLIPBlock(
                self.hidden_size, self.num_heads, self.intermediate_size,
                self.dtype, self.param_dtype, name=f"layers_{i}",
            )(x, emit_importance=want_imp)
            if want_imp:
                x, importance = out
            else:
                x = out
            if i == feature_layer:
                features = x[:, 1:]  # drop CLS (llava feature_select)
            if i in self.tap_layers:
                taps[self.tap_layers.index(i)] = x[:, 1:]
        if self.with_projection:
            # CDPruner relevance space (reference clip_encoder.py:92-94):
            # post_layernorm over the selected patch features, then the CLIP
            # visual_projection into the shared image-text embedding space
            embeds = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  name="post_layernorm")(features)
            embeds = nn.Dense(self.projection_dim, use_bias=False,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="visual_projection")(embeds)
        else:
            embeds = None
        out = (features, taps)
        if emit_importance:
            out = out + (importance,)
        if emit_embeds:
            out = out + (embeds,)
        return out

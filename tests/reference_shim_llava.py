"""Import the reference's *executable* LLaVA-1.5 GP implementation under the
installed transformers 4.57 (VERDICT round-2 item #1, "do the same for
llava_gp if its fork imports" — it does).

The reference (/root/reference/llava_gp) was written against transformers
4.51 and the vendored llava fork; 4.57 removed/renamed the pieces below.
Each patch is a 4.51->4.57 API seam or an offline-environment seam, NOT a
behavior change, with two documented exceptions (7, 8) that fix latent
upstream bugs on paths the reference itself never executes on GPU.

1. `LlamaFlashAttention2` / `LlamaSdpaAttention` were merged into
   `LlamaAttention` (llava_llama.py:398 subclasses FA2 only for __init__ —
   the GP forward :426-507 is self-contained). Alias both names pre-import.
2. 4.57 `LlamaAttention` lost `num_heads` / `num_key_value_heads` /
   `hidden_size` (llava_llama.py:447-449,505) — re-exposed as properties
   derived from the config, exactly the 4.51 values.
3. 4.57 `LlamaAttention` lost `self.rotary_emb` (position embeddings moved
   to the model). llava_llama.py:460 calls it with the 4.51 signature
   `(value_states, seq_len=)` expecting full [seq_len, dim] cos/sin tables;
   reimplemented here with the 4.51 default-rope math (theta, interleave).
4. 4.57 `apply_rotary_pos_emb` ignores `position_ids` (cos/sin arrive
   pre-gathered); llava_llama.py:464 passes full tables + position_ids in
   the 4.51 convention — the module-level name is rebound to the 4.51
   implementation (cos[position_ids] gather, unsqueeze head dim).
5. `_flash_attention_forward` was removed from the attention classes
   (llava_llama.py:501). Reimplemented in eager math with FA2 semantics:
   bottom-right-aligned causal + 2-D padding mask, [B, S, H, D] in/out.
6. 4.57 `LlamaDecoderLayer.forward` returns a bare tensor and renamed
   `past_key_value` -> `past_key_values`; the GP driver (llava_llama.py:
   1452-1462) calls layers with 4.51 kwargs (`output_attentions`,
   `q_indices`, `kv_mask`) and indexes `layer_outputs[0]/[1]/[-1]`.
   `LlamaDecoderLayer_GP.forward` is replaced with the 4.51 layer recipe
   (ln -> attn -> residual -> ln -> mlp -> residual, tuple return).
   `LlamaModel_GP.forward` (inherited, used by `llm_forward` for the
   post-reduction/vanilla/decode paths) likewise gets the 4.51 FA2 stack
   forward (2-D mask pass-through, llava_llama.py:948-951 semantics).
7. UPSTREAM BUG SEAM: `llm_forward_prefilling` (llava_llama.py:1650-1672)
   passes `cache_position=` to `llm_forward`, whose signature (:1624-1634)
   does not accept it -> TypeError on every vanilla prefill. The reference
   only ever runs this path through the separate vanilla llava fork on GPU,
   so the bug is latent there; here `llm_forward` is wrapped to tolerate
   (and ignore) `cache_position`, which is always None.
8. UPSTREAM BUG SEAM: with `use_ref_masks=True`, `_glimpse_forward`
   (llava_llama.py:1519-1522) builds `image_token_mask_logits` as a python
   LIST of [1, N] rows, but `_get_remain_masks` (:1124) indexes it
   `[:, -1]` -> TypeError. (The Qwen fork stacks correctly; this llava port
   missed it.) `_get_remain_masks` is wrapped to stack a list input into
   the [B, L, N] tensor the rest of the function expects.
9. `DynamicCache` lost the 4.51 surface the GP code touches directly:
   `key_cache`/`value_cache` lists (llava_llama.py:1183-1184,1262-1264),
   settable `seen_tokens` (:1261), `get_usable_length` (:1375),
   `get_max_length` (:1874) — re-exposed on a subclass injected as the
   module's `DynamicCache`.
10. Offline CLIP tower: `CLIPVisionTower.load_model` calls
    `*.from_pretrained` (clip_encoder.py:22,29-30) — zero egress here, so
    the clip_encoder module's HF entry points are redirected to a local
    registry of tiny configs (`register_local_clip`), producing a randomly
    initialized `CLIPVisionModel` instead of a downloaded one. The tower
    name must start with "openai" to pass build_vision_tower's check
    (multimodal_encoder/builder.py:9).

`openai` (imported at module scope by the reference's utils.py) is stubbed
because no judge is contacted by these tests.
"""

from __future__ import annotations

import functools
import importlib.machinery
import math
import sys
import types

_REF = "/root/reference"

# name -> transformers.CLIPVisionConfig for the offline tower registry
_LOCAL_CLIP: dict = {}
_LOCAL_TOWER_NAME = "openai/local-tiny-clip"


def register_local_clip(name: str, hf_vision_config) -> None:
    _LOCAL_CLIP[name] = hf_vision_config


def load_reference_llava_gp():
    """Import and patch the reference llava_gp module. Idempotent."""
    if _REF not in sys.path:
        sys.path.insert(0, _REF)

    if "openai" not in sys.modules:
        mod = types.ModuleType("openai")
        mod.OpenAI = object
        mod.__spec__ = importlib.machinery.ModuleSpec("openai", None)
        sys.modules["openai"] = mod

    import torch
    import torch.nn as nn
    import transformers.models.llama.modeling_llama as lm

    # -- (1) pre-import attention aliases
    if not hasattr(lm, "LlamaFlashAttention2"):
        lm.LlamaFlashAttention2 = lm.LlamaAttention
        lm.LlamaSdpaAttention = lm.LlamaAttention

    import llava_gp.model.language_model.llava_llama as ref

    if getattr(ref, "_shim_applied", False):
        return ref

    # -- (10) offline CLIP tower entry points
    import llava.model.multimodal_encoder.clip_encoder as ce

    class _LocalVisionConfig:
        @staticmethod
        def from_pretrained(name):
            return _LOCAL_CLIP[name]

    class _LocalVisionModel:
        @staticmethod
        def from_pretrained(name, device_map=None):
            from transformers import CLIPVisionModel

            return CLIPVisionModel(_LOCAL_CLIP[name]).eval()

    class _LocalImageProcessor:
        @staticmethod
        def from_pretrained(name):
            return None  # never used: pixels arrive pre-normalized

    ce.CLIPVisionConfig = _LocalVisionConfig
    ce.CLIPVisionModel = _LocalVisionModel
    ce.CLIPImageProcessor = _LocalImageProcessor

    # -- (2) 4.51 attribute surface on the GP attention class
    att = ref.LlamaFlashAttention2_GP
    if not hasattr(lm.LlamaAttention, "num_heads"):
        att.num_heads = property(lambda self: self.config.num_attention_heads)
        att.num_key_value_heads = property(
            lambda self: self.config.num_key_value_heads)
        att.hidden_size = property(lambda self: self.config.hidden_size)

    # -- (3) 4.51-style rotary tables (full [seq_len, dim] cos/sin)
    def _rope_tables(config, seq_len):
        dim = getattr(config, "head_dim", None) or (
            config.hidden_size // config.num_attention_heads)
        inv = 1.0 / (config.rope_theta ** (
            torch.arange(0, dim, 2, dtype=torch.float32) / dim))
        t = torch.arange(seq_len, dtype=torch.float32)
        freqs = torch.outer(t, inv)
        emb = torch.cat((freqs, freqs), dim=-1)
        return emb.cos(), emb.sin()

    def _rotary_451(config, x, seq_len=None):
        return _rope_tables(config, seq_len)

    att.rotary_emb = property(
        lambda self: functools.partial(_rotary_451, self.config))

    # -- (4) 4.51 apply_rotary_pos_emb (gathers cos[position_ids])
    def _rotate_half(x):
        x1 = x[..., : x.shape[-1] // 2]
        x2 = x[..., x.shape[-1] // 2:]
        return torch.cat((-x2, x1), dim=-1)

    def _apply_rotary_451(q, k, cos, sin, position_ids, unsqueeze_dim=1):
        cos = cos[position_ids].unsqueeze(unsqueeze_dim)
        sin = sin[position_ids].unsqueeze(unsqueeze_dim)
        q_embed = (q * cos) + (_rotate_half(q) * sin)
        k_embed = (k * cos) + (_rotate_half(k) * sin)
        return q_embed, k_embed

    ref.apply_rotary_pos_emb = _apply_rotary_451

    # -- (5) FA2-semantics attention in eager math
    def _flash_attention_forward(self, query_states, key_states, value_states,
                                 attention_mask, q_len, dropout=0.0):
        # [B, S, H, D] in (4.51 FA2 layout), [B, q_len, H, D] out
        q = query_states.transpose(1, 2)
        k = key_states.transpose(1, 2)
        v = value_states.transpose(1, 2)
        n_rep = q.shape[1] // k.shape[1]
        if n_rep > 1:
            k = k.repeat_interleave(n_rep, dim=1)
            v = v.repeat_interleave(n_rep, dim=1)
        skv = k.shape[2]
        scores = torch.matmul(q, k.transpose(-1, -2)) / math.sqrt(self.head_dim)
        min_v = torch.finfo(scores.dtype).min
        # bottom-right-aligned causal (flash-attn convention)
        qpos = torch.arange(skv - q_len, skv, device=scores.device)
        kpos = torch.arange(skv, device=scores.device)
        causal = kpos[None, :] <= qpos[:, None]
        scores = scores.masked_fill(~causal[None, None], min_v)
        if attention_mask is not None:  # 2-D [B, skv] padding mask
            pad = attention_mask[:, None, None, :skv].to(torch.bool)
            scores = scores.masked_fill(~pad, min_v)
        probs = torch.softmax(scores.float(), dim=-1).to(q.dtype)
        out = torch.matmul(probs, v)
        return out.transpose(1, 2)

    att._flash_attention_forward = _flash_attention_forward

    # -- (6a) 4.51 decoder-layer recipe with GP kwargs + tuple return
    def _layer_forward(self, hidden_states, attention_mask=None,
                       position_ids=None, past_key_value=None,
                       output_attentions=False, use_cache=False,
                       q_indices=None, kv_mask=None, **kwargs):
        residual = hidden_states
        h = self.input_layernorm(hidden_states)
        attn_out, attn_weights, present = self.self_attn(
            h, attention_mask=attention_mask, position_ids=position_ids,
            past_key_value=past_key_value, output_attentions=output_attentions,
            use_cache=use_cache, q_indices=q_indices, kv_mask=kv_mask,
        )
        h = residual + attn_out
        h = h + self.mlp(self.post_attention_layernorm(h))
        outputs = (h,)
        if output_attentions:
            outputs += (attn_weights,)
        if use_cache:
            outputs += (present,)
        return outputs

    ref.LlamaDecoderLayer_GP.forward = _layer_forward

    # -- (6b) 4.51 FA2 decoder-stack forward for llm_forward paths
    from transformers.modeling_outputs import BaseModelOutputWithPast

    def _model_forward(self, input_ids=None, attention_mask=None,
                       position_ids=None, past_key_values=None,
                       inputs_embeds=None, use_cache=None,
                       output_attentions=None, output_hidden_states=None,
                       return_dict=None, cache_position=None, **kwargs):
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        past_len = (past_key_values.get_seq_length()
                    if past_key_values is not None else 0)
        bsz, seq_len = inputs_embeds.shape[:2]
        if position_ids is None:
            position_ids = torch.arange(
                past_len, past_len + seq_len, device=inputs_embeds.device
            )[None].expand(bsz, -1)
        # FA2 mask rule (llava_llama.py:949-951): 2-D pass-through, None if
        # nothing is padded
        mask2d = None
        if attention_mask is not None and bool((attention_mask == 0).any()):
            mask2d = attention_mask
        h = inputs_embeds
        for layer in self.layers:
            out = layer(
                h, attention_mask=mask2d, position_ids=position_ids,
                past_key_value=past_key_values, output_attentions=False,
                use_cache=use_cache,
            )
            h = out[0]
        h = self.norm(h)
        return BaseModelOutputWithPast(
            last_hidden_state=h, past_key_values=past_key_values)

    ref.LlamaModel_GP.forward = _model_forward

    # -- (7) llm_forward tolerates the cache_position kwarg
    _orig_llm_forward = ref.LlavaLlamaForCausalLM_GP.llm_forward

    def _llm_forward_fixed(self, *args, cache_position=None, **kw):
        return _orig_llm_forward(self, *args, **kw)

    ref.LlavaLlamaForCausalLM_GP.llm_forward = _llm_forward_fixed

    # -- (8) _get_remain_masks tolerates the use_ref_masks list
    _orig_grm = ref.LlavaLlamaForCausalLM_GP._get_remain_masks

    def _grm_fixed(self, input_ids, attention_mask, image_token_mask_logits,
                   grid_hw):
        if isinstance(image_token_mask_logits, (list, tuple)):
            image_token_mask_logits = torch.stack(
                [t.reshape(-1) for t in image_token_mask_logits], dim=0
            )[:, None, :]  # [B, 1, N]
        return _orig_grm(self, input_ids, attention_mask,
                         image_token_mask_logits, grid_hw)

    ref.LlavaLlamaForCausalLM_GP._get_remain_masks = _grm_fixed

    # -- (9) 4.51-surface DynamicCache
    from transformers.cache_utils import DynamicCache

    class ShimLlavaCache(DynamicCache):
        """4.51-surface DynamicCache for the llava_gp fork: list-style
        key_cache/value_cache views tolerant of lazy layers, settable
        seen_tokens, get_usable_length/get_max_length."""

        def _filled(self):
            return [l for l in self.layers
                    if getattr(l, "keys", None) is not None]

        @property
        def key_cache(self):
            return [l.keys for l in self._filled()]

        @key_cache.setter
        def key_cache(self, tensors):
            for l, t in zip(self._filled(), tensors):
                l.keys = t

        @property
        def value_cache(self):
            return [l.values for l in self._filled()]

        @value_cache.setter
        def value_cache(self, tensors):
            for l, t in zip(self._filled(), tensors):
                l.values = t

        @property
        def seen_tokens(self):
            return self.get_seq_length()

        @seen_tokens.setter
        def seen_tokens(self, v):
            pass  # derived from layer key shapes in 4.57

        def get_usable_length(self, new_seq_length=None, layer_idx=0):
            return self.get_seq_length(layer_idx)

        def get_max_length(self):
            return None

        def crop(self, max_length):
            for l in self._filled():
                l.crop(max_length)

        def __iter__(self):
            for l in self._filled():
                yield (l.keys, l.values)

        def __len__(self):
            return len(self._filled())

    ref.DynamicCache = ShimLlavaCache
    ref.ShimLlavaCache = ShimLlavaCache

    ref._shim_applied = True
    return ref


def make_reference_llava_model(tiny_cfg, clip_cfg, seed: int = 0, **overrides):
    """Build the reference llava_gp torch model from our tiny ModelConfig +
    CLIPTowerConfig. The CLIP tower is constructed locally (seam 10) and
    load_model()ed so state_dict() carries real random weights.

    NOTE selected_visual_layers index translation: the reference indexes
    `hidden_states[i]` where index 0 is the pre-encoder embedding output
    (llava_llama.py:745), while our tap_layers index block outputs — so
    reference index = ours + 1.
    """
    import torch
    from transformers import CLIPVisionConfig

    ref = load_reference_llava_gp()

    hf_clip = CLIPVisionConfig(
        hidden_size=clip_cfg.hidden_size,
        intermediate_size=clip_cfg.intermediate_size,
        num_hidden_layers=clip_cfg.depth,
        num_attention_heads=clip_cfg.num_heads,
        image_size=clip_cfg.image_size,
        patch_size=clip_cfg.patch_size,
        hidden_act="quick_gelu",
    )
    register_local_clip(_LOCAL_TOWER_NAME, hf_clip)

    t, g = tiny_cfg.text, tiny_cfg.gp
    kw = dict(
        vocab_size=t.vocab_size,
        hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        num_key_value_heads=t.num_key_value_heads,
        rms_norm_eps=t.rms_norm_eps,
        rope_theta=t.rope_theta,
        pad_token_id=tiny_cfg.pad_token_id,
        eos_token_id=tiny_cfg.eos_token_id,
        tie_word_embeddings=t.tie_word_embeddings,
        attn_implementation="eager",  # dispatch key only; see dict patch
        # GP knobs
        selected_layers=list(g.selected_layers),
        use_attention_logits=g.use_attention_logits,
        attn_fuse_type=g.attn_fuse_type,
        attn_fuse_size=g.attn_fuse_size,
        attn_fuse_num_heads=g.attn_fuse_num_heads,
        attn_fuse_hidden_act=g.attn_fuse_hidden_act,
        selected_visual_layers=[i + 1 for i in g.selected_visual_layers],
        visual_cond_size=g.visual_cond_size,
        ori_attn_supervision=g.ori_attn_supervision,
        deep_supervision=g.deep_supervision,
        le_layers=list(g.le_layers),
        le_length=g.le_length,
        le_dropout_prob=g.le_dropout_prob,
        reduce_threshold=g.reduce_threshold,
        reduce_layer=g.reduce_layer,
        anchor_positions=list(g.anchor_positions),
        min_remain_num=g.min_remain_num,
        max_remain_ratio=g.max_remain_ratio,
        use_ref_masks=g.use_ref_masks,
        use_zero_masks=g.use_zero_masks,
        # llava multimodal wiring
        mm_vision_tower=_LOCAL_TOWER_NAME,
        mm_projector_type="mlp2x_gelu",
        mm_hidden_size=clip_cfg.hidden_size,
        mm_vision_select_layer=clip_cfg.feature_layer,
        mm_vision_select_feature="patch",
        tokenizer_padding_side="left",
    )
    kw.update(overrides)
    cfg = ref.LlavaConfig_GP(**kw)
    # the GP fork only registers flash_attention_2 (llava_llama.py:510);
    # route the valid "eager" key to the same GP class, then restore the
    # FA2 mask flow post-construction
    ref.LLAMA_ATTENTION_CLASSES_GP.setdefault(
        "eager", ref.LlamaFlashAttention2_GP)
    torch.manual_seed(seed)
    model = ref.LlavaLlamaForCausalLM_GP(cfg).eval()
    model.get_model().vision_tower.load_model()
    model.model._use_flash_attention_2 = True
    model.model._use_sdpa = False
    return model, cfg


def export_new_modules_state(model):
    """The fork's new_modules_gp.pt payload (llava_llama.py:644-650)."""
    state = {"attn_fuser": model.attn_fuser.state_dict()}
    state["learnable_embeddings"] = model.learnable_embeddings.detach()
    state["le_proj"] = model.le_proj.state_dict()
    state["le_norm"] = model.le_norm.state_dict()
    return state

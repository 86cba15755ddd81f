"""Import the reference's *executable* torch GP implementation under the
installed transformers 4.57 (VERDICT round-2 item #1).

The reference (/root/reference/transformers_gp) was written against
transformers 4.51; 4.57 removed/relocated a handful of names. This module
patches exactly those seams and imports the reference classes so the
differential tests can run the reference model on CPU and demand numeric
parity from the JAX stack.

What is patched and why (each is a 4.51->4.57 API move, not a behavior
change):

1. `Qwen2_5_VLFlashAttention2` / `Qwen2_5_VLSdpaAttention` were merged into
   `Qwen2_5_VLAttention` (same __init__ attribute surface: q/k/v/o_proj,
   rope_scaling, num_key_value_groups, ...). The reference subclasses them
   only for __init__; every GP forward is self-contained
   (model_gp.py:393-703). Alias both names to the merged class.
2. `transformers.image_utils.VideoInput` moved to
   `transformers.video_utils`.
3. `Qwen2_5_VLModel._update_causal_mask` was removed (masks now come from
   `create_causal_mask`). The GP code calls it at model_gp.py:1260,1683 to
   build the 4.51-style [B,1,q,kv] additive float mask; reimplemented here
   with identical semantics (0 keep / dtype-min drop, causal by
   cache_position, padding columns from the 2-D mask).
4. `get_rope_index` moved from the ForConditionalGeneration class onto
   `Qwen2_5_VLModel`; rebound so `self.get_rope_index` (model_gp.py:1963)
   resolves.
5. `DynamicCache` lost `.key_cache` / `.value_cache` / `._seen_tokens`
   (now `.layers[i].keys/.values`). `_reduce_tokens`
   (model_gp.py:1566,1644-1646) reads/overwrites those directly; a subclass
   re-exposes them as properties and is injected into the reference
   module's namespace.
6. `Qwen2_5_VLSdpaAttention_GP._cal_attn_weights` (model_gp.py:476-503)
   crashes upstream on an in-place broadcast add
   (`attn_weights += attention_mask_float`, [B,H,1,K] += [B,1,Q,K]) —
   the production path is FA2 whose `_cal_attn_weights`
   (model_gp.py:582-605) adds a pad-only [B,1,1,K] mask. We replace the
   sdpa version with the FA2 semantics (the pad-only row extracted from
   the 4-D causal mask's last query row — identical for left padding),
   so the CPU 'sdpa' run reproduces what the reference computes on GPU
   with flash_attention_2.

`pip install` of anything is not possible here; `openai` (imported at
module scope by the reference's utils.py) is stubbed because no judge is
contacted by these tests.
"""

from __future__ import annotations

import importlib.machinery
import math
import sys
import types

_REF = "/root/reference"


def load_reference_gp():
    """Import and patch the reference GP module. Returns the module.

    Idempotent; safe to call from several tests.
    """
    if _REF not in sys.path:
        sys.path.insert(0, _REF)

    # -- stub pip deps the reference pulls in at module scope but the
    # differential tests never exercise
    if "openai" not in sys.modules:
        mod = types.ModuleType("openai")
        mod.OpenAI = object
        mod.__spec__ = importlib.machinery.ModuleSpec("openai", None)
        sys.modules["openai"] = mod

    import torch
    import transformers.image_utils as _iu
    import transformers.models.qwen2_5_vl.modeling_qwen2_5_vl as hfm

    if not hasattr(_iu, "VideoInput"):  # moved to video_utils in 4.57
        from transformers.video_utils import VideoInput as _VI

        _iu.VideoInput = _VI

    if not hasattr(hfm, "Qwen2_5_VLFlashAttention2"):
        hfm.Qwen2_5_VLFlashAttention2 = hfm.Qwen2_5_VLAttention
        hfm.Qwen2_5_VLSdpaAttention = hfm.Qwen2_5_VLAttention

    import transformers_gp.models.qwen2_5_vl.model_gp as ref

    if getattr(ref, "_shim_applied", False):
        return ref

    # -- (3) 4.51-style additive causal mask builder
    def _update_causal_mask(
        self, attention_mask, input_tensor, cache_position, past_key_values,
        output_attentions=False,
    ):
        dtype = input_tensor.dtype
        min_v = torch.finfo(dtype).min
        bsz, q_len = input_tensor.shape[0], input_tensor.shape[1]
        if attention_mask is not None and attention_mask.dim() == 4:
            return attention_mask
        past = past_key_values.get_seq_length() if past_key_values is not None else 0
        # 4.51 target_length rule: the 2-D mask width IS the kv width when
        # given (the post-reduction resume passes a fresh arange
        # cache_position with an already-reduced mask, model_gp.py:1679-1685)
        if attention_mask is not None:
            kv_len = attention_mask.shape[-1]
        else:
            kv_len = past + q_len
        key_pos = torch.arange(kv_len, device=input_tensor.device)
        causal = key_pos[None, :] <= cache_position[:, None]  # [q, kv]
        mask = torch.full((q_len, kv_len), min_v, dtype=dtype, device=input_tensor.device)
        mask = mask.masked_fill(causal, 0.0)
        mask = mask[None, None].expand(bsz, 1, q_len, kv_len).clone()
        if attention_mask is not None:
            pad = attention_mask[:, None, None, :kv_len].to(dtype)
            mask = mask.masked_fill(pad == 0, min_v)
        return mask

    if not hasattr(ref.Qwen2_5_VLModel_GP, "_update_causal_mask"):
        ref.Qwen2_5_VLModel_GP._update_causal_mask = _update_causal_mask

    # -- (3b) 4.51-style *text* model forward. In 4.57 Qwen2_5_VLModel.forward
    # became the multimodal wrapper (visual + language_model); the GP text
    # model (embed_tokens/layers/norm built in Qwen2_5_VLModel_GP.__init__,
    # model_gp.py:776-792) needs the classic decoder-stack forward that
    # `llm_forward`/`llm_forward_prefilling` (model_gp.py:1832-1884) call.
    from transformers.modeling_outputs import BaseModelOutputWithPast

    def _text_forward(
        self, input_ids=None, attention_mask=None, position_ids=None,
        past_key_values=None, inputs_embeds=None, use_cache=None,
        output_attentions=None, output_hidden_states=None, return_dict=None,
        cache_position=None, **kwargs,
    ):
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        past_seen = past_key_values.get_seq_length() if past_key_values is not None else 0
        if cache_position is None:
            cache_position = torch.arange(
                past_seen, past_seen + inputs_embeds.shape[1], device=inputs_embeds.device
            )
        if position_ids is None:
            position_ids = cache_position.view(1, 1, -1).expand(3, inputs_embeds.shape[0], -1)
        causal_mask = self._update_causal_mask(
            attention_mask, inputs_embeds, cache_position, past_key_values, False
        )
        hidden = inputs_embeds
        pos_emb = self.rotary_emb(hidden, position_ids)
        for layer in self.layers:
            out = layer(
                hidden, attention_mask=causal_mask, position_ids=position_ids,
                past_key_value=past_key_values, output_attentions=False,
                use_cache=use_cache, cache_position=cache_position,
                position_embeddings=pos_emb,
            )
            hidden = out[0]
        hidden = self.norm(hidden)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=past_key_values
        )

    ref.Qwen2_5_VLModel_GP.forward = _text_forward

    # -- (4) rebind get_rope_index
    if not hasattr(ref.Qwen2_5_VL_GP_ForConditionalGeneration, "get_rope_index"):
        ref.Qwen2_5_VL_GP_ForConditionalGeneration.get_rope_index = (
            lambda self, *a, **k: hfm.Qwen2_5_VLModel.get_rope_index(self.model, *a, **k)
        )

    # -- (5) DynamicCache back-compat surface
    from transformers.cache_utils import DynamicCache

    class ShimDynamicCache(DynamicCache):
        """4.51-surface DynamicCache: list-style key_cache/value_cache views,
        settable _seen_tokens (derived in 4.57), and a crop() that tolerates
        lazy (never-updated) layers — generate() only fills layers up to
        reduce_layer before the GP model crops the le tokens back out
        (model_gp.py:1400-1411)."""

        def _filled(self):
            return [l for l in self.layers if getattr(l, "keys", None) is not None]

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
        def _seen_tokens(self):
            return self.get_seq_length()

        @_seen_tokens.setter
        def _seen_tokens(self, v):
            pass  # derived from layer key shapes in 4.57

        def crop(self, max_length):
            for l in self._filled():
                l.crop(max_length)

        def __iter__(self):
            for l in self._filled():
                yield (l.keys, l.values)

        def __len__(self):
            return len(self._filled())

    if not hasattr(DynamicCache, "key_cache"):
        ref.DynamicCache = ShimDynamicCache
    ref.ShimDynamicCache = ShimDynamicCache

    # -- (6) fixed sdpa harvest == FA2 harvest semantics
    def _cal_attn_weights_fixed(
        self, query_states, key_states, attention_mask=None, q_indices=None,
        kv_mask=None, use_attention_logits=False,
    ):
        bsz, nheads, _, head_dim = query_states.size()
        sel_q = query_states[list(range(bsz)), :, q_indices, :].view(bsz, nheads, 1, head_dim)
        w = torch.matmul(sel_q, key_states.transpose(-1, -2)) / math.sqrt(self.head_dim)
        if not use_attention_logits:
            if attention_mask is not None:
                # pad-only [B,1,1,K] term == FA2's convert_2d_to_4d_mask
                # (model_gp.py:596); the 4-D causal mask's LAST query row is
                # exactly the padding mask under left padding.
                if attention_mask.dim() == 4:
                    pad_row = attention_mask[:, :, -1:, :]
                else:
                    min_v = torch.finfo(w.dtype).min
                    pad_row = (1.0 - attention_mask[:, None, None, :].to(w.dtype)) * min_v
                w = w + pad_row.to(w.dtype)
            w = torch.log_softmax(w, dim=-1)
        if kv_mask is not None:
            w = w.squeeze(2).transpose(1, 2)  # [B, K, H]
            sel = w[kv_mask]  # [N, H]
            kv_length = kv_mask.sum(dim=-1)
            w = sel.split(kv_length.tolist(), dim=0)
        return w

    ref.Qwen2_5_VLSdpaAttention_GP._cal_attn_weights = _cal_attn_weights_fixed

    ref._shim_applied = True
    return ref


def make_reference_model(tiny_cfg, seed: int = 0, **overrides):
    """Build the reference GP torch model from our tiny ModelConfig.

    Mirrors glimpseprune_tpu.config.tiny_test_config so both stacks share
    one source of truth for shapes and GP knobs.
    """
    import torch

    ref = load_reference_gp()
    from transformers_gp.models.qwen2_5_vl.configuration import Qwen2_5_VL_GPConfig

    t, v, g = tiny_cfg.text, tiny_cfg.vision, tiny_cfg.gp
    kw = dict(
        vocab_size=t.vocab_size,
        hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        num_key_value_heads=t.num_key_value_heads,
        rms_norm_eps=t.rms_norm_eps,
        rope_theta=t.rope_theta,
        vision_config=dict(
            depth=v.depth, hidden_size=v.hidden_size, num_heads=v.num_heads,
            intermediate_size=v.intermediate_size, patch_size=v.patch_size,
            window_size=v.window_size, spatial_merge_size=v.spatial_merge_size,
            temporal_patch_size=v.temporal_patch_size,
            fullatt_block_indexes=list(v.fullatt_block_indexes),
            out_hidden_size=v.out_hidden_size,
        ),
        image_token_id=tiny_cfg.image_token_id,
        video_token_id=tiny_cfg.video_token_id,
        vision_start_token_id=tiny_cfg.vision_start_token_id,
        vision_end_token_id=tiny_cfg.vision_end_token_id,
        eos_token_id=tiny_cfg.eos_token_id,
        pad_token_id=tiny_cfg.pad_token_id,
        rope_scaling={"type": "mrope", "mrope_section": list(t.mrope_section)},
        tie_word_embeddings=t.tie_word_embeddings,
        attn_implementation="sdpa",
        # GP knobs
        selected_layers=list(g.selected_layers),
        use_attention_logits=g.use_attention_logits,
        attn_fuse_type=g.attn_fuse_type,
        attn_fuse_size=g.attn_fuse_size,
        attn_fuse_num_heads=g.attn_fuse_num_heads,
        attn_fuse_hidden_act=g.attn_fuse_hidden_act,
        attn_fuse_global=g.attn_fuse_global,
        selected_visual_layers=list(g.selected_visual_layers),
        visual_cond_size=g.visual_cond_size,
        ori_attn_supervision=g.ori_attn_supervision,
        deep_supervision=g.deep_supervision,
        le_layers=list(g.le_layers),
        le_length=g.le_length,
        le_dropout_prob=g.le_dropout_prob,
        le_norm_type=g.le_norm_type,
        reduce_threshold=g.reduce_threshold,
        reduce_layer=g.reduce_layer,
        anchor_positions=list(g.anchor_positions),
        min_remain_num=g.min_remain_num,
        max_remain_ratio=g.max_remain_ratio,
        use_ref_masks=g.use_ref_masks,
        use_zero_masks=g.use_zero_masks,
    )
    kw.update(overrides)
    cfg = Qwen2_5_VL_GPConfig(**kw)
    torch.manual_seed(seed)
    model = ref.Qwen2_5_VL_GP_ForConditionalGeneration(cfg).eval()
    return model, cfg


def export_new_modules_state(model):
    """The reference's new_modules_gp.pt payload (model_gp.py:941-952)."""
    state = {"attn_fuser": model.attn_fuser.state_dict()}
    if hasattr(model, "learnable_embeddings"):
        state["learnable_embeddings"] = model.learnable_embeddings.detach()
        state["le_proj"] = model.le_proj.state_dict()
        state["le_norm"] = model.le_norm.state_dict()
    return state


_TRAIN_MOD = None


def load_reference_train():
    """Import the reference's train_qwen_gp.py (loss classes + trainer args).

    The module imports trl / peft / qwen_vl_utils (and optionally datasets)
    at module scope; none of those are installed here and none are touched
    by the loss classes the differential tests exercise, so they are
    stubbed with inert placeholders. The GP model import seams come from
    load_reference_gp(). Idempotent.
    """
    global _TRAIN_MOD
    if _TRAIN_MOD is not None:
        return _TRAIN_MOD
    import importlib.util

    load_reference_gp()

    def _stub(name, attrs=()):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for a in attrs:
            setattr(m, a, type(a, (), {}))
        sys.modules[name] = m
        return m

    trl = _stub("trl", ("ModelConfig", "ScriptArguments", "TrlParser",
                        "get_peft_config"))
    trl.models = _stub("trl.models", ("unwrap_model_for_generation",))
    _stub("peft", ("PeftConfig", "get_peft_model", "PeftModel"))
    _stub("qwen_vl_utils", ("process_vision_info",))
    try:
        import datasets  # noqa: F401
    except ImportError:
        _stub("datasets")

    spec = importlib.util.spec_from_file_location(
        "ref_train_qwen_gp", f"{_REF}/train_qwen_gp.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_train_qwen_gp"] = mod
    spec.loader.exec_module(mod)
    _TRAIN_MOD = mod
    return mod


def _stub_module(name, attrs=()):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for a in attrs:
        setattr(m, a, type(a, (), {}))
    sys.modules[name] = m
    return m


_UTILS_MOD = None


def load_reference_utils():
    """Import the reference's root utils.py (bbox extract/IoU, LLMClient)."""
    global _UTILS_MOD
    if _UTILS_MOD is not None:
        return _UTILS_MOD
    import importlib.util

    _stub_module("openai", ("OpenAI",))
    spec = importlib.util.spec_from_file_location("ref_utils", f"{_REF}/utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _UTILS_MOD = mod
    return mod


_INFER_COT_MOD = None


def load_reference_infer_cot():
    """Import viscot_eval.infer_cot (metrics + protocol constants).

    The fork-model registry subpackage (torch model wrappers) and the
    vllm/openai judge deps are stubbed — the functions the differential
    tests exercise never touch them."""
    global _INFER_COT_MOD
    if _INFER_COT_MOD is not None:
        return _INFER_COT_MOD
    import importlib.util

    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    _stub_module("vllm", ("LLM", "SamplingParams"))
    _stub_module("openai", ("OpenAI",))
    try:
        import datasets  # noqa: F401
    except ImportError:
        _stub_module("datasets")
    if "viscot_eval.models" not in sys.modules:
        m = _stub_module("viscot_eval.models", ("BaseInferModel",))
        m.get_model = lambda *a, **k: None
    spec = importlib.util.spec_from_file_location(
        "viscot_eval.infer_cot", f"{_REF}/viscot_eval/infer_cot.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _INFER_COT_MOD = mod
    return mod

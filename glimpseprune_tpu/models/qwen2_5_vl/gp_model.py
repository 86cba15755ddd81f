"""Qwen2.5-VL + GlimpsePrune: the full TPU-native pruned-prefill model.

Orchestrates (reference call stack SURVEY.md §3.1, model_gp.py:1210-1742):
  vision_encode -> glimpse_encode (partial prefill + harvest + fuser)
  -> reduce_and_resume (keep policy + fixed-budget compaction + remaining
  layers) -> decode over the compacted KV cache.

TPU re-design highlights vs the reference:
- the glimpse token ("learnable embeddings") occupies host-reserved
  placeholder slots, so layer-0 splice = embedding overwrite and the
  post-glimpse trim folds into the same fixed-budget gather that prunes
  image tokens (reference gather-splices and crops the KV separately,
  model_gp.py:1121-1190, :1400-1411)
- all shapes static: prune = top-k ranks + one gather (ops/keep_policy,
  ops/compaction) instead of boolean indexing with data-dependent lengths
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import ModelConfig
from glimpseprune_tpu.gp.fuser import make_fuser
from glimpseprune_tpu.models.layers import RMSNorm
from glimpseprune_tpu.models.qwen2_5_vl.language import TextDecoder
from glimpseprune_tpu.models.qwen2_5_vl.vision import VisionTransformer
from glimpseprune_tpu.ops.compaction import (
    compaction_indices,
    gather_kv,
    gather_positions,
    gather_tokens,
)
from glimpseprune_tpu.ops.keep_policy import (
    keep_scores_with_policy,
    keep_scores_with_policy_grouped,
)
from glimpseprune_tpu.ops.rope import mrope_cos_sin


class GlimpseState(NamedTuple):
    """Everything needed to apply a (possibly delayed) selection."""

    input_ids: jnp.ndarray       # [B, S]
    embeds: jnp.ndarray          # [B, S, H] layer-0 embeddings (for RL
                                 # teacher-forcing; reference keeps
                                 # reduced_input_embeds, model_gp.py:1586)
    hidden: jnp.ndarray          # [B, S, H] at reduce_layer
    kv_k: jnp.ndarray            # [n_red, B, S, Hkv, D]
    kv_v: jnp.ndarray
    valid: jnp.ndarray           # [B, S]
    position_ids: jnp.ndarray    # [3, B, S]
    keep_base: jnp.ndarray       # [B, S] text-keep mask (valid minus le slots)
    img_slots: jnp.ndarray       # [B, N]
    img_valid: jnp.ndarray       # [B, N]
    img_group: Optional[jnp.ndarray]  # [B, N] per-image ids (multi-image rows)


class GlimpseOutputs(NamedTuple):
    logits: jnp.ndarray              # [B, 1, V] last position
    input_ids: jnp.ndarray           # [B, R]
    embeds: jnp.ndarray              # [B, R, H] reduced layer-0 embeddings
    valid: jnp.ndarray               # [B, R]
    position_ids: jnp.ndarray        # [3, B, R]
    kv_k: jnp.ndarray                # [L, B, R, Hkv, D]
    kv_v: jnp.ndarray
    mask_logits: jnp.ndarray         # [n_out, B, N]
    keep_img: jnp.ndarray            # [B, N]
    le_loss: Optional[jnp.ndarray]


def _slot_onehot(slots: jnp.ndarray, slot_valid: jnp.ndarray, s_len: int,
                 dtype) -> jnp.ndarray:
    """[B, N, S] one-hot selection (zeroed at invalid slots).

    TPU lowers scattered gathers/scatters of big float arrays terribly
    (tens of ms at [5k, 1280]-scale operands); the one-hot matmul form rides
    the MXU in well under a millisecond — same trick as ops/compaction.
    """
    oh = slots[..., None] == jnp.arange(s_len)[None, None, :]
    oh = oh & slot_valid[..., None]
    return oh.astype(dtype)


def _scatter_rows(dest: jnp.ndarray, slots: jnp.ndarray, src: jnp.ndarray,
                  slot_valid: jnp.ndarray) -> jnp.ndarray:
    """dest [B, S, ...] <- src [B, N, ...] at positions slots [B, N] where
    slot_valid; invalid slots leave dest untouched."""
    if dest.ndim == 3 and jnp.issubdtype(dest.dtype, jnp.floating):
        oh = _slot_onehot(slots, slot_valid, dest.shape[1], dest.dtype)
        covered = oh.sum(axis=1)  # [B, S] (0/1: slots are unique positions)
        scattered = jnp.einsum("bns,bnd->bsd", oh, src.astype(dest.dtype))
        return dest * (1 - covered)[..., None] + scattered
    bidx = jnp.arange(dest.shape[0])[:, None]
    cur = dest[bidx, slots]
    extra = dest.ndim - 2
    sv = slot_valid.reshape(slot_valid.shape + (1,) * extra)
    upd = jnp.where(sv, src.astype(dest.dtype), cur)
    return dest.at[bidx, slots].set(upd)


def _gather_rows(src: jnp.ndarray, slots: jnp.ndarray, slot_valid: jnp.ndarray,
                 fill=0) -> jnp.ndarray:
    """src [B, S, ...] -> [B, N, ...] at positions slots; invalid -> fill."""
    if src.ndim == 3 and jnp.issubdtype(src.dtype, jnp.floating) and fill == 0:
        oh = _slot_onehot(slots, slot_valid, src.shape[1], src.dtype)
        return jnp.einsum("bns,bsd->bnd", oh, src)
    bidx = jnp.arange(src.shape[0])[:, None]
    out = src[bidx, slots]
    extra = src.ndim - 2
    sv = slot_valid.reshape(slot_valid.shape + (1,) * extra)
    return jnp.where(sv, out, jnp.asarray(fill, dtype=src.dtype))


class Qwen2_5_VL_GP(nn.Module):
    """Flax module tree: visual tower + text decoder + GP new-modules."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.visual = VisionTransformer(
            c.vision, tap_layers=tuple(c.gp.selected_visual_layers),
            dtype=self.dtype, param_dtype=self.param_dtype,
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
            elif c.gp.le_norm_type == "layernorm":
                self.le_norm = nn.LayerNorm(dtype=self.dtype)
            else:
                raise ValueError(f"Unsupported le_norm_type {c.gp.le_norm_type!r}")
            self.le_dropout = nn.Dropout(rate=c.gp.le_dropout_prob)

    # ------------------------------------------------------------------ #
    # vision

    def vision_encode(self, patches, pos_ids, full_seg, vis_valid,
                      emit_importance: bool = False, dense_attn: bool = False):
        """Window-padded packed patches -> (merged embeds, taps[, importance])
        in slot order. emit_importance adds VisionZip scores (vision.py).
        dense_attn: static single-unpadded-image promise (runner computes it
        from the host-side geometry) — full-attention blocks then skip all
        segment masking in the flash kernel."""
        return self.visual(patches, pos_ids, full_seg, vis_valid,
                           emit_importance, dense_attn)

    # ------------------------------------------------------------------ #
    # le helpers

    def _le_vectors_all(self, training: bool) -> jnp.ndarray:
        """Projected glimpse embeddings scattered to their layers ->
        [num_layers, le_len, H] (zeros at non-le layers). One vectorized
        proj+norm+dropout replaces the reference's per-layer `_try_add_le`
        calls (model_gp.py:1055-1117)."""
        gp = self.cfg.gp
        le = self.learnable_embeddings.astype(self.dtype)  # [n_le, le_len, H]
        le = self.le_dropout(self.le_norm(self.le_proj(le)), deterministic=not training)
        out = jnp.zeros(
            (self.cfg.text.num_hidden_layers, gp.le_length, le.shape[-1]),
            dtype=self.dtype,
        )
        return out.at[jnp.asarray(gp.le_layers)].set(le)

    @staticmethod
    def _le_geometry(le_start: jnp.ndarray, S: int, le_length: int):
        """(offset [B, S] clipped index into le_len, inside [B, S] bool)."""
        pos = jnp.arange(S)[None, :]
        offset = pos - le_start[:, None]
        inside = (offset >= 0) & (offset < le_length)
        return jnp.clip(offset, 0, le_length - 1).astype(jnp.int32), inside

    # ------------------------------------------------------------------ #
    # glimpse prefill, phase 1: encode + predict mask logits

    def glimpse_encode(
        self,
        input_ids: jnp.ndarray,       # [B, S] le placeholder slots included
        valid: jnp.ndarray,           # [B, S]
        position_ids: jnp.ndarray,    # [3, B, S]
        image_embeds: jnp.ndarray,    # [Pm, H] packed, window order
        taps: jnp.ndarray,            # [n_taps, Pm, vit_hidden] window order
        packed_idx: jnp.ndarray,      # [B, N] row slot -> packed row (window->natural map folded in host-side)
        img_slots: jnp.ndarray,       # [B, N] sequence positions of image tokens
        img_valid: jnp.ndarray,       # [B, N]
        fuser_window_index: jnp.ndarray,
        fuser_reverse_index: jnp.ndarray,
        fuser_segment_ids: jnp.ndarray,
        fuser_pos_ids: jnp.ndarray,
        le_start: Optional[jnp.ndarray],  # [B] or None
        labels: Optional[jnp.ndarray] = None,
        ref_token_masks: Optional[jnp.ndarray] = None,  # [B, N] bool
        use_ref_masks: bool = False,
        training: bool = False,
        img_group: Optional[jnp.ndarray] = None,  # [B, N] multi-image ids
        return_harvest: bool = False,  # debug: also return the fuser input
    ) -> Tuple[jnp.ndarray, GlimpseState, Optional[jnp.ndarray]]:
        c = self.cfg
        gp = c.gp
        B, S = input_ids.shape

        embeds = self.text.embed(input_ids)
        img_embeds_rows = _gather_rows(
            jnp.broadcast_to(image_embeds[None], (B,) + image_embeds.shape),
            packed_idx, img_valid,
        )
        embeds = _scatter_rows(embeds, img_slots, img_embeds_rows, img_valid)

        inject_le = gp.has_le and not use_ref_masks and le_start is not None
        le_mask = jnp.zeros((B, S), dtype=bool)
        le_vecs = le_offset = le_inside = None
        if gp.has_le and le_start is not None and not inject_le:
            # use_ref_masks: the reference never appends le tokens at all
            # (model_gp.py:1256-1259 guards _append_le on `not use_ref_masks`),
            # but the host prep always reserves the slots — make them behave
            # as absent: invisible to attention, dropped from the reduction.
            _, le_reserved = self._le_geometry(le_start, S, gp.le_length)
            valid = valid & ~le_reserved
        if inject_le:
            le_vecs = self._le_vectors_all(training)  # [L, le_len, H]
            le_offset, le_inside = self._le_geometry(le_start, S, gp.le_length)
            le_mask = le_inside
            if 0 in gp.le_layers:
                # layer-0 splice: overwrite the placeholder-slot embeddings
                le_rows = le_vecs[0][le_offset]
                embeds = jnp.where(le_inside[..., None], le_rows.astype(embeds.dtype), embeds)
            q_index = le_start + gp.le_length - 1
        else:
            # no glimpse token: harvest from last valid position
            q_index = jnp.full((B,), S - 1, dtype=jnp.int32)

        cos, sin = mrope_cos_sin(
            position_ids, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
        )
        cos = cos.astype(self.dtype)
        sin = sin.astype(self.dtype)

        reduce_layer = min(gp.reduce_layer, c.text.num_hidden_layers - 1)
        harvest_layers = tuple(gp.selected_layers) if not use_ref_masks else ()

        x, (kv_k, kv_v), harvests = self.text.run_layers(
            embeds, cos, sin, valid,
            layer_start=0,
            layer_end=reduce_layer,
            le_vecs=le_vecs,
            le_offset=le_offset,
            le_inside=le_inside,
            harvest_layers=harvest_layers,
            q_index=q_index,
            use_attention_logits=gp.use_attention_logits,
        )
        hidden_at_reduce = x

        le_loss = None
        if labels is not None:
            # training runs every layer for the LM loss (model_gp.py:1289-1290)
            if reduce_layer < c.text.num_hidden_layers - 1:
                x, _, _ = self.text.run_layers(
                    x, cos, sin, valid,
                    layer_start=reduce_layer + 1,
                    le_vecs=le_vecs,
                    le_offset=le_offset,
                    le_inside=le_inside,
                    collect_kv=False,
                )
            x = self.text.final_norm(x)
            # chunked CE: the whole-sequence head materializes [B, S, V]
            # (9.3 GB of bf16 temps at the 16k operating point — OOM);
            # see TextDecoder.chunked_nll
            le_loss = self.text.chunked_nll(x, labels)

        # ---- predict mask logits
        harvest_dbg = None
        if use_ref_masks:
            assert ref_token_masks is not None
            mask_logits = jnp.where(ref_token_masks, jnp.inf, -jnp.inf)[None]
        elif gp.use_zero_masks:
            mask_logits = jnp.full((1, B, img_valid.shape[1]), -jnp.inf)
        else:
            rows = [harvests[l] for l in gp.selected_layers]  # [B, S, Hq] each
            attn_map = jnp.stack(rows, axis=2)  # [B, S, n_sel, Hq]
            attn_map = attn_map.reshape(B, S, -1)
            # log-softmax rows carry -inf at masked (non-image) positions;
            # the image positions we gather are always finite (the glimpse
            # token sees every image token), but the one-hot matmul gather
            # would turn 0 * -inf into NaN — clamp first
            attn_map = jnp.maximum(attn_map, -1e30)
            attn_map = _gather_rows(attn_map, img_slots, img_valid)  # [B, N, n_sel*Hq]
            harvest_dbg = attn_map  # fuser input (reference catted_attn_map,
                                    # model_gp.py:1200-1204) for differential tests
            taps_rows = [
                _gather_rows(
                    jnp.broadcast_to(taps[i][None], (B,) + taps[i].shape),
                    packed_idx, img_valid,
                )
                for i in range(taps.shape[0])
            ]
            mask_logits = self.attn_fuser(
                attn_map, taps_rows,
                fuser_window_index, fuser_reverse_index,
                fuser_segment_ids, fuser_pos_ids, img_valid,
                training=training,
                group_ids=img_group,
            )

        state = GlimpseState(
            input_ids=input_ids,
            embeds=embeds,
            hidden=hidden_at_reduce,
            kv_k=kv_k,
            kv_v=kv_v,
            valid=valid,
            position_ids=position_ids,
            keep_base=valid & ~le_mask,
            img_slots=img_slots,
            img_valid=img_valid,
            img_group=img_group,
        )
        if return_harvest:
            return mask_logits, state, le_loss, harvest_dbg
        return mask_logits, state, le_loss

    # ------------------------------------------------------------------ #
    # phase 2: keep policy + compaction + remaining layers

    def reduce_and_resume(
        self,
        state: GlimpseState,
        mask_logits: jnp.ndarray,  # [n_out, B, N]
        out_len: int,
        anchor_mask: Optional[jnp.ndarray] = None,
    ) -> GlimpseOutputs:
        c = self.cfg
        gp = c.gp
        B, S = state.input_ids.shape

        probs = jax.nn.sigmoid(mask_logits[-1].astype(jnp.float32))
        if gp.per_image_policy and state.img_group is not None:
            # opt-in extension: per-image threshold/cap/floor. The reference
            # applies the policy per ROW with all images concatenated
            # (model_gp.py:1495-1549; differential-tested).
            keep_img = keep_scores_with_policy_grouped(
                probs, state.img_valid, state.img_group,
                gp.reduce_threshold, gp.max_remain_ratio, gp.min_remain_num,
                anchor_mask,
            )
        else:
            keep_img = keep_scores_with_policy(
                probs, state.img_valid,
                gp.reduce_threshold, gp.max_remain_ratio, gp.min_remain_num,
                anchor_mask,
            )

        keep = _scatter_rows(state.keep_base, state.img_slots, keep_img, state.img_valid)
        plan = compaction_indices(keep, out_len)

        r_ids = gather_tokens(state.input_ids, plan, fill=c.pad_token_id)
        r_embeds = gather_tokens(state.embeds, plan)
        r_hidden = gather_tokens(state.hidden, plan)
        r_pos = gather_positions(state.position_ids, plan)
        r_valid = plan.valid
        r_k = gather_kv(state.kv_k, plan)
        r_v = gather_kv(state.kv_v, plan)

        # ---- remaining layers over the compacted sequence
        reduce_layer = min(gp.reduce_layer, c.text.num_hidden_layers - 1)
        x = r_hidden
        if reduce_layer < c.text.num_hidden_layers - 1:
            cos, sin = mrope_cos_sin(
                r_pos, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
            )
            x, (k2, v2), _ = self.text.run_layers(
                x, cos.astype(self.dtype), sin.astype(self.dtype), r_valid,
                layer_start=reduce_layer + 1,
            )
            kv_k = jnp.concatenate([r_k, k2], axis=0)
            kv_v = jnp.concatenate([r_v, v2], axis=0)
        else:
            kv_k, kv_v = r_k, r_v
        x = self.text.final_norm(x)
        # decode only needs the last position; projecting the full [B, R, V]
        # vocab block wastes ~R x vocab FLOPs + HBM (reference pays it via HF
        # forward; we slice before lm_head)
        logits = self.text.logits(x[:, -1:])

        return GlimpseOutputs(
            logits=logits,
            input_ids=r_ids,
            embeds=r_embeds,
            valid=r_valid,
            position_ids=r_pos,
            kv_k=kv_k,
            kv_v=kv_v,
            mask_logits=mask_logits,
            keep_img=keep_img,
            le_loss=None,
        )

    # ------------------------------------------------------------------ #
    # one-shot pruned prefill (inference product path)

    def glimpse_prefill(self, out_len: int, anchor_mask=None,
                        img_group=None, **encode_kwargs) -> GlimpseOutputs:
        encode_kwargs["img_group"] = img_group
        mask_logits, state, le_loss = self.glimpse_encode(**encode_kwargs)
        out = self.reduce_and_resume(state, mask_logits, out_len, anchor_mask)
        return out._replace(le_loss=le_loss)

    # ------------------------------------------------------------------ #
    # staged in-LLM dropping (PyramidDrop / VScan LLM stage)

    def staged_prefill(
        self,
        input_ids: jnp.ndarray,     # [B, S]
        valid: jnp.ndarray,         # [B, S]
        position_ids: jnp.ndarray,  # [3, B, S]
        image_embeds: jnp.ndarray,  # [Pm, H] packed window order
        packed_idx: jnp.ndarray,
        img_slots: jnp.ndarray,
        img_valid: jnp.ndarray,
        stages: Tuple[Tuple[int, float], ...],
        out_lens: Tuple[int, ...],
    ):
        """Text-guided staged image-token dropping (compressors/staged.py).

        At each (layer, ratio) stage: harvest the last token's attention row
        at that layer, keep the top-k image tokens, compact everything
        (hidden + accumulated KV), continue. Returns (logits, ids, valid,
        position_ids, kv_k, kv_v, is_img) on the final compacted geometry.
        """
        c = self.cfg
        B, S = input_ids.shape
        embeds = self.text.embed(input_ids)
        rows = _gather_rows(
            jnp.broadcast_to(image_embeds[None], (B,) + image_embeds.shape),
            packed_idx, img_valid,
        )
        embeds = _scatter_rows(embeds, img_slots, rows, img_valid)
        is_img = jnp.zeros((B, S), dtype=bool)
        is_img = _scatter_rows(is_img, img_slots, img_valid, img_valid)

        x = embeds
        pos = position_ids
        ks, vs = [], []
        layer_cursor = 0
        n_img0 = img_valid.sum(-1)  # [B]

        for (stage_layer, ratio), out_len in zip(stages, out_lens):
            cos, sin = mrope_cos_sin(
                pos, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
            )
            q_index = jnp.full((B,), x.shape[1] - 1, dtype=jnp.int32)
            x, (k_seg, v_seg), harv = self.text.run_layers(
                x, cos.astype(self.dtype), sin.astype(self.dtype), valid,
                layer_start=layer_cursor, layer_end=stage_layer,
                harvest_layers=(stage_layer,), q_index=q_index,
                use_attention_logits=False,
            )
            ks.append(k_seg)
            vs.append(v_seg)
            layer_cursor = stage_layer + 1

            probs = jnp.exp(harv[stage_layer].astype(jnp.float32)).mean(-1)  # [B, S]
            score = jnp.where(is_img & valid, probs, -jnp.inf)
            order = jnp.argsort(-score, axis=-1, stable=True)
            rank = jnp.argsort(order, axis=-1)
            k_keep = jnp.maximum((ratio * n_img0).astype(jnp.int32), 1)
            keep_img = (rank < k_keep[:, None]) & is_img & valid
            keep = (valid & ~is_img) | keep_img

            plan = compaction_indices(keep, out_len)
            x = gather_tokens(x, plan)
            input_ids = gather_tokens(input_ids, plan, fill=c.pad_token_id)
            pos = gather_positions(pos, plan)
            is_img = gather_tokens(is_img, plan, fill=False)
            valid = plan.valid
            kv = jnp.concatenate(ks, 0), jnp.concatenate(vs, 0)
            ks = [gather_kv(kv[0], plan)]
            vs = [gather_kv(kv[1], plan)]

        if layer_cursor < c.text.num_hidden_layers:
            cos, sin = mrope_cos_sin(
                pos, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
            )
            x, (k_seg, v_seg), _ = self.text.run_layers(
                x, cos.astype(self.dtype), sin.astype(self.dtype), valid,
                layer_start=layer_cursor,
            )
            ks.append(k_seg)
            vs.append(v_seg)
        x = self.text.final_norm(x)
        logits = self.text.logits(x[:, -1:])
        return (
            logits, input_ids, valid, pos,
            jnp.concatenate(ks, 0), jnp.concatenate(vs, 0), is_img,
        )

    # ------------------------------------------------------------------ #
    # vanilla paths (do_selection=False must reproduce the plain model)

    def vanilla_prefill(self, input_ids, valid, position_ids,
                        image_embeds=None, packed_idx=None, img_slots=None,
                        img_valid=None, logits_last_only: bool = False):
        c = self.cfg
        embeds = self.embed_with_images(
            input_ids, image_embeds, packed_idx, img_slots, img_valid)
        cos, sin = mrope_cos_sin(
            position_ids, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
        )
        x, (kv_k, kv_v), _ = self.text.run_layers(
            embeds, cos.astype(self.dtype), sin.astype(self.dtype), valid
        )
        x = self.text.final_norm(x)
        # last_only matches generation use (and the pruned path's [B,1,V]
        # resume logits) — full [B,S,V] logits cost ~S*H*V extra FLOPs that
        # a generate() baseline never pays
        return self.text.logits(x[:, -1:] if logits_last_only else x), kv_k, kv_v

    def completion_logits(self, prompt_embeds, prompt_valid, prompt_pos,
                          completion_ids, completion_valid, completion_pos):
        """Teacher-forcing over [reduced prompt embeds ; completion tokens]:
        the GRPO policy/reference logprob forward over the *pruned* prompt
        (reference :1273-1303 left-repads reduced embeds + completions)."""
        c = self.cfg
        ce = self.text.embed(completion_ids)
        embeds = jnp.concatenate([prompt_embeds, ce], axis=1)
        valid = jnp.concatenate([prompt_valid, completion_valid], axis=1)
        pos = jnp.concatenate([prompt_pos, completion_pos], axis=2)
        cos, sin = mrope_cos_sin(
            pos, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
        )
        x, _, _ = self.text.run_layers(
            embeds, cos.astype(self.dtype), sin.astype(self.dtype), valid,
            collect_kv=False,
        )
        return self.text.logits(self.text.final_norm(x))

    def completion_logprobs(self, prompt_embeds, prompt_valid, prompt_pos,
                            completion_ids, completion_valid, completion_pos):
        """completion_logits + token-logprob gather in one pass, but (a) the
        head runs only on the T completion-predicting positions (not the
        R+T full sequence — ~R/T x fewer head FLOPs at R~1.4k, T~64) and
        (b) per-C-token chunks never materialize [B, T, V] logits
        (TextDecoder.chunked_token_logprobs). The GRPO policy/reference
        logprob forward (reference train_qwen_gp.py:1273-1339)."""
        c = self.cfg
        ce = self.text.embed(completion_ids)
        embeds = jnp.concatenate([prompt_embeds, ce], axis=1)
        valid = jnp.concatenate([prompt_valid, completion_valid], axis=1)
        pos = jnp.concatenate([prompt_pos, completion_pos], axis=2)
        cos, sin = mrope_cos_sin(
            pos, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
        )
        x, _, _ = self.text.run_layers(
            embeds, cos.astype(self.dtype), sin.astype(self.dtype), valid,
            collect_kv=False,
        )
        x = self.text.final_norm(x)
        r = prompt_embeds.shape[1]
        # hidden at position r-1 predicts completion token 0, etc.
        return self.text.chunked_token_logprobs(
            x[:, r - 1 : -1], completion_ids
        )

    def text_prefill_logits(self, input_ids, valid, position_ids):
        """Teacher-forcing logits over a (possibly mixed prompt+completion)
        token sequence — the GRPO policy/reference logprob forward
        (reference train_qwen_gp.py:1273-1339). All positions projected."""
        c = self.cfg
        embeds = self.text.embed(input_ids)
        cos, sin = mrope_cos_sin(
            position_ids, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
        )
        x, _, _ = self.text.run_layers(
            embeds, cos.astype(self.dtype), sin.astype(self.dtype), valid,
            collect_kv=False,
        )
        return self.text.logits(self.text.final_norm(x))

    def prefill_embeds(self, embeds, valid, position_ids):
        """Full-depth prefill over precomputed embeddings (compressed seqs)."""
        c = self.cfg
        cos, sin = mrope_cos_sin(
            position_ids, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
        )
        x, (kv_k, kv_v), _ = self.text.run_layers(
            embeds, cos.astype(self.dtype), sin.astype(self.dtype), valid
        )
        x = self.text.final_norm(x)
        return self.text.logits(x[:, -1:]), kv_k, kv_v

    def decode_chunk(self, first_token, last_pos, k_cache, v_cache, kv_valid,
                     write_start, rng, n_steps: int, eos_token_id: int,
                     temperature: float = 0.0):
        """Decode n_steps tokens fully on device (one lax.scan).

        Amortizes per-step dispatch (the reference pays a python/host hop per
        HF generate step; over the axon tunnel that is ~28ms each — a
        measured host-looped step is ~4 s). Greedy when temperature == 0
        else categorical sampling. Returns
        (tokens [B, n_steps], done [B], k_cache, v_cache, kv_valid).

        The (step x layer) loop is ONE FLAT scan of length n_steps*L, not a
        scan-of-scans: XLA's copy insertion gives each KV cache carried
        through NESTED while loops a defensive full copy (measured +1 whole
        cache of HBM per buffer at any batch — the difference between
        unpruned decode B=4 fitting a 16 GB chip or not), while a single
        while loop with read-before-write layers aliases clean. Layer
        params are gathered per iteration (dynamic_index over the stacked
        tree — the same HBM traffic scan-xs streaming costs); embed runs at
        l==0 and head+sample at l==L-1 under lax.cond, so per-step work is
        unchanged.
        """
        c = self.cfg
        td = self.text
        B = first_token.shape[0]
        L = c.text.num_hidden_layers
        from glimpseprune_tpu.models.qwen2_5_vl.language import _layer_decode

        toks0 = jnp.zeros((B, n_steps), first_token.dtype)
        x0 = td.embed(first_token[:, None]).astype(self.dtype)

        def body(carry, i):
            tok, x, done, kc, vc, kvv, key, toks = carry
            l = i % L
            step = i // L
            widx = write_start + step
            pos = (last_pos + 1 + step)[:, :, None]  # [3, B, 1]
            cos, sin = mrope_cos_sin(
                pos, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
            )
            # l==0 work runs unconditionally — the embed gather is [B,1,H]
            # and the kvv bit-set is idempotent across layers of a step — a
            # lax.cond here costs more than the work it would skip
            xe = td.embed(tok[:, None]).astype(self.dtype)
            x = jnp.where(l == 0, xe, x)
            kvv = kvv.at[:, widx].set(True)
            pl = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, l, axis=0, keepdims=False),
                td.layers,
            )
            x, kc, vc = _layer_decode(
                c.text, pl, l, x, cos.astype(self.dtype), sin.astype(self.dtype),
                kc, vc, kvv, widx, self.dtype,
            )

            def finish(tok, done, key, toks):
                logits = td.logits(td.final_norm(x))
                key, sub = jax.random.split(key)
                if temperature and temperature > 0:
                    nxt = jax.random.categorical(
                        sub, logits[:, -1].astype(jnp.float32) / temperature,
                        axis=-1,
                    ).astype(first_token.dtype)
                else:
                    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(first_token.dtype)
                nxt = jnp.where(done, eos_token_id, nxt)
                # toks[:, s] = the token EMITTED at step s (the input token)
                toks = jax.lax.dynamic_update_slice(
                    toks, tok[:, None], (jnp.int32(0), step))
                return nxt, done | (nxt == eos_token_id), key, toks

            tok, done, key, toks = jax.lax.cond(
                l == L - 1, finish,
                lambda tok, done, key, toks: (tok, done, key, toks),
                tok, done, key, toks,
            )
            return (tok, x, done, kc, vc, kvv, key, toks), None

        done0 = first_token == eos_token_id
        carry0 = (first_token, x0, done0, k_cache, v_cache, kv_valid, rng, toks0)
        (tok, _, done, kc, vc, kvv, _, toks), _ = jax.lax.scan(
            body, carry0, jnp.arange(n_steps * L)
        )
        # the final carried token is the next candidate, returned for chaining
        return toks, tok, done, kc, vc, kvv

    def decode_step(self, input_ids, position_ids, k_cache, v_cache, kv_valid, write_idx):
        """input_ids [B, S_new], position_ids [3, B, S_new]."""
        c = self.cfg
        cos, sin = mrope_cos_sin(
            position_ids, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
        )
        return self.text.decode_step(
            input_ids, cos.astype(self.dtype), sin.astype(self.dtype),
            k_cache, v_cache, kv_valid, write_idx,
        )

    def embed_with_images(self, input_ids, image_embeds=None, packed_idx=None,
                          img_slots=None, img_valid=None):
        """Token embeddings with image rows scattered in (the vanilla
        prefill's input construction, exposed for chunked prefill)."""
        embeds = self.text.embed(input_ids)
        if image_embeds is not None:
            B = input_ids.shape[0]
            rows = _gather_rows(
                jnp.broadcast_to(image_embeds[None], (B,) + image_embeds.shape),
                packed_idx, img_valid,
            )
            embeds = _scatter_rows(embeds, img_slots, rows, img_valid)
        return embeds

    def prefill_chunk(self, chunk_embeds, position_ids, k_cache, v_cache,
                      kv_valid, write_idx, chunk_valid, logit_index):
        """One chunked-prefill step: C pre-scattered token embeddings
        against the (partially filled) decode cache; returns logits [B,1,V]
        at chunk slot `logit_index` (the lm_head never runs on the other
        C-1 slots) + the updated cache (language.decode_step S_new=C
        semantics — intra-chunk causal, stale-slot masking)."""
        c = self.cfg
        cos, sin = mrope_cos_sin(
            position_ids, c.text.head_dim, c.text.rope_theta, c.text.mrope_section
        )
        return self.text.decode_step(
            None, cos.astype(self.dtype), sin.astype(self.dtype),
            k_cache, v_cache, kv_valid, write_idx,
            inputs_embeds=chunk_embeds, logits_index=logit_index,
            new_valid=chunk_valid,
        )

    # init/traversal path: touch every submodule so linen materializes params
    def __call__(self, input_ids, valid, position_ids, patches, vis_pos_ids,
                 full_seg, vis_valid, packed_idx, img_slots, img_valid,
                 fuser_window_index, fuser_reverse_index, fuser_segment_ids,
                 fuser_pos_ids, le_start, out_len: int):
        merged, taps = self.vision_encode(patches, vis_pos_ids, full_seg, vis_valid)
        taps = jnp.stack([t for t in taps], axis=0) if taps else jnp.zeros((0,) + merged.shape)
        return self.glimpse_prefill(
            out_len,
            input_ids=input_ids, valid=valid, position_ids=position_ids,
            image_embeds=merged, taps=taps, packed_idx=packed_idx,
            img_slots=img_slots, img_valid=img_valid,
            fuser_window_index=fuser_window_index,
            fuser_reverse_index=fuser_reverse_index,
            fuser_segment_ids=fuser_segment_ids,
            fuser_pos_ids=fuser_pos_ids,
            le_start=le_start,
        )

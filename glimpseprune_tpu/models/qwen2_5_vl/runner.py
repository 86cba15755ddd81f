"""Host-side orchestration: input preparation + jitted phases + generate loop.

The reference integrates with HF GenerationMixin via prepare_inputs /
update_kwargs overrides (model_gp.py:2076-2196); here the generate loop is
explicit: one jitted pruned prefill (static budget R), then jitted single-
token decode steps over the compacted KV cache. All geometry (image token
slots, packed indices, fuser geometry, mRoPE ids, budgets) is computed in
numpy before launch, so every jitted function sees static shapes and compiles
once per (S, P, R) bucket.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glimpseprune_tpu.config import ModelConfig
from glimpseprune_tpu.gp.fuser import FuserGeometry, build_fuser_geometry
from glimpseprune_tpu.models.qwen2_5_vl.gp_model import GlimpseOutputs, Qwen2_5_VL_GP
from glimpseprune_tpu.preprocessing import build_vision_geometry, get_rope_index
from glimpseprune_tpu.utils.profiling import debug_calls, time_logger


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class PreparedInputs:
    """Everything the jitted model consumes, as numpy arrays."""

    input_ids: np.ndarray          # [B, S]
    valid: np.ndarray              # [B, S]
    position_ids: np.ndarray       # [3, B, S]
    patches: np.ndarray            # [P, in_dim] window-padded slot order
    vis_pos_ids: np.ndarray        # [P, 2]
    full_seg: np.ndarray           # [P]
    vis_valid: np.ndarray          # [P] real-patch mask
    packed_idx: np.ndarray         # [B, N]
    img_slots: np.ndarray          # [B, N]
    img_valid: np.ndarray          # [B, N]
    img_group: np.ndarray          # [B, N] image index per slot (multi-image)
    fuser: FuserGeometry
    le_start: Optional[np.ndarray]  # [B]
    grids: np.ndarray              # [n_total_images, 3] flat, marker order
    out_len: int
    n_img_tokens: np.ndarray       # [B]
    grid_hw_rows: Optional[list] = None  # per row: [(h, w), ...] merged grids
    ref_token_masks: Optional[np.ndarray] = None  # [B, N]
    anchor_mask: Optional[np.ndarray] = None      # [B, N]
    labels: Optional[np.ndarray] = None           # [B, S]


def prepare_inputs(
    cfg: ModelConfig,
    prompt_ids: Sequence[Sequence[int]],
    images: Sequence[np.ndarray],
    normed_bboxes: Optional[Sequence[Optional[Sequence[Sequence[float]]]]] = None,
    answer_ids: Optional[Sequence[Sequence[int]]] = None,
    min_pixels: Optional[int] = None,
    max_pixels: Optional[int] = None,
    seq_multiple: int = 64,
    patch_multiple: int = 256,
    use_native_preproc: Optional[bool] = None,
    videos: Optional[Sequence] = None,
    video_seconds_per_grid: Optional[Sequence] = None,
) -> PreparedInputs:
    """Build statically-shaped model inputs for one batch.

    prompt_ids: token id lists with one `cfg.image_token_id` marker per
    image (un-expanded, reference processor semantics process_gp.py:132-144)
    and one `cfg.video_token_id` marker per video. images[b]: one HWC uint8
    array, or a LIST of arrays for multi-image rows (markers are expanded in
    order); [] for text-or-video-only rows. videos[b]: None, one [T, H, W, C]
    array, or a list of them; video_seconds_per_grid[b]: seconds per temporal
    grid step (scalar or per-video list; drives the mRoPE time axis,
    reference get_rope_index video branch + second_per_grid_ts).
    normed_bboxes[b]: bbox list (single image) or list of per-image bbox
    lists. answer_ids: training targets; when given, the glimpse slots are
    spliced in front of the answer and labels are emitted.
    """
    from glimpseprune_tpu.preprocessing.image import (
        DEFAULT_MAX_PIXELS,
        DEFAULT_MIN_PIXELS,
        preprocess_image,
        preprocess_video,
    )
    from glimpseprune_tpu.preprocessing.ref_masks import ref_token_mask_from_bboxes

    if use_native_preproc is None:
        use_native_preproc = os.environ.get("GP_NATIVE_PREPROC", "") == "1"
    if use_native_preproc:
        from glimpseprune_tpu.preprocessing.native import (
            available as _native_ok,
            preprocess_image_native,
        )

        if _native_ok():
            preprocess_image = preprocess_image_native

    v = cfg.vision
    mu = v.spatial_merge_unit
    B = len(prompt_ids)
    assert len(images) == B, "images: one entry (array or list) per row"
    images_per_row = [
        list(im) if isinstance(im, (list, tuple))
        else ([] if im is None else [im])
        for im in images
    ]

    def _listify(x):
        if x is None:
            return []
        return list(x) if isinstance(x, (list, tuple)) else [x]

    videos_per_row = [_listify(x) for x in (videos or [None] * B)]
    spg_per_row = [_listify(x) for x in (video_seconds_per_grid or [None] * B)]

    # ---- per-row visual entries in MARKER ORDER (images/videos interleaved
    # exactly as their markers appear in the prompt)
    entries_row: List[list] = []
    for b, ids in enumerate(prompt_ids):
        ids = list(ids)
        n_im = ids.count(cfg.image_token_id)
        n_vid = ids.count(cfg.video_token_id)
        assert n_im == len(images_per_row[b]), (
            f"row {b}: {n_im} image markers for {len(images_per_row[b])} images"
        )
        assert n_vid == len(videos_per_row[b]), (
            f"row {b}: {n_vid} video markers for {len(videos_per_row[b])} videos"
        )
        im_it = iter(images_per_row[b])
        vid_it = iter(videos_per_row[b])
        spg_it = iter(spg_per_row[b] or [1.0] * n_vid)
        entries = []
        for t in ids:
            if t == cfg.image_token_id:
                entries.append(("image", np.asarray(next(im_it)), None))
            elif t == cfg.video_token_id:
                spg = next(spg_it, 1.0)
                entries.append(("video", np.asarray(next(vid_it)),
                                float(spg if spg is not None else 1.0)))
        entries_row.append(entries)
    n_imgs_row = [len(e) for e in entries_row]  # visual entries per row

    # ---- vision: patchify all visuals (row-major marker order), pack
    patch_list, grids = [], []
    for entries in entries_row:
        for kind, arr, _ in entries:
            fn = preprocess_video if kind == "video" else preprocess_image
            p, g = fn(
                arr,
                patch_size=v.patch_size,
                temporal_patch_size=v.temporal_patch_size,
                merge_size=v.spatial_merge_size,
                min_pixels=min_pixels or DEFAULT_MIN_PIXELS,
                max_pixels=max_pixels or DEFAULT_MAX_PIXELS,
            )
            patch_list.append(p)
            grids.append(g)
    grids = np.array(grids)  # [n_total_visuals, 3] thw, marker order
    patches_nat = np.concatenate(patch_list, axis=0)
    n_patches = patches_nat.shape[0]
    geo0 = build_vision_geometry(grids, v.window_size, v.spatial_merge_size, v.patch_size)
    wp = geo0.window_patches
    bucket = max(wp, _round_up(patch_multiple, wp))
    padded_p = _round_up(geo0.padded_len, bucket)
    geo = build_vision_geometry(
        grids, v.window_size, v.spatial_merge_size, v.patch_size, padded_len=padded_p
    )
    patches_win = np.zeros((padded_p, patches_nat.shape[1]), dtype=patches_nat.dtype)
    patches_win[geo.patch_valid] = patches_nat[geo.patch_src[geo.patch_valid]]

    n_per_image = (grids[:, 0] * grids[:, 1] * grids[:, 2]) // mu
    img_offsets = np.concatenate([[0], np.cumsum(n_imgs_row)[:-1]])  # first image idx/row
    n_img = np.array([
        int(n_per_image[img_offsets[b] : img_offsets[b] + n_imgs_row[b]].sum())
        for b in range(B)
    ])  # merged tokens per row
    N = int(n_img.max())

    # packed_idx[b, j] = merged-slot row of natural token j of row b
    moffs_img = np.concatenate([[0], np.cumsum(n_per_image)[:-1]])  # per image
    packed_idx = np.zeros((B, N), dtype=np.int32)
    img_group = np.full((B, N), -1, dtype=np.int32)

    # ---- text: expand image/video markers, append/splice le slots, left-pad
    gp = cfg.gp
    le_len = gp.le_length if gp.has_le else 0
    rows, label_rows, le_starts = [], [], []
    for b, ids in enumerate(prompt_ids):
        ids = list(ids)
        expanded = []
        img_i = img_offsets[b]
        for t in ids:
            if t in (cfg.image_token_id, cfg.video_token_id):
                expanded.extend([t] * int(n_per_image[img_i]))
                img_i += 1
            else:
                expanded.append(t)
        if answer_ids is not None:
            ans = list(answer_ids[b])
            row = expanded + [cfg.eos_token_id] * le_len + ans
            lab = [-100] * (len(expanded) + le_len) + ans
            le_starts.append(len(expanded))
            label_rows.append(lab)
        else:
            row = expanded + [cfg.eos_token_id] * le_len
            le_starts.append(len(expanded))
        rows.append(row)

    S = _round_up(max(len(r) for r in rows), seq_multiple)
    input_ids = np.full((B, S), cfg.pad_token_id, dtype=np.int32)
    valid = np.zeros((B, S), dtype=bool)
    labels = None if answer_ids is None else np.full((B, S), -100, dtype=np.int32)
    le_start_arr = np.zeros((B,), dtype=np.int32)
    img_slots = np.zeros((B, N), dtype=np.int32)
    img_valid = np.zeros((B, N), dtype=bool)
    for b, row in enumerate(rows):
        off = S - len(row)  # left padding
        input_ids[b, off:] = row
        valid[b, off:] = True
        if labels is not None:
            labels[b, off:] = label_rows[b]
        le_start_arr[b] = off + le_starts[b]
        pos = np.nonzero((input_ids[b] == cfg.image_token_id)
                         | (input_ids[b] == cfg.video_token_id))[0]
        img_slots[b, : len(pos)] = pos
        img_valid[b, : len(pos)] = True

    # per-row (possibly multi-image/video) fuser geometry + packed/group maps.
    # A video contributes one FRAME entry per temporal grid step (per-frame
    # fuser attention segments = the reference's per-frame cu_seqlens) but
    # ONE budget group (the keep policy treats the whole video as one visual,
    # like the reference's contiguous image_token span, model_gp.py:1495-1549).
    grid_hw_rows = []
    for b in range(B):
        row_grids = []
        off = 0
        # keep_scores_with_policy_grouped clips group ids to max_groups=8;
        # more visuals per row would silently share budget groups
        assert n_imgs_row[b] <= 8, (
            f"row {b} has {n_imgs_row[b]} visuals; max supported per row is 8"
        )
        for i in range(n_imgs_row[b]):
            gi = grids[img_offsets[b] + i]
            t = int(gi[0])
            hw = (int(gi[1]) // v.spatial_merge_size, int(gi[2]) // v.spatial_merge_size)
            row_grids.extend([hw] * t)
            ni = t * hw[0] * hw[1]
            mo = moffs_img[img_offsets[b] + i]
            packed_idx[b, off : off + ni] = geo.slot_of_merged[mo : mo + ni]
            img_group[b, off : off + ni] = i
            off += ni
        grid_hw_rows.append(row_grids)
    grid_hw = [r[0] for r in grid_hw_rows]  # first image per row (anchors/ref)
    fuser = build_fuser_geometry(
        grid_hw_rows, N, v.window_size, v.spatial_merge_size, v.patch_size,
        gp.attn_fuse_global,
    )

    # ---- position ids (le slots get sequential text positions, matching
    # reference _append_le position arithmetic model_gp.py:1178-1185).
    # Image and video grids split back out of marker order for the reference
    # get_rope_index contract (video branch scales t by second_per_grid_ts).
    flat_entries = [e for entries in entries_row for e in entries]
    is_video = np.array([k == "video" for k, _, _ in flat_entries], dtype=bool)
    image_grids = grids[~is_video] if (~is_video).any() else None
    video_grids = grids[is_video] if is_video.any() else None
    spg_list = [s for k, _, s in flat_entries if k == "video"] or None
    position_ids, _ = get_rope_index(
        input_ids, image_grids, video_grids, valid.astype(np.int64),
        second_per_grid_ts=spg_list,
        spatial_merge_size=v.spatial_merge_size,
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
    )

    # ---- budgets -> static out_len (per-visual caps summed; a video's t*h*w
    # tokens form one budget group, matching img_group above)
    budgets = np.zeros((B,), dtype=np.int64)
    for b in range(B):
        tot = 0
        for i in range(n_imgs_row[b]):
            nb = int(n_per_image[img_offsets[b] + i])
            if gp.max_remain_ratio is not None:
                k = int(gp.max_remain_ratio * nb)
                k = max(k, gp.min_remain_num or 0) + len(gp.anchor_positions)
                tot += min(nb, k)
            else:
                tot += nb
        budgets[b] = tot
    n_text = valid.sum(1) - n_img - le_len
    out_len = _round_up(int((n_text + budgets).max()), seq_multiple)

    ref_masks = None
    if normed_bboxes is not None:
        ref_masks = np.zeros((B, N), dtype=bool)
        for b, bxs in enumerate(normed_bboxes):
            if bxs is None:
                continue
            per_image = bxs if (bxs and isinstance(bxs[0][0], (list, tuple))) else [bxs]
            off = 0
            for i, (h, w) in enumerate(grid_hw_rows[b]):
                if i < len(per_image) and per_image[i]:
                    ref_masks[b, off : off + h * w] = ref_token_mask_from_bboxes(
                        per_image[i], (h, w)
                    ).reshape(-1)
                off += h * w

    anchor = None
    if gp.anchor_positions:
        assert max(n_imgs_row) == 1 and not is_video.any(), (
            "anchor_positions unsupported with multi-image/video rows "
            "(reference model_gp.py:1524-1525 raises the same)"
        )
        anchor = np.zeros((B, N), dtype=bool)
        for b in range(B):
            h, w = grid_hw[b]
            for a in gp.anchor_positions:
                idx = {"tl": 0, "tr": w - 1, "bl": (h - 1) * w, "br": h * w - 1}[a]
                anchor[b, idx] = True

    return PreparedInputs(
        input_ids=input_ids,
        valid=valid,
        position_ids=position_ids,
        patches=patches_win,
        vis_pos_ids=geo.pos_ids,
        full_seg=geo.full_segment_ids,
        vis_valid=geo.patch_valid,
        packed_idx=packed_idx,
        img_slots=img_slots,
        img_valid=img_valid,
        img_group=img_group,
        fuser=fuser,
        grid_hw_rows=grid_hw_rows,
        le_start=le_start_arr if gp.has_le else None,
        grids=grids,
        out_len=out_len,
        n_img_tokens=n_img,
        ref_token_masks=ref_masks,
        anchor_mask=anchor,
        labels=labels,
    )


def prepare_chat_inputs(
    cfg: ModelConfig,
    messages_list: Sequence[Sequence[dict]],
    images: Sequence[np.ndarray],
    tokenize,
    special_ids: Optional[Dict[str, int]] = None,
    is_sft: bool = False,
    add_vision_id: bool = False,
    im_start_id: int = 151644,
    **kwargs,
) -> PreparedInputs:
    """Chat-messages entry point: render the Qwen chat template, tokenize,
    and build model inputs (reference GPCollator train_qwen_gp.py:600-662 /
    lmms wrapper apply_chat_template my_lmms_eval/models/qwen2_5_vl_gp.py:
    337-356).

    messages_list[b] is one HF-format conversation. ``is_sft`` conversations
    end with the assistant turn; its tokens become the answer (labels), the
    rendered prefix incl. "<|im_start|>assistant\\n" becomes the prompt —
    identical label coverage to the reference's mask-until-last-im_start+3.
    ``tokenize`` maps plain text -> ids; special markers are mapped directly
    via ``special_ids`` (default: the released Qwen2.5-VL vocabulary ids).
    """
    from glimpseprune_tpu.preprocessing.chat import (
        chat_prompt_ids,
        qwen_special_ids,
        render_qwen_chat,
        split_sft_conversation,
    )

    sids = special_ids or qwen_special_ids(cfg, im_start_id=im_start_id)
    prompts: List[List[int]] = []
    answers: Optional[List[List[int]]] = [] if is_sft else None
    for messages in messages_list:
        if is_sft:
            p, a = split_sft_conversation(messages, tokenize, sids)
            prompts.append(p)
            answers.append(a)
        else:
            text = render_qwen_chat(
                messages, add_generation_prompt=True, add_vision_id=add_vision_id
            )
            prompts.append(chat_prompt_ids(text, tokenize, sids))
    return prepare_inputs(cfg, prompts, images, answer_ids=answers, **kwargs)


@dataclass
class GenerateResult:
    sequences: np.ndarray            # [B, max_new] generated ids (pad after eos)
    num_generated: np.ndarray        # [B]
    keep_img: Optional[np.ndarray]   # [B, N]
    mask_logits: Optional[np.ndarray]
    prune_ratio: Optional[np.ndarray]  # [B] fraction of image tokens dropped


def _vis_dense_hint(prep) -> bool:
    """True iff the packed patch sequence is ONE valid segment (a single
    unpadded image/video): the ViT full-attention flash kernel then compiles
    mask-free (static promise; ops/attention.segment_attention(dense=))."""
    if getattr(prep, "patches", None) is None or prep.full_seg is None:
        return False
    fs = np.asarray(prep.full_seg)
    vv = np.asarray(prep.vis_valid)
    return (
        fs.size > 0 and bool(vv.all())
        and bool((fs == fs.flat[0]).all()) and int(fs.flat[0]) >= 0
    )


@functools.partial(jax.jit, static_argnames=("t", "quant"))
def _build_decode_cache(kv, t: int, quant: str):
    """Decode-cache build as ONE jitted program (module-level so the jit
    cache persists across calls — a per-call jit object recompiles every
    generate, ~1.3 s over the axon tunnel). Eagerly, each jnp op is its own
    executable and the int8 quant chain materializes f32-sized
    intermediates — enough to OOM a max-batch serving assembly."""
    from glimpseprune_tpu.ops.kv_cache import alloc_cache, cache_set_prefix

    c = alloc_cache(kv.shape[:2] + (t,) + kv.shape[3:], kv.dtype, quant)
    return cache_set_prefix(c, kv)


class GlimpsePruneRunner:
    """Owns params + jitted phase functions; the user-facing generate() API."""

    def __init__(self, cfg: ModelConfig, params, dtype=jnp.float32,
                 donate_cache: bool = True, model=None):
        self.cfg = cfg.validate()
        # model: any module with the Qwen2_5_VL_GP method surface (the LLaVA
        # family passes its own Llava_GP here; the pipeline is shared)
        self.model = model if model is not None else Qwen2_5_VL_GP(cfg, dtype=dtype)
        self.params = params
        self.dtype = dtype
        # sequence_parallel binds at trace time: remember the setting this
        # runner's phases will trace under, to warn on later divergence
        from glimpseprune_tpu.ops.attention import get_sequence_parallel

        self._sp_ctx_at_init = get_sequence_parallel()

        self._vision = jax.jit(
            lambda p, *a, dense_attn=False: self.model.apply(
                p, *a, dense_attn=dense_attn, method=self.model.vision_encode
            ),
            static_argnames=("dense_attn",),
        )
        self._prefill = jax.jit(
            functools.partial(self._prefill_impl),
            static_argnames=("out_len", "use_ref_masks", "dense_attn"),
        )
        self._vanilla = jax.jit(
            lambda p, *a: self.model.apply(p, *a, method=self.model.vanilla_prefill)
        )
        self._embed_imgs = jax.jit(
            lambda p, *a: self.model.apply(p, *a, method=self.model.embed_with_images)
        )
        self._prefill_chunk = jax.jit(
            lambda p, *a: self.model.apply(p, *a, method=self.model.prefill_chunk),
            donate_argnums=(3, 4),
        )
        self._decode = jax.jit(self._decode_impl, donate_argnums=(3, 4) if donate_cache else ())
        self._staged = jax.jit(
            self._staged_impl, static_argnames=("stages", "out_lens", "dense_attn")
        )
        self._pre_llm_compress = jax.jit(
            self._pre_llm_compress_impl,
            static_argnames=("method", "k", "out_len", "dominant_ratio",
                             "contextual_ratio", "dense_attn"),
        )

    # ---- jitted bodies -------------------------------------------------

    def _prefill_impl(self, params, inputs: Dict[str, Any], out_len: int,
                      use_ref_masks: bool, dense_attn: bool = False):
        merged, taps = self.model.apply(
            params,
            inputs["patches"], inputs["vis_pos_ids"], inputs["full_seg"], inputs["vis_valid"],
            False, dense_attn,
            method=self.model.vision_encode,
        )
        taps = (
            jnp.stack(taps, axis=0)
            if taps
            else jnp.zeros((0,) + merged.shape, dtype=merged.dtype)
        )

        def run(m):
            return m.glimpse_prefill(
                out_len,
                anchor_mask=inputs.get("anchor_mask"),
                img_group=inputs.get("img_group"),
                input_ids=inputs["input_ids"],
                valid=inputs["valid"],
                position_ids=inputs["position_ids"],
                image_embeds=merged,
                taps=taps,
                packed_idx=inputs["packed_idx"],
                img_slots=inputs["img_slots"],
                img_valid=inputs["img_valid"],
                fuser_window_index=inputs["fuser_window_index"],
                fuser_reverse_index=inputs["fuser_reverse_index"],
                fuser_segment_ids=inputs["fuser_segment_ids"],
                fuser_pos_ids=inputs["fuser_pos_ids"],
                le_start=inputs.get("le_start"),
                labels=inputs.get("labels"),
                ref_token_masks=inputs.get("ref_token_masks"),
                use_ref_masks=use_ref_masks,
            )

        return self.model.apply(params, method=run)

    def _staged_impl(self, params, inputs, stages, out_lens,
                     dense_attn: bool = False):
        merged, _ = self.model.apply(
            params, inputs["patches"], inputs["vis_pos_ids"],
            inputs["full_seg"], inputs["vis_valid"], False, dense_attn,
            method=self.model.vision_encode,
        )

        def run(m):
            return m.staged_prefill(
                inputs["input_ids"], inputs["valid"], inputs["position_ids"],
                merged, inputs["packed_idx"], inputs["img_slots"],
                inputs["img_valid"], stages, out_lens,
            )

        return self.model.apply(params, method=run)

    def _pre_llm_compress_impl(self, params, inputs, method, k, out_len,
                               dominant_ratio, contextual_ratio,
                               dense_attn: bool = False):
        from glimpseprune_tpu.compressors import (
            cdpruner_select,
            divprune_select,
            visionzip_select,
        )
        from glimpseprune_tpu.compressors.vscan import (
            merge_dropped_into_kept,
            vscan_select,
        )
        from glimpseprune_tpu.models.qwen2_5_vl.gp_model import (
            _gather_rows,
            _scatter_rows,
        )
        from glimpseprune_tpu.ops.compaction import (
            compaction_indices,
            gather_positions,
            gather_tokens,
        )

        cfg = self.cfg
        input_ids = inputs["input_ids"]
        valid = inputs["valid"]
        position_ids = inputs["position_ids"]
        packed_idx = inputs["packed_idx"]
        img_slots = inputs["img_slots"]
        img_valid = inputs["img_valid"]
        B = input_ids.shape[0]

        emit_imp = method in ("visionzip", "vscan")
        vis_out = self.model.apply(
            params, inputs["patches"], inputs["vis_pos_ids"],
            inputs["full_seg"], inputs["vis_valid"], emit_imp, dense_attn,
            method=self.model.vision_encode,
        )
        if emit_imp:
            merged, _, (received, keys_mean, received_local) = vis_out
        else:
            merged, _ = vis_out
        rows = _gather_rows(
            jnp.broadcast_to(merged[None], (B,) + merged.shape), packed_idx, img_valid
        )

        if method == "visionzip":
            imp_rows = _gather_rows(
                jnp.broadcast_to(received[None], (B,) + received.shape),
                packed_idx, img_valid,
            )
            key_rows = _gather_rows(
                jnp.broadcast_to(keys_mean[None], (B,) + keys_mean.shape),
                packed_idx, img_valid,
            )
            keep_img, rows = visionzip_select(
                rows, imp_rows, key_rows, img_valid, dominant_ratio, contextual_ratio
            )
        elif method == "vscan":
            local_rows = _gather_rows(
                jnp.broadcast_to(received_local[None], (B,) + received_local.shape),
                packed_idx, img_valid,
            )
            global_rows = _gather_rows(
                jnp.broadcast_to(received[None], (B,) + received.shape),
                packed_idx, img_valid,
            )
            keep_img = vscan_select(
                local_rows, global_rows, img_valid, inputs["grid_hw"], k
            )
            rows = merge_dropped_into_kept(rows, keep_img, img_valid)
        elif method == "divprune":
            keep_img = divprune_select(rows, img_valid, k)
        elif method == "cdpruner" and "cdpruner_relevance_packed" in inputs:
            # text-conditioned relevance computed upstream (LLaVA: CLIP text
            # tower + visual_projection, reference llava_cdpruner
            # llava_arch.py:156-160 — see Llava_GP.cdpruner_relevance)
            rel = inputs["cdpruner_relevance_packed"]  # [Pm]
            relevance = _gather_rows(
                jnp.broadcast_to(rel[None, :, None], (B, rel.shape[0], 1)),
                packed_idx, img_valid,
            )[..., 0]
            keep_img = cdpruner_select(rows, relevance, img_valid, k)
        elif method == "cdpruner":
            # relevance proxy: negated cosine similarity between each visual
            # token and the mean text-token embedding (the reference's CLIP
            # text tower has no Qwen counterpart; same negate+minmax treatment,
            # llava_cdpruner/model/llava_arch.py:156-160)
            embeds0 = self.model.apply(
                params, input_ids, method=lambda m, ids: m.text.embed(ids)
            )
            is_img0 = jnp.zeros_like(valid)
            is_img0 = _scatter_rows(is_img0, img_slots, img_valid, img_valid)
            text_mask = (valid & ~is_img0)[..., None]
            text_mean = (embeds0 * text_mask).sum(1) / jnp.maximum(
                text_mask.sum(1), 1
            )
            rn = rows / jnp.maximum(jnp.linalg.norm(rows.astype(jnp.float32), axis=-1, keepdims=True), 1e-8)
            tn = text_mean / jnp.maximum(jnp.linalg.norm(text_mean.astype(jnp.float32), axis=-1, keepdims=True), 1e-8)
            relevance = -jnp.einsum("bnd,bd->bn", rn.astype(jnp.float32), tn.astype(jnp.float32))
            keep_img = cdpruner_select(rows, relevance, img_valid, k)
        else:
            raise ValueError(f"unknown compressor {method!r}")

        embeds = self.model.apply(
            params, input_ids, method=lambda m, ids: m.text.embed(ids)
        )
        embeds = _scatter_rows(embeds, img_slots, rows, img_valid)
        is_img = jnp.zeros_like(valid)
        is_img = _scatter_rows(is_img, img_slots, img_valid, img_valid)
        keep = (valid & ~is_img) | _scatter_rows(
            jnp.zeros_like(valid), img_slots, keep_img, img_valid
        )

        plan = compaction_indices(keep, out_len)
        r_embeds = gather_tokens(embeds, plan)
        r_ids = gather_tokens(input_ids, plan, fill=cfg.pad_token_id)
        r_pos = gather_positions(position_ids, plan)

        logits, kv_k, kv_v = self.model.apply(
            params, r_embeds, plan.valid, r_pos, method=self.model.prefill_embeds
        )
        return logits, r_ids, plan.valid, r_pos, kv_k, kv_v, keep_img

    def _decode_impl(self, params, token, position_ids, k_cache, v_cache, kv_valid, write_idx):
        return self.model.apply(
            params, token, position_ids, k_cache, v_cache, kv_valid, write_idx,
            method=self.model.decode_step,
        )

    # ---- public API -----------------------------------------------------

    def _device_inputs(self, prep: PreparedInputs, use_ref_masks: bool) -> Dict[str, Any]:
        d = {
            "input_ids": jnp.asarray(prep.input_ids),
            "valid": jnp.asarray(prep.valid),
            "position_ids": jnp.asarray(prep.position_ids),
            "patches": jnp.asarray(prep.patches),
            "vis_pos_ids": jnp.asarray(prep.vis_pos_ids),
            "full_seg": jnp.asarray(prep.full_seg),
            "vis_valid": jnp.asarray(prep.vis_valid),
            "packed_idx": jnp.asarray(prep.packed_idx),
            "img_slots": jnp.asarray(prep.img_slots),
            "img_valid": jnp.asarray(prep.img_valid),
            "img_group": jnp.asarray(prep.img_group),
            "fuser_window_index": jnp.asarray(prep.fuser.window_index),
            "fuser_reverse_index": jnp.asarray(prep.fuser.reverse_index),
            "fuser_segment_ids": jnp.asarray(prep.fuser.segment_ids),
            "fuser_pos_ids": jnp.asarray(prep.fuser.pos_ids),
            "grid_hw": jnp.asarray(
                np.array([r[0] for r in prep.grid_hw_rows], dtype=np.int32)
                if prep.grid_hw_rows
                else np.stack([prep.grids[:, 1], prep.grids[:, 2]], axis=-1) // 2
            ),
        }
        if prep.le_start is not None:
            d["le_start"] = jnp.asarray(prep.le_start)
        if prep.labels is not None:
            d["labels"] = jnp.asarray(prep.labels)
        if use_ref_masks:
            assert prep.ref_token_masks is not None, "use_ref_masks needs bboxes"
            d["ref_token_masks"] = jnp.asarray(prep.ref_token_masks)
        if prep.anchor_mask is not None:
            d["anchor_mask"] = jnp.asarray(prep.anchor_mask)
        return d

    def harvest_rows(self, prep: PreparedInputs, layers=None,
                     q_start: Optional[int] = None):
        """Cross-attention rows per layer/head for visualization.

        q_start=None: the glimpse query's {layer: [B, N_img, Hq]} log-prob
        rows over image tokens (natural order). q_start=int: the reference
        Sep model's FULL multi-query extraction (model_sep.py:53-72) —
        {layer: [B, n_q, N_img, Hq]} softmaxed rows for every query position
        from q_start on, so save_attn_maps can reproduce the per-prompt-token
        heatmaps."""
        cfg = self.cfg
        layers = tuple(layers) if layers else tuple(cfg.gp.selected_layers)
        inputs = self._device_inputs(prep, False)

        def fn(params, inputs):
            merged, _ = self.model.apply(
                params, inputs["patches"], inputs["vis_pos_ids"],
                inputs["full_seg"], inputs["vis_valid"],
                method=self.model.vision_encode,
            )
            from glimpseprune_tpu.models.qwen2_5_vl.gp_model import (
                _gather_rows,
                _scatter_rows,
            )
            from glimpseprune_tpu.ops.rope import mrope_cos_sin

            def run(m):
                B = inputs["input_ids"].shape[0]
                embeds = m.text.embed(inputs["input_ids"])
                rows_img = _gather_rows(
                    jnp.broadcast_to(merged[None], (B,) + merged.shape),
                    inputs["packed_idx"], inputs["img_valid"],
                )
                embeds = _scatter_rows(embeds, inputs["img_slots"], rows_img,
                                       inputs["img_valid"])
                cos, sin = mrope_cos_sin(
                    inputs["position_ids"], cfg.text.head_dim,
                    cfg.text.rope_theta, cfg.text.mrope_section,
                )
                _, _, harvests = m.text.run_layers(
                    embeds, cos.astype(m.dtype), sin.astype(m.dtype),
                    inputs["valid"],
                    layer_end=max(layers),
                    harvest_layers=layers,
                    use_attention_logits=cfg.gp.use_attention_logits,
                    harvest_q_start=q_start,
                )
                out = {}
                for l, row in harvests.items():
                    if q_start is not None:
                        # [B, n_q, S, Hq] -> gather image-token key columns
                        row = row.transpose(0, 2, 1, 3)  # [B, S, n_q, Hq]
                        row = _gather_rows(row, inputs["img_slots"],
                                           inputs["img_valid"])
                        out[l] = row.transpose(0, 2, 1, 3)  # [B, n_q, N, Hq]
                    else:
                        row = jnp.maximum(row, -1e30)
                        out[l] = _gather_rows(row, inputs["img_slots"],
                                              inputs["img_valid"])
                return out

            return self.model.apply(params, method=run)

        if not hasattr(self, "_harvest_jit"):
            self._harvest_jit = {}
        key = (layers, q_start)
        if key not in self._harvest_jit:
            self._harvest_jit[key] = jax.jit(fn)
        return self._harvest_jit[key]({"params": self.params}, inputs)

    def glimpse_delayed(self, prep: PreparedInputs, use_ref_masks: bool = False,
                        training: bool = False):
        """Two-phase API, phase 1 (reference delay_selection=True,
        model_gp.py:1413-1444): returns (mask_logits [n_out, B, N],
        GlimpseState). Pass (a possibly overridden) logits tensor to
        apply_selection to finish."""
        inputs = self._device_inputs(prep, use_ref_masks)

        def run_encode(params, inputs):
            merged, taps = self.model.apply(
                params, inputs["patches"], inputs["vis_pos_ids"],
                inputs["full_seg"], inputs["vis_valid"],
                method=self.model.vision_encode,
            )
            taps = (jnp.stack(taps, axis=0) if taps
                    else jnp.zeros((0,) + merged.shape, dtype=merged.dtype))

            def enc(m):
                return m.glimpse_encode(
                    input_ids=inputs["input_ids"], valid=inputs["valid"],
                    position_ids=inputs["position_ids"], image_embeds=merged,
                    taps=taps, packed_idx=inputs["packed_idx"],
                    img_slots=inputs["img_slots"], img_valid=inputs["img_valid"],
                    fuser_window_index=inputs["fuser_window_index"],
                    fuser_reverse_index=inputs["fuser_reverse_index"],
                    fuser_segment_ids=inputs["fuser_segment_ids"],
                    fuser_pos_ids=inputs["fuser_pos_ids"],
                    le_start=inputs.get("le_start"),
                    labels=inputs.get("labels"),
                    ref_token_masks=inputs.get("ref_token_masks"),
                    use_ref_masks=use_ref_masks,
                    training=training,
                    img_group=inputs.get("img_group"),
                )

            return self.model.apply(params, method=enc)

        if not hasattr(self, "_encode_jit"):
            self._encode_jit = jax.jit(run_encode)
        mask_logits, state, le_loss = self._encode_jit({"params": self.params}, inputs)
        return mask_logits, state

    def apply_selection(self, state, mask_logits, out_len: int,
                        anchor_mask=None) -> GlimpseOutputs:
        """Two-phase API, phase 2 (reference `_do_delayed_selection`,
        model_gp.py:1458-1492): keep policy + compaction + resume layers with
        (possibly externally overridden) mask logits."""

        def run_reduce(params, state, mask_logits, anchor_mask):
            def red(m):
                return m.reduce_and_resume(state, mask_logits, out_len, anchor_mask)

            return self.model.apply(params, method=red)

        if not hasattr(self, "_reduce_jit"):
            self._reduce_jit = jax.jit(run_reduce)
        return self._reduce_jit({"params": self.params}, state, mask_logits,
                                anchor_mask)

    @time_logger
    @debug_calls()
    def glimpse(self, prep: PreparedInputs, use_ref_masks: bool = False) -> GlimpseOutputs:
        """Mask-only fast path (reference `do_glimpse`, SURVEY.md §3.2)."""
        inputs = self._device_inputs(prep, use_ref_masks)
        return self._prefill(
            {"params": self.params}, inputs, out_len=prep.out_len,
            use_ref_masks=use_ref_masks, dense_attn=_vis_dense_hint(prep),
        )

    @time_logger
    @debug_calls()
    def generate(
        self,
        prep: PreparedInputs,
        max_new_tokens: int = 128,
        do_selection: bool = True,
        use_ref_masks: bool = False,
        eos_token_id: Optional[int] = None,
        check_eos_every: Optional[int] = None,
        temperature: float = 0.0,
        rng=None,
        stop_sequences: Optional[Sequence[Sequence[int]]] = None,
    ) -> GenerateResult:
        """check_eos_every sets the decode-chunk granularity: eos / stop-
        sequence early exit can only happen at chunk boundaries (decode runs
        as on-device lax.scan chunks; a finer check means more host
        round-trips). None = the 32-step default.

        stop_sequences: multi-token stop id sequences checked host-side
        between chunks — the id-level equivalent of the reference's
        KeywordsStoppingCriteria (llava_gp/mm_utils.py:236-264; e.g. vicuna
        "</s>" or "USER:" keyword stops). A matched row stops generating and
        its output is trimmed BEFORE the matched sequence (the reference's
        callers strip the stop string with outputs.split(stop_str)[0],
        infer_cot.py-style); plain eos is still trimmed inclusively."""
        from glimpseprune_tpu.ops.attention import get_sequence_parallel

        if get_sequence_parallel() is not self._sp_ctx_at_init:
            import warnings

            warnings.warn(
                "sequence_parallel changed after this runner was built; "
                "already-traced phases keep the old setting (jit caches "
                "bind it at trace time) — construct the runner inside the "
                "intended sequence_parallel context", stacklevel=2)
        cfg = self.cfg
        eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
        B = prep.input_ids.shape[0]

        if do_selection:
            out = self._prefill(
                {"params": self.params},
                self._device_inputs(prep, use_ref_masks),
                out_len=prep.out_len, use_ref_masks=use_ref_masks,
                dense_attn=_vis_dense_hint(prep),
            )
            logits, r_valid, r_pos = out.logits, out.valid, out.position_ids
            kv_k, kv_v = out.kv_k, out.kv_v
            keep_img = np.asarray(out.keep_img)
            mask_logits = np.asarray(out.mask_logits)
            prune_ratio = 1.0 - keep_img.sum(1) / np.maximum(prep.n_img_tokens, 1)
        else:
            # vanilla path must drop the le placeholder slots: rebuild without them
            assert prep.le_start is not None or not cfg.gp.has_le
            inputs = self._device_inputs(prep, False)
            le_len = cfg.gp.le_length if cfg.gp.has_le else 0
            if le_len:
                # le slots are always the trailing slots in inference prep
                for key in ("input_ids", "valid"):
                    inputs[key] = inputs[key][:, :-le_len]
                inputs["position_ids"] = inputs["position_ids"][:, :, :-le_len]
            logits, kv_k, kv_v = self._vanilla(
                {"params": self.params},
                inputs["input_ids"], inputs["valid"], inputs["position_ids"],
                None if prep.patches is None else self._vision(
                    {"params": self.params},
                    inputs["patches"], inputs["vis_pos_ids"],
                    inputs["full_seg"], inputs["vis_valid"],
                    dense_attn=_vis_dense_hint(prep),
                )[0],
                inputs["packed_idx"], inputs["img_slots"], inputs["img_valid"],
            )
            r_valid = inputs["valid"]
            r_pos = inputs["position_ids"]
            keep_img = mask_logits = None
            prune_ratio = None

        seqs, n_gen = self._decode_loop(
            logits, r_valid, r_pos, kv_k, kv_v, max_new_tokens, eos,
            temperature=temperature, rng=rng,
            chunk_size=32 if check_eos_every is None else max(1, check_eos_every),
            stop_sequences=stop_sequences,
        )
        return GenerateResult(
            sequences=seqs,
            num_generated=n_gen,
            keep_img=keep_img,
            mask_logits=mask_logits,
            prune_ratio=prune_ratio,
        )

    def vanilla_prefill_chunked(self, prep: PreparedInputs, chunk_size: int,
                                prealloc_t: Optional[int] = None):
        """Vanilla prefill in `chunk_size`-token chunks STRAIGHT INTO a
        decode-ready cache (reference parity target: full-sequence
        prefill; this is the admission-granularity primitive for
        continuous serving — decode scans can interleave between chunks,
        and per-chunk activation memory is O(C) instead of O(S)).

        Each chunk is one jitted language.decode_step call (S_new=C):
        read-then-write cache aliasing, intra-chunk causality via the
        k_new register path, stale-slot masking for not-yet-written slots.
        Token-identical to _vanilla + _build_decode_cache (tested).

        Returns (logits [B, 1, V] at the final slot, r_valid [B, S],
        r_pos [3, B, S], k_cache, v_cache) with caches [L, B, T, ...]
        (T = prealloc_t or S) — plug into _decode_loop(prealloc_t=T).
        """
        kv_quant = getattr(self.cfg.text, "kv_cache_quant", "none")
        tier = "" if kv_quant == "none" else kv_quant
        gen = self._chunked_prefill_gen(prep, chunk_size, prealloc_t)
        while True:
            try:
                next(gen)
            except StopIteration as stop:
                logits, valid, pos, kc, vc = stop.value
                if tier == "int8":
                    # prefill attention ran FULL PRECISION chunk-to-chunk;
                    # quantize ONCE at the end — the same invariant as the
                    # monolithic _build_decode_cache (ops/kv_cache.py)
                    from glimpseprune_tpu.ops.kv_cache import quantize_kv

                    kq, ks = quantize_kv(kc)
                    vq, vs = quantize_kv(vc)
                    kc = {"q": kq, "s": ks}
                    vc = {"q": vq, "s": vs}
                return logits, valid, pos, kc, vc

    def vanilla_prefill_chunked_steps(self, prep: PreparedInputs,
                                      chunk_size: int):
        """Generator form for serving admission: yields after every prefill
        chunk (the scheduler interleaves decode chunks there) and returns a
        PrefillOut-shaped tuple with the kv stacks sliced to the real
        sequence and kept RAW — ContinuousBatcher's cache_fill_rows applies
        the batch cache's quant tier at fill."""
        out = yield from self._chunked_prefill_gen(prep, chunk_size, None)
        logits, valid, pos, kc, vc = out
        S = valid.shape[1]
        return logits, valid, pos, kc[:, :, :S], vc[:, :, :S]

    def _chunked_prefill_gen(self, prep: PreparedInputs, chunk_size: int,
                             prealloc_t: Optional[int]):
        # always a RAW cache here: chunk-to-chunk attention stays full
        # precision; quantized tiers convert once after the last chunk
        cfg = self.cfg
        inputs = self._device_inputs(prep, False)
        le_len = cfg.gp.le_length if cfg.gp.has_le else 0
        if le_len:
            # le slots are always the trailing slots in inference prep
            for key in ("input_ids", "valid"):
                inputs[key] = inputs[key][:, :-le_len]
            inputs["position_ids"] = inputs["position_ids"][:, :, :-le_len]
        ids = inputs["input_ids"]
        valid = inputs["valid"]
        pos = inputs["position_ids"]
        B, S = ids.shape
        C = int(chunk_size)
        n_chunks = (S + C - 1) // C
        Sp = n_chunks * C  # tail chunk padded with invalid slots

        image_embeds = None
        if prep.patches is not None:
            image_embeds = self._vision(
                {"params": self.params}, inputs["patches"],
                inputs["vis_pos_ids"], inputs["full_seg"], inputs["vis_valid"],
                dense_attn=_vis_dense_hint(prep),
            )[0]
        embeds = self._embed_imgs(
            {"params": self.params}, ids, image_embeds,
            inputs["packed_idx"], inputs["img_slots"], inputs["img_valid"],
        )
        if Sp > S:
            embeds = jnp.pad(embeds, ((0, 0), (0, Sp - S), (0, 0)))
            pos_p = jnp.pad(pos, ((0, 0), (0, 0), (0, Sp - S)))
        else:
            pos_p = pos

        from glimpseprune_tpu.ops.kv_cache import alloc_cache

        # the tail chunk writes (invalid, later-overwritten) slots up to Sp
        T = max(int(prealloc_t) if prealloc_t is not None else S, Sp)
        L = cfg.text.num_hidden_layers
        shape = (L, B, T, cfg.text.num_key_value_heads, cfg.text.head_dim)
        k_cache = alloc_cache(shape, embeds.dtype, "")
        v_cache = alloc_cache(shape, embeds.dtype, "")
        kv_valid = jnp.concatenate(
            [valid, jnp.zeros((B, T - S), dtype=bool)], axis=1)

        # the final REAL slot (S-1) sits mid-chunk when C does not divide S;
        # the head runs on exactly one slot per chunk (logit_index), so the
        # tail chunk never pays a [B, C, V] lm_head
        rel = (S - 1) - (n_chunks - 1) * C
        logits = None
        for i in range(n_chunks):
            sl = slice(i * C, (i + 1) * C)
            last = i == n_chunks - 1
            logits, k_cache, v_cache = self._prefill_chunk(
                {"params": self.params}, embeds[:, sl], pos_p[:, :, sl],
                k_cache, v_cache, kv_valid, jnp.int32(i * C),
                kv_valid[:, sl],  # chunk-internal key validity (left pads)
                jnp.int32(rel if last else C - 1),
            )
            if not last:
                yield i  # scheduler interleave point
        return logits, valid, pos, k_cache, v_cache

    def _decode_loop(self, logits, r_valid, r_pos, kv_k, kv_v, max_new_tokens,
                     eos, temperature: float = 0.0,
                     rng=None, chunk_size: int = 32, prealloc_t=None,
                     stop_sequences=None):
        """Decode over a compacted KV prefix; shared by every method.

        Runs `chunk_size` steps per jitted lax.scan call (on-device argmax/
        sampling + eos tracking) so per-token host dispatch is amortized; eos
        early exit is checked between chunks. temperature=0 -> greedy; >0 ->
        categorical sampling (GRPO, reference train_qwen_gp.py:1221-1247).

        prealloc_t: pass when kv_k/kv_v are ALREADY the full decode cache
        buffer [L, B, prealloc_t, Hkv, D] with the R prefix tokens written
        (a serving host assembling one decode batch from several prefill
        chunks avoids the alloc+copy spike of re-buffering a multi-GB full-
        context cache; r_valid stays [B, R])."""
        gen = self._run_decode(
            logits, r_valid, r_pos, kv_k, kv_v, max_new_tokens, eos,
            temperature, rng, chunk_size, prealloc_t=prealloc_t,
            stop_sequences=stop_sequences,
        )
        while True:
            try:
                next(gen)
            except StopIteration as stop:
                seqs = stop.value
                break
        return self._trim_eos(seqs, max_new_tokens, eos, stop_sequences)

    @staticmethod
    def _first_stop_match(row: np.ndarray, stop_sequences) -> int:
        """Earliest start index of any stop id-sequence in row, or -1."""
        best = -1
        for seq in stop_sequences:
            seq = np.asarray(seq, dtype=row.dtype)
            n = len(seq)
            if n == 0 or n > len(row):
                continue
            win = np.lib.stride_tricks.sliding_window_view(row, n)
            hits = np.nonzero((win == seq).all(axis=1))[0]
            if len(hits) and (best < 0 or hits[0] < best):
                best = int(hits[0])
        return best

    def _trim_eos(self, seqs, max_new_tokens, eos, stop_sequences=None):
        seqs = seqs[:, :max_new_tokens]
        # replace everything after the first eos (inclusive) / the first stop
        # sequence (exclusive — callers strip the stop string,
        # llava_gp/mm_utils.py:236) with eos; count generated tokens
        n_gen = np.zeros((seqs.shape[0],), dtype=np.int64)
        for b in range(seqs.shape[0]):
            hits = np.nonzero(seqs[b] == eos)[0]
            end = int(hits[0]) + 1 if len(hits) else max_new_tokens
            if stop_sequences:
                s = self._first_stop_match(seqs[b, :end], stop_sequences)
                if s >= 0:
                    end = s
            n_gen[b] = end
            seqs[b, end:] = eos
        return seqs, n_gen

    def _run_decode(self, logits, r_valid, r_pos, kv_k, kv_v, max_new_tokens,
                    eos, temperature, rng, chunk_size, prealloc_t=None,
                    stop_sequences=None):
        """Shared decode driver (generator): cache alloc + chunked jitted
        scan, YIELDING each [B, chunk] token array as it lands — the
        streaming hook. Returns seqs [B, n_chunks*chunk] via StopIteration."""
        cfg = self.cfg
        B = logits.shape[0]
        R = int(r_valid.shape[1])
        chunk = max(1, min(chunk_size, max_new_tokens))
        n_chunks = (max_new_tokens + chunk - 1) // chunk
        if prealloc_t is not None:
            if prealloc_t < R + n_chunks * chunk:
                raise ValueError(
                    f"prealloc_t={prealloc_t} < R + max_new rounded "
                    f"({R} + {n_chunks * chunk})")
            T = int(prealloc_t)
            k_cache, v_cache = kv_k, kv_v
        else:
            T = R + n_chunks * chunk
            kv_quant = getattr(cfg.text, "kv_cache_quant", "none")
            kv_quant = "" if kv_quant == "none" else kv_quant
            k_cache = _build_decode_cache(kv_k, t=T, quant=kv_quant)
            v_cache = _build_decode_cache(kv_v, t=T, quant=kv_quant)
        kv_valid = jnp.concatenate(
            [r_valid, jnp.zeros((B, T - R), dtype=bool)], axis=1
        )

        last_pos = r_pos[:, :, -1]  # [3, B]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng, sub = jax.random.split(rng)
        if temperature and temperature > 0:
            next_token = jax.random.categorical(
                sub, logits[:, -1].astype(jnp.float32) / temperature, axis=-1
            ).astype(jnp.int32)
        else:
            next_token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

        key = (chunk, float(temperature), int(eos))
        if getattr(self, "_decode_chunk_key", None) != key:
            self._decode_chunk_key = key

            def chunk_fn(params, tok, lp, kc, vc, kvv, ws, r):
                def run(m):
                    return m.decode_chunk(
                        tok, lp, kc, vc, kvv, ws, r,
                        n_steps=chunk, eos_token_id=eos, temperature=temperature,
                    )

                return self.model.apply(params, method=run)

            self._decode_chunk_jit = jax.jit(chunk_fn, donate_argnums=(3, 4, 5))

        seqs = np.full((B, n_chunks * chunk), eos, dtype=np.int64)
        for ci in range(n_chunks):
            rng, sub = jax.random.split(rng)
            toks, next_token, done, k_cache, v_cache, kv_valid = self._decode_chunk_jit(
                {"params": self.params}, next_token,
                last_pos + ci * chunk, k_cache, v_cache, kv_valid,
                jnp.int32(R + ci * chunk), sub,
            )
            toks = np.asarray(toks)
            seqs[:, ci * chunk : (ci + 1) * chunk] = toks
            yield toks
            finished = np.asarray(done)
            if stop_sequences:
                # host-side keyword stop between chunks (the on-device scan
                # only tracks single-token eos); a matched row counts as done
                done_sofar = (ci + 1) * chunk
                finished = finished | np.array([
                    self._first_stop_match(seqs[b, :done_sofar], stop_sequences) >= 0
                    for b in range(B)
                ])
            if bool(finished.all()):
                break
        return seqs

    def stream_generate(
        self,
        prep: PreparedInputs,
        max_new_tokens: int = 128,
        do_selection: bool = True,
        use_ref_masks: bool = False,
        eos_token_id: Optional[int] = None,
        chunk_size: int = 4,
        temperature: float = 0.0,
        rng=None,
        stop_sequences: Optional[Sequence[Sequence[int]]] = None,
    ):
        """Streaming decode: yields [B, chunk] new-token arrays as they are
        produced (reference demo_gp.py:90-209 streams through a
        TextIteratorStreamer thread; here the chunked on-device scan IS the
        increment — chunk_size=1 gives per-token streaming at one tunnel
        round-trip per token, larger chunks amortize it).

        The final GenerateResult (mask, prune ratio, eos-trimmed sequences)
        is returned via StopIteration.value, i.e.
        ``res = yield from runner.stream_generate(...)`` or the
        generator's ``.value`` after exhaustion.
        """
        cfg = self.cfg
        eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
        assert do_selection, "streaming implemented for the GP path"
        out = self._prefill(
            {"params": self.params},
            self._device_inputs(prep, use_ref_masks),
            out_len=prep.out_len, use_ref_masks=use_ref_masks,
            dense_attn=_vis_dense_hint(prep),
        )
        keep_img = np.asarray(out.keep_img)
        mask_logits = np.asarray(out.mask_logits)
        prune_ratio = 1.0 - keep_img.sum(1) / np.maximum(prep.n_img_tokens, 1)

        seqs = yield from self._run_decode(
            out.logits, out.valid, out.position_ids, out.kv_k, out.kv_v,
            max_new_tokens, eos, temperature, rng, chunk_size,
            stop_sequences=stop_sequences,
        )
        seqs, n_gen = self._trim_eos(seqs, max_new_tokens, eos, stop_sequences)
        return GenerateResult(
            sequences=seqs, num_generated=n_gen, keep_img=keep_img,
            mask_logits=mask_logits, prune_ratio=prune_ratio,
        )

    # ------------------------------------------------------------------ #
    # baseline compressors in the same harness (SURVEY.md §2.4)

    @time_logger
    def generate_compressed(
        self,
        prep: PreparedInputs,
        method: str,
        max_new_tokens: int = 128,
        visual_token_num: Optional[int] = None,
        dominant_ratio: float = 0.65,
        contextual_ratio: float = 0.05,
        stages: Tuple[Tuple[int, float], ...] = ((8, 0.5), (16, 0.25), (24, 0.125)),
        eos_token_id: Optional[int] = None,
        clip_text_ids=None,
        stop_sequences: Optional[Sequence[Sequence[int]]] = None,
    ) -> GenerateResult:
        """Run a baseline compressor end-to-end: visionzip / divprune /
        cdpruner prune before the LLM; pdrop (staged) prunes inside it.

        clip_text_ids [M, 77]: CDPruner question segments for the CLIP text
        tower (LLaVA models built with with_text_tower=True) — switches the
        relevance term to the reference's text-conditioned computation."""
        cfg = self.cfg
        eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
        B, N = prep.img_valid.shape
        inputs = self._device_inputs(prep, False)
        if method == "cdpruner" and clip_text_ids is not None:
            if not hasattr(self, "_cdp_rel_jit"):
                self._cdp_rel_jit = jax.jit(
                    lambda p, px, ids: self.model.apply(
                        p, px, ids, method=self.model.cdpruner_relevance
                    )
                )
            inputs["cdpruner_relevance_packed"] = self._cdp_rel_jit(
                {"params": self.params}, inputs["patches"],
                jnp.asarray(clip_text_ids),
            )
        le_len = cfg.gp.le_length if cfg.gp.has_le else 0
        if le_len:  # compressors run without the glimpse token
            inputs["input_ids"] = inputs["input_ids"][:, :-le_len]
            inputs["valid"] = inputs["valid"][:, :-le_len]
            inputs["position_ids"] = inputs["position_ids"][:, :, :-le_len]

        seq_mult = 64 if prep.input_ids.shape[1] % 64 == 0 else 8

        if method == "pdrop":
            from glimpseprune_tpu.compressors.staged import staged_drop_schedule

            valid_stages = tuple(
                (l, r) for l, r in stages if l < cfg.text.num_hidden_layers
            )
            out_lens = tuple(
                staged_drop_schedule(
                    int(prep.n_img_tokens.max()),
                    int(inputs["input_ids"].shape[1]), valid_stages,
                    round_to=seq_mult,
                )
            )
            logits, r_ids, r_valid, r_pos, kv_k, kv_v, is_img = self._staged(
                {"params": self.params}, inputs, valid_stages, out_lens,
                dense_attn=_vis_dense_hint(prep),
            )
            kept = jnp.asarray(is_img.sum(-1))
            keep_img = None
        else:
            if method == "vscan":
                keep_budget = visual_token_num or max(int(0.222 * N), 2)
            else:
                keep_budget = visual_token_num or max(
                    int((dominant_ratio + contextual_ratio) * N) + 2, 1
                )
            n_text = int(inputs["valid"].sum(1).max()) - int(prep.n_img_tokens.min())
            out_len = _round_up(
                int(inputs["input_ids"].shape[1]) - int(prep.n_img_tokens.min())
                + min(keep_budget, N),
                seq_mult,
            )
            out_len = min(out_len, int(inputs["input_ids"].shape[1]))
            logits, r_ids, r_valid, r_pos, kv_k, kv_v, keep_img = self._pre_llm_compress(
                {"params": self.params}, inputs, method, keep_budget, out_len,
                dominant_ratio, contextual_ratio,
                dense_attn=_vis_dense_hint(prep),
            )
            kept = jnp.asarray(keep_img.sum(-1))

        seqs, n_gen = self._decode_loop(
            logits, r_valid, r_pos, kv_k, kv_v, max_new_tokens, eos,
            stop_sequences=stop_sequences,
        )
        keep_np = None if keep_img is None else np.asarray(keep_img)
        return GenerateResult(
            sequences=seqs,
            num_generated=n_gen,
            keep_img=keep_np,
            mask_logits=None,
            prune_ratio=1.0 - np.asarray(kept) / np.maximum(prep.n_img_tokens, 1),
        )

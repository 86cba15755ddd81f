"""Differential validation against the reference's *executable* torch GP
implementation (VERDICT round-2 item #1).

The reference model classes (/root/reference/transformers_gp) are imported
through tests/reference_shim.py (transformers-4.57 compatibility seams only,
no behavioral patches beyond the documented upstream sdpa-harvest fix) and
run on CPU with the SAME random weights as the JAX stack — base weights via
models/qwen2_5_vl/convert.convert_hf_state_dict, GP new modules via
persistence.import_torch_new_modules on the reference's own
new_modules_to_be_saved payload.

Asserted numeric parity (reference model_gp.py cites):
- fuser input rows  = harvested masked log-softmax attention (:582-605)
- mask logits       = AttnFuserV1 output incl. ori-supervision row (:212-298)
- keep masks        = threshold/cap/floor policy (:1495-1549)
- reduced ids/positions = gathered-not-renumbered (:1552-1659)
- post-reduction last logits (:1663-1742)
- greedy tokens through HF generate (decode position continuation :2164-2169)
- oracle modes use_ref_masks / use_zero_masks (:1389-1398)
- do_selection=False ≡ vanilla model
- left-padded batches and multi-image rows
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.convert import convert_hf_state_dict
from glimpseprune_tpu.models.qwen2_5_vl.runner import (
    GlimpsePruneRunner,
    prepare_inputs,
)
from glimpseprune_tpu.persistence import import_torch_new_modules
from glimpseprune_tpu.preprocessing.image import preprocess_image

from reference_shim import (
    export_new_modules_state,
    load_reference_gp,
    make_reference_model,
)

ATOL_LOGITS = 2e-4
ATOL_MASK = 2e-4


# --------------------------------------------------------------------- #
# shared setup


@pytest.fixture(scope="module")
def stacks():
    """(our cfg, reference torch model, our runner) with shared weights."""
    cfg = tiny_test_config()
    ref_model, _ = make_reference_model(cfg, seed=0)
    params = convert_hf_state_dict(ref_model.state_dict(), cfg)
    params.update(import_torch_new_modules(export_new_modules_state(ref_model), cfg))
    runner = GlimpsePruneRunner(cfg, params)
    return cfg, ref_model, runner


def make_case(cfg, rng, sizes, pres=None, posts=None, answers=None):
    """One batch: per-row image size(s); returns (prep, ref_inputs).

    sizes[b] is an (h, w) tuple or a list of them (multi-image row).
    answers (training cases): per-row answer token lists — appended to the
    sequence, fed as answer_ids to prepare_inputs (which reserves the le
    slots at the answer start, matching the reference's labels-mode
    _append_le insertion, model_gp.py:1136-1158), and returned as LEFT-
    padded `labels` in ref_inputs (-100 off the answer).
    """
    B = len(sizes)
    pres = pres or [[int(x) for x in rng.integers(5, 400, int(rng.integers(2, 6)))] for _ in range(B)]
    posts = posts or [[int(x) for x in rng.integers(5, 400, int(rng.integers(2, 6)))] for _ in range(B)]

    prompts, images, seqs, all_patches, all_grids = [], [], [], [], []
    for b, sz in enumerate(sizes):
        row_sizes = sz if isinstance(sz, list) else [sz]
        row_imgs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for h, w in row_sizes]
        seq = list(pres[b])
        prompt = list(pres[b])
        for img in row_imgs:
            patches, grid = preprocess_image(img)
            all_patches.append(patches)
            all_grids.append(np.asarray(grid))
            n_img = int(np.prod(grid)) // (cfg.vision.spatial_merge_size ** 2)
            seq += [cfg.vision_start_token_id] + [cfg.image_token_id] * n_img + [cfg.vision_end_token_id]
            prompt += [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
        seq += posts[b]
        prompt += posts[b]
        if answers is not None:
            seq = seq + list(answers[b])
        seqs.append(seq)
        prompts.append(prompt)
        images.append(row_imgs if isinstance(sz, list) else row_imgs[0])

    prep = prepare_inputs(cfg, prompts, images, answer_ids=answers,
                          seq_multiple=8, patch_multiple=16)

    # reference side: LEFT padding (model_gp.py _check_padding_side)
    S = max(len(s) for s in seqs)
    input_ids = np.full((B, S), cfg.pad_token_id, dtype=np.int64)
    attn = np.zeros((B, S), dtype=np.int64)
    labels = np.full((B, S), -100, dtype=np.int64)
    for b, s in enumerate(seqs):
        input_ids[b, S - len(s):] = s
        attn[b, S - len(s):] = 1
        if answers is not None and len(answers[b]):
            labels[b, S - len(answers[b]):] = answers[b]
    ref_inputs = dict(
        input_ids=torch.tensor(input_ids),
        attention_mask=torch.tensor(attn),
        pixel_values=torch.tensor(np.concatenate(all_patches, axis=0)),
        image_grid_thw=torch.tensor(np.stack(all_grids, axis=0)),
    )
    if answers is not None:
        ref_inputs["labels"] = torch.tensor(labels)
    return prep, ref_inputs


def ref_forward(model, ref_inputs, **kw):
    ref = load_reference_gp()
    model.reset_image_tokens_cache()
    with torch.no_grad():
        return model(**ref_inputs, past_key_values=ref.ShimDynamicCache(), **kw)


def ref_generate(model, ref_inputs, max_new_tokens, **kw):
    ref = load_reference_gp()
    model.reset_image_tokens_cache()
    with torch.no_grad():
        out = model.generate(
            **ref_inputs, max_new_tokens=max_new_tokens, do_sample=False,
            use_cache=True, past_key_values=ref.ShimDynamicCache(), **kw,
        )
    return out[:, ref_inputs["input_ids"].shape[1]:].numpy()


def our_encode_debug(runner, prep, use_ref_masks=False):
    """glimpse_encode with return_harvest (no jit; tiny model)."""
    inputs = runner._device_inputs(prep, use_ref_masks)
    merged, taps = runner.model.apply(
        {"params": runner.params}, inputs["patches"], inputs["vis_pos_ids"],
        inputs["full_seg"], inputs["vis_valid"],
        method=runner.model.vision_encode,
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
            ref_token_masks=inputs.get("ref_token_masks"),
            use_ref_masks=use_ref_masks,
            img_group=inputs.get("img_group"),
            return_harvest=True,
        )

    return runner.model.apply({"params": runner.params}, method=enc)


def ref_rows_concat(tensors_per_image, grids, row_image_ids):
    """Concatenate the reference's per-image outputs for one batch row."""
    return torch.cat([tensors_per_image[i] for i in row_image_ids], dim=-1)


# --------------------------------------------------------------------- #
# tests


def test_harvest_and_mask_logits_parity(stacks):
    cfg, ref_model, runner = stacks
    rng = np.random.default_rng(1)
    prep, ref_inputs = make_case(cfg, rng, [(64, 96)])

    captured = {}

    def hook(mod, args):
        captured["attn_map"] = args[0].detach().clone()

    h = ref_model.attn_fuser.register_forward_pre_hook(hook)
    try:
        out = ref_forward(ref_model, ref_inputs, do_selection=True)
    finally:
        h.remove()

    mask_logits, state, _, harvest = our_encode_debug(runner, prep)

    iv = np.asarray(prep.img_valid[0])
    ours_rows = np.asarray(harvest)[0][iv]            # [n_img, n_sel*Hq]
    ref_rows = captured["attn_map"].numpy()           # [n_img, n_sel*Hq]
    np.testing.assert_allclose(ours_rows, ref_rows, atol=ATOL_MASK, rtol=0,
                               err_msg="harvested log-softmax rows differ")

    ours_ml = np.asarray(mask_logits)[:, 0, iv]       # [n_out, n_img]
    ref_ml = out.image_token_mask_logits[0].numpy()   # [n_out, n_img]
    assert ours_ml.shape == ref_ml.shape
    np.testing.assert_allclose(ours_ml, ref_ml, atol=ATOL_MASK, rtol=0,
                               err_msg="fuser mask logits differ")


def test_keep_mask_reduction_and_logits_parity(stacks):
    cfg, ref_model, runner = stacks
    rng = np.random.default_rng(2)
    prep, ref_inputs = make_case(cfg, rng, [(64, 96)])

    out = ref_forward(ref_model, ref_inputs, do_selection=True)
    ours = runner.glimpse(prep)

    # keep mask
    iv = np.asarray(prep.img_valid[0])
    ours_keep = np.asarray(ours.keep_img)[0][iv]
    ref_keep = out.image_token_bool_masks[0].numpy()
    np.testing.assert_array_equal(ours_keep, ref_keep)

    # reduced input ids + gathered-not-renumbered positions
    ref_valid = out.attention_mask[0].numpy().astype(bool)
    ref_ids = out.input_ids[0].numpy()[ref_valid]
    ref_pos = out.position_ids[:, 0].numpy()[:, ref_valid]
    our_valid = np.asarray(ours.valid)[0].astype(bool)
    our_ids = np.asarray(ours.input_ids)[0][our_valid]
    our_pos = np.asarray(ours.position_ids)[:, 0][:, our_valid]
    np.testing.assert_array_equal(our_ids, ref_ids)
    np.testing.assert_array_equal(our_pos, ref_pos)

    # post-reduction logits at the last position
    ref_last = out.logits[0, -1].numpy()
    our_last = np.asarray(ours.logits)[0, 0]
    np.testing.assert_allclose(our_last, ref_last, atol=ATOL_LOGITS, rtol=0)


def test_greedy_generate_parity_pruned_and_vanilla(stacks):
    cfg, ref_model, runner = stacks
    rng = np.random.default_rng(3)
    prep, ref_inputs = make_case(cfg, rng, [(64, 96)])

    for do_sel in (True, False):
        ref_toks = ref_generate(ref_model, ref_inputs, 8, do_selection=do_sel)
        res = runner.generate(prep, max_new_tokens=8, do_selection=do_sel)
        ours = np.asarray(res.sequences)
        np.testing.assert_array_equal(
            ours, ref_toks,
            err_msg=f"greedy tokens differ (do_selection={do_sel})",
        )


def test_left_padded_batch_parity(stacks):
    cfg, ref_model, runner = stacks
    rng = np.random.default_rng(4)
    # different prompt + image sizes per row -> real left padding on the
    # reference side
    prep, ref_inputs = make_case(cfg, rng, [(64, 96), (56, 56)])

    out = ref_forward(ref_model, ref_inputs, do_selection=True)
    ours = runner.glimpse(prep)

    for b in range(2):
        iv = np.asarray(prep.img_valid[b])
        np.testing.assert_allclose(
            np.asarray(ours.mask_logits)[:, b, iv],
            out.image_token_mask_logits[b].numpy(),
            atol=ATOL_MASK, rtol=0, err_msg=f"row {b} mask logits",
        )
        np.testing.assert_array_equal(
            np.asarray(ours.keep_img)[b][iv],
            out.image_token_bool_masks[b].numpy(),
            err_msg=f"row {b} keep mask",
        )
        ref_valid = out.attention_mask[b].numpy().astype(bool)
        our_valid = np.asarray(ours.valid)[b].astype(bool)
        np.testing.assert_array_equal(
            np.asarray(ours.input_ids)[b][our_valid],
            out.input_ids[b].numpy()[ref_valid], err_msg=f"row {b} ids",
        )
        np.testing.assert_array_equal(
            np.asarray(ours.position_ids)[:, b][:, our_valid],
            out.position_ids[:, b].numpy()[:, ref_valid],
            err_msg=f"row {b} positions",
        )
        np.testing.assert_allclose(
            np.asarray(ours.logits)[b, 0], out.logits[b, -1].numpy(),
            atol=ATOL_LOGITS, rtol=0, err_msg=f"row {b} logits",
        )

    ref_toks = ref_generate(ref_model, ref_inputs, 6, do_selection=True)
    res = runner.generate(prep, max_new_tokens=6, do_selection=True)
    np.testing.assert_array_equal(np.asarray(res.sequences), ref_toks)


def test_multi_image_row_parity(stacks):
    cfg, ref_model, runner = stacks
    rng = np.random.default_rng(5)
    prep, ref_inputs = make_case(cfg, rng, [[(64, 96), (56, 56)]])

    out = ref_forward(ref_model, ref_inputs, do_selection=True)
    ours = runner.glimpse(prep)

    iv = np.asarray(prep.img_valid[0])
    np.testing.assert_allclose(
        np.asarray(ours.mask_logits)[:, 0, iv],
        out.image_token_mask_logits[0].numpy(),
        atol=ATOL_MASK, rtol=0,
    )
    # per-image keep masks concatenate in marker order
    ref_keep = np.concatenate([m.numpy() for m in out.image_token_bool_masks])
    np.testing.assert_array_equal(np.asarray(ours.keep_img)[0][iv], ref_keep)

    ref_valid = out.attention_mask[0].numpy().astype(bool)
    our_valid = np.asarray(ours.valid)[0].astype(bool)
    np.testing.assert_array_equal(
        np.asarray(ours.input_ids)[0][our_valid],
        out.input_ids[0].numpy()[ref_valid],
    )
    np.testing.assert_allclose(
        np.asarray(ours.logits)[0, 0], out.logits[0, -1].numpy(),
        atol=ATOL_LOGITS, rtol=0,
    )


def test_use_ref_masks_parity(stacks):
    cfg, ref_model, runner = stacks
    rng = np.random.default_rng(6)
    # bbox chosen so the kept fraction stays under max_remain_ratio: the
    # cap/floor top-k over the resulting all-equal probabilities would be a
    # pure tie-break, which torch.topk leaves unspecified
    bboxes = [[[0.0, 0.0, 0.45, 0.45]]]
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    prep = prepare_inputs(
        cfg,
        [[10, 11, cfg.vision_start_token_id, cfg.image_token_id,
          cfg.vision_end_token_id, 20, 21]],
        [img], normed_bboxes=bboxes, seq_multiple=8, patch_multiple=16,
    )
    patches, grid = preprocess_image(img)
    img_tokens = int(prep.n_img_tokens[0])
    seq = ([10, 11, cfg.vision_start_token_id]
           + [cfg.image_token_id] * img_tokens
           + [cfg.vision_end_token_id, 20, 21])
    ref_inputs = dict(
        input_ids=torch.tensor([seq]),
        attention_mask=torch.ones(1, len(seq), dtype=torch.long),
        pixel_values=torch.tensor(patches),
        image_grid_thw=torch.tensor(np.asarray(grid)[None]),
    )
    iv = np.asarray(prep.img_valid[0])
    ref_masks = [torch.tensor(np.asarray(prep.ref_token_masks)[0][iv])]

    out = ref_forward(ref_model, ref_inputs, do_selection=True,
                      use_ref_masks=True, ref_token_masks=ref_masks)
    ours = runner.glimpse(prep, use_ref_masks=True)

    np.testing.assert_array_equal(
        np.asarray(ours.keep_img)[0][iv],
        out.image_token_bool_masks[0].numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(ours.logits)[0, 0], out.logits[0, -1].numpy(),
        atol=ATOL_LOGITS, rtol=0,
    )


def test_use_zero_masks_parity(stacks):
    cfg, ref_model, runner = stacks
    rng = np.random.default_rng(7)
    prep, ref_inputs = make_case(cfg, rng, [(64, 96)])

    ref_model.config.use_zero_masks = True
    try:
        out = ref_forward(ref_model, ref_inputs, do_selection=True)
    finally:
        ref_model.config.use_zero_masks = False

    cfg_zero = cfg.replace_gp(use_zero_masks=True)
    runner_zero = GlimpsePruneRunner(cfg_zero, runner.params)
    ours = runner_zero.glimpse(prep)

    # all probabilities are exactly 0, so min_remain_num's top-k is a pure
    # tie-break (torch.topk order is unspecified): assert the POLICY
    # outcome — exactly min_remain_num survivors on both sides
    iv = np.asarray(prep.img_valid[0])
    assert int(np.asarray(ours.keep_img)[0][iv].sum()) == cfg.gp.min_remain_num
    assert int(out.image_token_bool_masks[0].sum()) == cfg.gp.min_remain_num


def test_delayed_selection_parity(stacks):
    """Two-phase API: phase-1 logits fed back via image_token_mask_logits
    must produce the same reduced state as the one-shot path (reference
    _do_delayed_selection, model_gp.py:1458-1492)."""
    cfg, ref_model, runner = stacks
    rng = np.random.default_rng(8)
    prep, ref_inputs = make_case(cfg, rng, [(64, 96)])

    # reference: delay then apply
    ref = load_reference_gp()
    ref_model.reset_image_tokens_cache()
    with torch.no_grad():
        out1 = ref_model(**ref_inputs, past_key_values=ref.ShimDynamicCache(),
                         do_selection=True, delay_selection=True)
        out2 = ref_model(**ref_inputs, do_selection=True,
                         image_token_mask_logits=out1.image_token_mask_logits)
    ref_model.reset_image_tokens_cache()

    # ours: glimpse_delayed + apply_selection
    mask_logits, state = runner.glimpse_delayed(prep)
    ours = runner.apply_selection(state, mask_logits, prep.out_len,
                                  None if prep.anchor_mask is None
                                  else jnp.asarray(prep.anchor_mask))

    iv = np.asarray(prep.img_valid[0])
    np.testing.assert_allclose(
        np.asarray(mask_logits)[:, 0, iv],
        out1.image_token_mask_logits[0].numpy(),
        atol=ATOL_MASK, rtol=0,
    )
    ref_valid = out2.attention_mask[0].numpy().astype(bool)
    our_valid = np.asarray(ours.valid)[0].astype(bool)
    np.testing.assert_array_equal(
        np.asarray(ours.input_ids)[0][our_valid],
        out2.input_ids[0].numpy()[ref_valid],
    )
    np.testing.assert_allclose(
        np.asarray(ours.logits)[0, 0], out2.logits[0, -1].numpy(),
        atol=ATOL_LOGITS, rtol=0,
    )

"""Differential validation of the LLaVA-1.5 GP pipeline against the
reference's *executable* torch implementation (VERDICT round-2 item #1,
second half: "do the same for llava_gp if its fork imports").

The reference fork (/root/reference/llava_gp/model/language_model/
llava_llama.py) is imported through tests/reference_shim_llava.py
(transformers-4.57 + offline seams, each documented there) and runs on CPU
with the SAME random weights as the JAX stack — base weights via
models/llava/convert.convert_llava_state_dict, GP new modules via
persistence.import_torch_new_modules on the fork's own
new_modules_to_be_saved payload (llava_llama.py:644-650).

Asserted numeric parity (reference llava_llama.py cites):
- fuser input rows  = harvested masked log-softmax attention (:399-423)
- mask logits       = AttnFuserV1 output incl. ori-supervision row (:203-277)
- keep masks        = threshold/cap/floor policy (:1115-1167)
- reduced ids/positions/mask = gathered-not-renumbered (:1169-1274)
- post-reduction last logits (:1275-1341)
- greedy tokens incl. decode position continuation (:1934-1966 semantics)
- oracle modes use_ref_masks / use_zero_masks (:1519-1529)
- do_selection=False ≡ vanilla prefill+decode (llm_forward_prefilling)
- left-padded batches (tokenizer_padding_side="left", :1360)
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from glimpseprune_tpu.config import GPConfig
from glimpseprune_tpu.models.llava.convert import convert_llava_state_dict
from glimpseprune_tpu.models.llava.gp_model import (
    CLIPTowerConfig,
    llama_text_config,
    llava_config,
)
from glimpseprune_tpu.models.llava.runner import (
    expand_to_square_and_resize,
    llava_normalize,
    make_llava_runner,
    prepare_llava_inputs,
)
from glimpseprune_tpu.persistence import import_torch_new_modules

from reference_shim_llava import (
    export_new_modules_state,
    load_reference_llava_gp,
    make_reference_llava_model,
)

ATOL_LOGITS = 2e-4
ATOL_MASK = 2e-4

# the fork's IMAGE_TOKEN_INDEX (llava/constants.py); our input_ids carry
# cfg.image_token_id in the same slots — map before comparing reduced ids
IMAGE_TOKEN_INDEX = -200


def tiny_clip_cfg():
    return CLIPTowerConfig(
        depth=3, hidden_size=32, num_heads=4, intermediate_size=64,
        patch_size=14, image_size=56, feature_layer=-2,
    )


def tiny_llava_config():
    text = llama_text_config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, vocab_size=512,
        rms_norm_eps=1e-6,
    )
    gp = GPConfig(
        selected_layers=(1,), reduce_layer=1, selected_visual_layers=(1, 0),
        attn_fuse_size=16, visual_cond_size=16, attn_fuse_num_heads=4,
        attn_fuse_global=True, le_layers=(0, 1, 2), le_length=1,
        max_remain_ratio=0.5,
    )
    cfg = llava_config(clip=tiny_clip_cfg(), text=text, gp=gp)
    return dataclasses.replace(
        cfg, image_token_id=500, eos_token_id=502, pad_token_id=0)


@pytest.fixture(scope="module")
def stacks():
    """(our cfg, clip cfg, reference torch model, our runner), shared
    weights exported from the reference model's own state_dict."""
    cfg = tiny_llava_config()
    cc = tiny_clip_cfg()
    ref_model, _ = make_reference_llava_model(cfg, cc, seed=0)
    params = convert_llava_state_dict(ref_model.state_dict(), cfg, cc)
    params.update(
        import_torch_new_modules(export_new_modules_state(ref_model), cfg))
    runner = make_llava_runner(cfg, cc, params)
    return cfg, cc, ref_model, runner


def make_case(cfg, cc, rng, n_rows, pres=None, posts=None, answers=None):
    """One batch of n_rows single-image prompts with per-row text lengths.

    Returns (our PreparedInputs, reference inputs dict). Pixels go through
    the SAME square-pad+resize+normalize on both sides. answers (training
    cases): appended to the sequence, fed as answer_ids to
    prepare_llava_inputs (le slots at the answer start) and returned as
    raw-marker-layout `labels` in ref_inputs (the fork expands labels
    alongside the ids in prepare_inputs_labels_for_multimodal)."""
    B = n_rows
    pres = pres or [
        [int(x) for x in rng.integers(5, 400, int(rng.integers(2, 6)))]
        for _ in range(B)]
    posts = posts or [
        [int(x) for x in rng.integers(5, 400, int(rng.integers(2, 6)))]
        for _ in range(B)]
    sizes = [(int(rng.integers(40, 90)), int(rng.integers(40, 90)))
             for _ in range(B)]
    images = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
              for h, w in sizes]

    prompts = [pres[b] + [cfg.image_token_id] + posts[b] for b in range(B)]
    prep = prepare_llava_inputs(cfg, cc, prompts, images,
                                answer_ids=answers, seq_multiple=8)

    # reference side: raw marker rows, LEFT padding
    rows = [pres[b] + [IMAGE_TOKEN_INDEX] + posts[b]
            + (list(answers[b]) if answers is not None else [])
            for b in range(B)]
    L = max(len(r) for r in rows)
    ids = np.full((B, L), cfg.pad_token_id, dtype=np.int64)
    mask = np.zeros((B, L), dtype=np.int64)
    labels = np.full((B, L), -100, dtype=np.int64)
    for b, r in enumerate(rows):
        ids[b, L - len(r):] = r
        mask[b, L - len(r):] = 1
        if answers is not None and len(answers[b]):
            labels[b, L - len(answers[b]):] = answers[b]
    pixels = np.stack([
        llava_normalize(expand_to_square_and_resize(im, cc.image_size))
        for im in images])
    ref_inputs = dict(
        input_ids=torch.tensor(ids),
        attention_mask=torch.tensor(mask),
        # any non-None value: prepare_inputs_labels_for_multimodal recomputes
        # expanded positions only when the input is not None (llava_llama.py
        # :939-941), matching the HF-generate flow where
        # prepare_inputs_for_generation supplies them
        position_ids=torch.zeros((B, L), dtype=torch.long),
        images=torch.tensor(
            pixels.transpose(0, 3, 1, 2), dtype=torch.float32),
    )
    if answers is not None:
        ref_inputs["labels"] = torch.tensor(labels)
    return prep, ref_inputs


def ref_forward(model, ref_inputs, **kw):
    ref = load_reference_llava_gp()
    model.reset_image_tokens_cache()
    with torch.no_grad():
        return model(**ref_inputs, use_cache=True, return_dict=True,
                     past_key_values=ref.ShimLlavaCache(), **kw)


def ref_greedy(model, ref_inputs, max_new_tokens, eos, **kw):
    """The fork's generate contract driven manually: glimpse/vanilla prefill,
    then per-step llm_forward with position = last position + 1 and the
    attention mask extended by one (prepare_inputs_for_generation +
    _update_model_kwargs_for_generation semantics, llava_llama.py:1847-1966).
    Post-processed like ours: everything after the first eos -> eos."""
    out = ref_forward(model, ref_inputs, do_selection=kw.pop("do_selection"),
                      **kw)
    cur_mask = out.attention_mask
    cur_pos = out.position_ids[:, -1:] + 1
    cache = out.past_key_values
    logits = out.logits[:, -1]
    toks = []
    with torch.no_grad():
        for _ in range(max_new_tokens):
            nt = logits.argmax(-1, keepdim=True)
            toks.append(nt)
            cur_mask = torch.cat(
                [cur_mask, torch.ones_like(cur_mask[:, :1])], dim=-1)
            step = model(
                input_ids=nt, attention_mask=cur_mask, position_ids=cur_pos,
                past_key_values=cache, use_cache=True, do_selection=False,
                return_dict=True)
            logits = step.logits[:, -1]
            cur_pos = cur_pos + 1
    seqs = torch.cat(toks, dim=1).numpy()
    for b in range(seqs.shape[0]):
        hits = np.nonzero(seqs[b] == eos)[0]
        if len(hits):
            seqs[b, int(hits[0]) + 1:] = eos
    return seqs


def our_encode_debug(runner, prep):
    """glimpse_encode with return_harvest (no jit; tiny model)."""
    import jax.numpy as jnp

    inputs = runner._device_inputs(prep, False)
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
            use_ref_masks=False,
            img_group=inputs.get("img_group"),
            return_harvest=True,
        )

    return runner.model.apply({"params": runner.params}, method=enc)


def assert_row_parity(prep, ours, out, cfg, b):
    """Shared per-row checks: mask logits, keep, reduced ids/positions/
    logits."""
    np.testing.assert_allclose(
        np.asarray(ours.mask_logits)[:, b],
        out.image_token_mask_logits[b].numpy(),
        atol=ATOL_MASK, rtol=0, err_msg=f"row {b} mask logits")
    np.testing.assert_array_equal(
        np.asarray(ours.keep_img)[b],
        out.image_token_bool_masks[b].numpy(), err_msg=f"row {b} keep mask")

    ref_valid = out.attention_mask[b].numpy().astype(bool)
    ref_ids = out.input_ids[b].numpy()[ref_valid]
    ref_ids = np.where(ref_ids == IMAGE_TOKEN_INDEX, cfg.image_token_id,
                       ref_ids)
    our_valid = np.asarray(ours.valid)[b].astype(bool)
    np.testing.assert_array_equal(
        np.asarray(ours.input_ids)[b][our_valid], ref_ids,
        err_msg=f"row {b} reduced ids")
    np.testing.assert_array_equal(
        np.asarray(ours.position_ids)[0, b][our_valid],
        out.position_ids[b].numpy()[ref_valid],
        err_msg=f"row {b} gathered positions")
    np.testing.assert_allclose(
        np.asarray(ours.logits)[b, 0], out.logits[b, -1].numpy(),
        atol=ATOL_LOGITS, rtol=0, err_msg=f"row {b} post-reduction logits")


# --------------------------------------------------------------------- #
# tests


def test_harvest_and_mask_logits_parity(stacks):
    cfg, cc, ref_model, runner = stacks
    rng = np.random.default_rng(1)
    prep, ref_inputs = make_case(cfg, cc, rng, 1)

    captured = {}

    def hook(mod, args):
        captured["attn_map"] = args[0].detach().clone()

    h = ref_model.attn_fuser.register_forward_pre_hook(hook)
    try:
        out = ref_forward(ref_model, ref_inputs, do_selection=True)
    finally:
        h.remove()

    mask_logits, state, _, harvest = our_encode_debug(runner, prep)

    ours_rows = np.asarray(harvest)[0]                # [N, n_sel*Hq]
    ref_rows = captured["attn_map"][0].numpy()        # [N, n_sel*Hq]
    np.testing.assert_allclose(ours_rows, ref_rows, atol=ATOL_MASK, rtol=0,
                               err_msg="harvested log-softmax rows differ")

    ours_ml = np.asarray(mask_logits)[:, 0]           # [n_out, N]
    ref_ml = out.image_token_mask_logits[0].numpy()   # [n_out, N]
    assert ours_ml.shape == ref_ml.shape
    np.testing.assert_allclose(ours_ml, ref_ml, atol=ATOL_MASK, rtol=0,
                               err_msg="fuser mask logits differ")


def test_keep_mask_reduction_and_logits_parity(stacks):
    cfg, cc, ref_model, runner = stacks
    rng = np.random.default_rng(2)
    prep, ref_inputs = make_case(cfg, cc, rng, 1)

    out = ref_forward(ref_model, ref_inputs, do_selection=True)
    ours = runner.glimpse(prep)
    assert_row_parity(prep, ours, out, cfg, 0)


def test_left_padded_batch_parity(stacks):
    cfg, cc, ref_model, runner = stacks
    rng = np.random.default_rng(3)
    prep, ref_inputs = make_case(cfg, cc, rng, 3)

    out = ref_forward(ref_model, ref_inputs, do_selection=True)
    ours = runner.glimpse(prep)
    for b in range(3):
        assert_row_parity(prep, ours, out, cfg, b)


def test_greedy_generate_parity_pruned_and_vanilla(stacks):
    cfg, cc, ref_model, runner = stacks
    rng = np.random.default_rng(4)
    prep, ref_inputs = make_case(cfg, cc, rng, 2)

    for do_sel in (True, False):
        ref_toks = ref_greedy(ref_model, ref_inputs, 8, cfg.eos_token_id,
                              do_selection=do_sel)
        res = runner.generate(prep, max_new_tokens=8, do_selection=do_sel)
        np.testing.assert_array_equal(
            np.asarray(res.sequences), ref_toks,
            err_msg=f"greedy tokens differ (do_selection={do_sel})")


def test_use_ref_masks_parity(stacks):
    cfg, cc, ref_model, runner = stacks
    rng = np.random.default_rng(5)
    # bbox mask chosen under max_remain_ratio so the cap top-k never
    # tie-breaks equal probabilities (unspecified order in torch.topk)
    prompts = [[10, 11, cfg.image_token_id, 20, 21]]
    images = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)]
    bboxes = [[[0.0, 0.0, 0.45, 0.45]]]
    prep = prepare_llava_inputs(cfg, cc, prompts, images,
                                normed_bboxes=bboxes, seq_multiple=8)

    rows = [[10, 11, IMAGE_TOKEN_INDEX, 20, 21]]
    ref_inputs = dict(
        input_ids=torch.tensor(np.asarray(rows, np.int64)),
        attention_mask=torch.ones(1, 5, dtype=torch.long),
        position_ids=torch.zeros((1, 5), dtype=torch.long),
        images=torch.tensor(
            llava_normalize(
                expand_to_square_and_resize(images[0], cc.image_size)
            ).transpose(2, 0, 1)[None], dtype=torch.float32),
    )
    ref_masks = [torch.tensor(np.asarray(prep.ref_token_masks)[0])]

    out = ref_forward(ref_model, ref_inputs, do_selection=True,
                      use_ref_masks=True, ref_token_masks=ref_masks)
    ours = runner.glimpse(prep, use_ref_masks=True)

    np.testing.assert_array_equal(
        np.asarray(ours.keep_img)[0],
        out.image_token_bool_masks[0].numpy())
    np.testing.assert_allclose(
        np.asarray(ours.logits)[0, 0], out.logits[0, -1].numpy(),
        atol=ATOL_LOGITS, rtol=0)


def test_delayed_selection_parity(stacks):
    """Two-phase API: phase-1 logits fed back via image_token_mask_logits
    must produce the same reduced state as the one-shot path (reference
    _do_delayed_selection, llava_llama.py:1587-1622; the apply call is
    forward(do_selection=False, image_token_mask_logits=...) because the
    todo_selection branch is an elif on do_selection)."""
    cfg, cc, ref_model, runner = stacks
    rng = np.random.default_rng(7)
    prep, ref_inputs = make_case(cfg, cc, rng, 1)

    ref = load_reference_llava_gp()
    ref_model.reset_image_tokens_cache()
    with torch.no_grad():
        out1 = ref_model(**ref_inputs, use_cache=True, return_dict=True,
                         past_key_values=ref.ShimLlavaCache(),
                         do_selection=True, delay_selection=True)
        out2 = ref_model(**ref_inputs, use_cache=True, return_dict=True,
                         do_selection=False,
                         image_token_mask_logits=out1.image_token_mask_logits)
    ref_model.reset_image_tokens_cache()

    import jax.numpy as jnp

    mask_logits, state = runner.glimpse_delayed(prep)
    ours = runner.apply_selection(state, mask_logits, prep.out_len,
                                  None if prep.anchor_mask is None
                                  else jnp.asarray(prep.anchor_mask))

    np.testing.assert_allclose(
        np.asarray(mask_logits)[:, 0],
        out1.image_token_mask_logits[0].numpy(), atol=ATOL_MASK, rtol=0)
    ref_valid = out2.attention_mask[0].numpy().astype(bool)
    ref_ids = out2.input_ids[0].numpy()[ref_valid]
    ref_ids = np.where(ref_ids == IMAGE_TOKEN_INDEX, cfg.image_token_id,
                       ref_ids)
    our_valid = np.asarray(ours.valid)[0].astype(bool)
    np.testing.assert_array_equal(
        np.asarray(ours.input_ids)[0][our_valid], ref_ids)
    np.testing.assert_allclose(
        np.asarray(ours.logits)[0, 0], out2.logits[0, -1].numpy(),
        atol=ATOL_LOGITS, rtol=0)


def test_use_zero_masks_parity(stacks):
    cfg, cc, ref_model, runner = stacks
    rng = np.random.default_rng(6)
    prep, ref_inputs = make_case(cfg, cc, rng, 1)

    ref_model.config.use_zero_masks = True
    try:
        out = ref_forward(ref_model, ref_inputs, do_selection=True)
    finally:
        ref_model.config.use_zero_masks = False

    cfg_zero = cfg.replace_gp(use_zero_masks=True)
    runner_zero = make_llava_runner(cfg_zero, tiny_clip_cfg(), runner.params)
    ours = runner_zero.glimpse(prep)

    # all probabilities exactly 0: min_remain_num top-k is a pure tie-break
    # (torch.topk order unspecified) — assert the POLICY outcome
    assert int(np.asarray(ours.keep_img)[0].sum()) == cfg.gp.min_remain_num
    assert int(out.image_token_bool_masks[0].sum()) == cfg.gp.min_remain_num


def test_sft_labels_mode_parity(stacks):
    """Training (labels) mode: the fork inserts the glimpse token at the
    answer start (_append_le labels branch, llava_llama.py:1041-1082) and
    harvests under the PAD mask only (_cal_attn_weights :399-424) — answer
    keys after the glimpse slot join the log-softmax normalization. Mask
    logits and the le CE must match on shared weights."""
    import jax.numpy as jnp

    cfg, cc, ref_model, runner = stacks
    rng = np.random.default_rng(21)
    answers = [[31, 32, 33], [41, 42, 43]]
    prep, ref_inputs = make_case(cfg, cc, rng, 2, answers=answers)
    labels_ref = ref_inputs.pop("labels")

    out = ref_forward(ref_model, ref_inputs, do_selection=True,
                      delay_selection=True, labels=labels_ref)

    inputs = runner._device_inputs(prep, False)
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
            labels=jnp.asarray(prep.labels),
            training=False,
        )

    mask_logits, _state, le_loss = runner.model.apply(
        {"params": runner.params}, method=enc)

    for b in range(2):
        np.testing.assert_allclose(
            np.asarray(mask_logits)[:, b],
            out.image_token_mask_logits[b].numpy(),
            atol=ATOL_MASK, rtol=0, err_msg=f"row {b} SFT-mode mask logits")
    np.testing.assert_allclose(float(le_loss), float(out.le_loss),
                               atol=5e-5, err_msg="le CE loss differs")


def test_image_preprocessing_matches_fork_process_images():
    """Our 'pad' preprocessing == the fork's process_images pipeline run
    with the INSTALLED transformers CLIPImageProcessor (expand2square with
    the CLIP-mean background, bicubic resize, CLIP normalization) — the
    one llava input surface the shared-pixels differentials bypass.
    BIT-exact across aspect ratios."""
    import importlib.util
    import sys

    import numpy as np
    import torch
    from PIL import Image
    from transformers import CLIPImageProcessor

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "llava_gp_mm_utils", "/root/reference/llava_gp/mm_utils.py")
    mm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mm)

    proc = CLIPImageProcessor(
        size={"shortest_edge": 336}, crop_size={"height": 336, "width": 336},
        do_center_crop=True, do_resize=True, do_normalize=True,
        do_rescale=True, do_convert_rgb=True,
        image_mean=[0.48145466, 0.4578275, 0.40821073],
        image_std=[0.26862954, 0.26130258, 0.27577711],
    )
    rng = np.random.default_rng(7)
    for h, w in [(123, 310), (336, 336), (48, 72), (500, 200)]:
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        sq = mm.expand2square(
            Image.fromarray(arr),
            tuple(int(x * 255) for x in proc.image_mean))
        ref = proc.preprocess(sq, return_tensors="pt")["pixel_values"][0]
        ref = ref.permute(1, 2, 0).numpy()  # CHW -> HWC

        ours = llava_normalize(expand_to_square_and_resize(arr, 336))
        # bit-exact: same PIL bicubic resample, same pad color, same
        # normalize constants
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"size {(h, w)}")

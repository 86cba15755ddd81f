"""Base training recipe: loss wiring, frozen base, mask-IoU improves on a toy task."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs
from glimpseprune_tpu.training import (
    init_train_state,
    make_train_step,
    split_params,
)


def build_batch(cfg, rng, with_labels=True):
    prompts = []
    answers = [] if with_labels else None
    for _ in range(2):
        prompts.append(
            [int(x) for x in rng.integers(5, 400, 4)]
            + [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
            + [int(x) for x in rng.integers(5, 400, 3)]
        )
        if with_labels:
            answers.append([int(x) for x in rng.integers(5, 400, 4)])
    images = [
        rng.integers(0, 255, (64, 96, 3), dtype=np.uint8),
        rng.integers(0, 255, (56, 56, 3), dtype=np.uint8),
    ]
    bboxes = [[[0.0, 0.0, 0.5, 1.0]], [[0.5, 0.5, 1.0, 1.0]]]
    prep = prepare_inputs(
        cfg, prompts, images, normed_bboxes=bboxes, answer_ids=answers,
        seq_multiple=8, patch_multiple=16,
    )
    batch = {
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
        "fuser_window_index": jnp.asarray(prep.fuser.window_index),
        "fuser_reverse_index": jnp.asarray(prep.fuser.reverse_index),
        "fuser_segment_ids": jnp.asarray(prep.fuser.segment_ids),
        "fuser_pos_ids": jnp.asarray(prep.fuser.pos_ids),
        "le_start": jnp.asarray(prep.le_start),
        "ref_token_masks": jnp.asarray(prep.ref_token_masks),
    }
    if with_labels:
        batch["labels"] = jnp.asarray(prep.labels)
    return prep, batch


def init_params(cfg, prep):
    model = Qwen2_5_VL_GP(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prep.input_ids), jnp.asarray(prep.valid),
        jnp.asarray(prep.position_ids), jnp.asarray(prep.patches),
        jnp.asarray(prep.vis_pos_ids), jnp.asarray(prep.full_seg),
        jnp.asarray(prep.vis_valid), jnp.asarray(prep.packed_idx),
        jnp.asarray(prep.img_slots), jnp.asarray(prep.img_valid),
        jnp.asarray(prep.fuser.window_index), jnp.asarray(prep.fuser.reverse_index),
        jnp.asarray(prep.fuser.segment_ids), jnp.asarray(prep.fuser.pos_ids),
        jnp.asarray(prep.le_start), prep.out_len,
    )
    return model, variables["params"]


def test_split_params():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng)
    _, params = init_params(cfg, prep)
    trainable, frozen = split_params(params)
    assert set(trainable) == {"attn_fuser", "learnable_embeddings", "le_proj", "le_norm"}
    assert "text" in frozen and "visual" in frozen
    n_train = sum(x.size for x in jax.tree_util.tree_leaves(trainable))
    n_total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n_train < 0.2 * n_total


def test_train_step_learns_masks():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, batch = build_batch(cfg, rng)
    model, params = init_params(cfg, prep)

    opt = optax.adam(3e-3)
    step_fn = jax.jit(make_train_step(cfg, model, opt))
    state, frozen = init_train_state(params, opt)

    key = jax.random.PRNGKey(1)
    first = None
    metrics = None
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, frozen, batch, sub)
        if first is None:
            first = jax.tree_util.tree_map(float, metrics)
    last = jax.tree_util.tree_map(float, metrics)
    assert last["loc_loss"] < first["loc_loss"], (first, last)
    assert last["mask_iou"] > 0.8, last  # toy task: memorize the bbox mask
    assert np.isfinite(last["le_loss"])

    # frozen base params untouched by construction (separate tree)
    t0, _ = split_params(params)
    changed = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), t0, state.trainable
    )
    assert max(jax.tree_util.tree_leaves(changed)) > 0


def test_remat_matches_no_remat():
    """cfg.text.remat changes only the backward memory plan, not values."""
    import dataclasses
    import optax
    from glimpseprune_tpu.training.train_step import make_train_step, init_train_state

    cfg = tiny_test_config()
    rng = np.random.default_rng(5)
    prep, batch = build_batch(cfg, rng)
    _, params = init_params(cfg, prep)
    opt = optax.sgd(1e-2)

    outs = []
    for remat in (False, True):
        c = dataclasses.replace(cfg, text=dataclasses.replace(cfg.text, remat=remat))
        model = Qwen2_5_VL_GP(c)
        state, frozen = init_train_state(params, opt)
        step = jax.jit(make_train_step(c, model, opt))
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(0))
        outs.append((state, metrics))
    np.testing.assert_allclose(
        float(outs[0][1]["loss"]), float(outs[1][1]["loss"]), rtol=1e-6
    )
    a = jax.tree_util.tree_leaves(outs[0][0].trainable)
    b = jax.tree_util.tree_leaves(outs[1][0].trainable)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6)


def test_chunked_nll_equals_full_ce():
    """chunked_nll (scan+remat over C-token slices) must equal the full
    [B, S, V] log_softmax + one-hot CE it replaced — incl. odd sequence
    lengths that force tail padding, and grads through the hidden."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    prep, batch = build_batch(cfg, rng)
    model, params = init_params(cfg, prep)

    B, S = batch["input_ids"].shape
    H = cfg.text.hidden_size
    x = jnp.asarray(rng.standard_normal((B, S, H)), jnp.float32)
    labels = np.full((B, S), -100, np.int32)
    labels[0, 5:S - 2] = rng.integers(0, cfg.text.vocab_size, S - 7)
    labels[1, 3:9] = rng.integers(0, cfg.text.vocab_size, 6)
    labels = jnp.asarray(labels)

    def full_ce(xx):
        logits = model.apply(
            {"params": params}, xx,
            method=lambda m, h: m.text.logits(m.text.final_norm(h)),
        ).astype(jnp.float32)
        sl = logits[:, :-1]
        yl = labels[:, 1:]
        m = yl != -100
        onehot = jax.nn.one_hot(jnp.where(m, yl, 0), logits.shape[-1])
        nll = -(onehot * jax.nn.log_softmax(sl, axis=-1)).sum(-1)
        return (nll * m).sum() / jnp.maximum(m.sum(), 1)

    def chunked(xx, chunk):
        return model.apply(
            {"params": params}, xx,
            method=lambda m, h: m.text.chunked_nll(
                m.text.final_norm(h), labels, chunk=chunk
            ),
        )

    want = float(full_ce(x))
    for chunk in (4, 7, 512):  # 7 does not divide S-1 -> tail padding
        got = float(chunked(x, chunk))
        np.testing.assert_allclose(got, want, rtol=2e-5)

    gw = jax.grad(lambda xx: full_ce(xx))(x)
    gc = jax.grad(lambda xx: chunked(xx, 4))(x)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gw), atol=2e-4)

"""GlimpsePrune+ (GRPO) recipe: LoRA, loss pieces, full RL step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner
from glimpseprune_tpu.training.grpo import (
    GRPOTrainer,
    SCORE_FUNCS,
    grpo_surrogate,
    k3_kl,
    token_logprobs,
    whiten_group_scores,
)
from glimpseprune_tpu.training.lora import (
    apply_lora,
    lora_param_count,
    make_lora_params,
)
from glimpseprune_tpu.training.data import TrainSample

from test_training import build_batch, init_params


def test_lora_make_apply():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    lora = make_lora_params(params, rank=4)
    # stacked layout: one [L, ., .] adapter pair per proj type
    assert len(lora) == 7  # q/k/v/o + gate/up/down
    k0 = "text/layers/self_attn/q_proj/kernel"
    L = cfg.text.num_hidden_layers
    assert lora[k0]["a"].shape[0] == L
    assert lora_param_count(lora) > 0
    # B init zero -> apply is identity
    merged = apply_lora(params, lora)
    np.testing.assert_array_equal(
        np.asarray(merged["text"]["layers"]["self_attn"]["q_proj"]["kernel"]),
        np.asarray(params["text"]["layers"]["self_attn"]["q_proj"]["kernel"]),
    )
    # nonzero B changes the kernel
    lora[k0]["b"] = lora[k0]["b"] + 0.1
    merged2 = apply_lora(params, lora)
    assert not np.allclose(
        np.asarray(merged2["text"]["layers"]["self_attn"]["q_proj"]["kernel"]),
        np.asarray(params["text"]["layers"]["self_attn"]["q_proj"]["kernel"]),
    )


def test_whiten_group_scores():
    # reference whitening is GLOBAL mean/std over all gathered scores
    # (train_qwen_gp.py:1375-1378), not per-G-group
    # std is the torch-default UNBIASED one (ddof=1) — differential-pinned
    # in test_training_differential.py::test_grpo_losses_match_reference_methods
    scores = jnp.array([1.0, 0.0, 1.0, 1.0])
    adv = np.asarray(whiten_group_scores(scores, 2))
    expect = (np.asarray(scores) - 0.75) / (np.asarray(scores).std(ddof=1) + 1e-4)
    np.testing.assert_allclose(adv, expect, rtol=1e-5)
    assert adv[1] < 0 < adv[0]  # loser below the global mean


def test_grpo_loss_pieces():
    rng = np.random.default_rng(0)
    logits = jnp.array(rng.normal(size=(2, 5, 11)).astype(np.float32))
    toks = jnp.array(rng.integers(0, 11, (2, 5)))
    lp = token_logprobs(logits, toks)
    assert lp.shape == (2, 5)
    assert float(lp.max()) <= 0.0

    mask = jnp.ones((2, 5))
    adv = jnp.array([1.0, -1.0])
    s = grpo_surrogate(lp, adv, mask)
    # ratio==1 at stop_grad point -> surrogate value = -mean(adv)
    np.testing.assert_allclose(float(s), 0.0, atol=1e-6)
    kl = k3_kl(lp, lp, mask)
    np.testing.assert_allclose(float(kl), 0.0, atol=1e-6)
    kl2 = k3_kl(lp, lp - 0.5, mask)
    assert float(kl2) > 0


def test_grpo_trainer_step():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    runner = GlimpsePruneRunner(cfg, params)

    samples = [
        TrainSample("what is this?", "a cat", "dummy0.jpg"),
        TrainSample("what color?", "blue", "dummy1.jpg"),
    ]

    def load_image(path):
        r = np.random.default_rng(hash(path) % 2**31)
        return r.integers(0, 255, (64, 96, 3), dtype=np.uint8)

    def tokenize(t):
        return [5 + ord(c) % 200 for c in t[:8]]

    def detok(ids):
        return " ".join(map(str, ids))

    trainer = GRPOTrainer(
        cfg, runner, None, tokenize, detok,
        num_generations=2, max_new_tokens=4, temperature=1.0,
        score_fn="dummy", lora_rank=2, learning_rate=1e-3,
    )
    lora_before = jax.tree_util.tree_map(np.asarray, trainer.lora)
    m = trainer.step_on_batch(samples, load_image, jax.random.PRNGKey(0))
    assert np.isfinite(m["grpo_total"])
    assert np.isfinite(m["kd_loss"]) and m["kd_loss"] >= -1e-6
    # LoRA actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), trainer.lora, lora_before
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_grpo_sampling_is_on_policy():
    """Completions are sampled through the CURRENT adapter (reference
    generates via the policy model, train_qwen_gp.py:1221-1243): the policy
    runner carries lora slots, refreshes them from self.lora at every step,
    and a large adapter visibly changes greedy decoding vs the frozen base."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    runner = GlimpsePruneRunner(cfg, params)
    samples = [TrainSample("q?", "a", "d0.jpg")]

    def load_image(path):
        r = np.random.default_rng(1)
        return r.integers(0, 255, (64, 96, 3), dtype=np.uint8)

    tr = GRPOTrainer(
        cfg, runner, None, lambda t: [5 + ord(c) % 200 for c in t[:8]],
        lambda ids: " ".join(map(str, ids)),
        num_generations=2, max_new_tokens=2, score_fn="dummy", lora_rank=2,
        learning_rate=1e-3,
    )
    q = tr.policy_runner.params["text"]["layers"]["self_attn"]["q_proj"]
    assert "lora_a" in q and "lora_b" in q
    tr.step_on_batch(samples, load_image, jax.random.PRNGKey(3))
    lora_after_1 = np.asarray(tr.lora["text/layers/self_attn/q_proj/kernel"]["b"])
    assert np.abs(lora_after_1).max() > 0  # step 1 moved the adapter
    tr.step_on_batch(samples, load_image, jax.random.PRNGKey(4))
    # step 2 sampled with step-1's adapter in the policy tree
    lb = np.asarray(
        tr.policy_runner.params["text"]["layers"]["self_attn"]["q_proj"]["lora_b"])
    np.testing.assert_array_equal(lb, lora_after_1)

    # a large adapter changes greedy completions vs the frozen base
    tr.lora = jax.tree_util.tree_map(lambda x: x + 0.5, tr.lora)
    tr.policy_runner.params = tr._insert_lora(tr.frozen, tr.lora)
    out_p = tr.policy_runner._prefill(
        {"params": tr.policy_runner.params},
        tr.policy_runner._device_inputs(prep, False),
        out_len=prep.out_len, use_ref_masks=False)
    out_f = runner._prefill(
        {"params": runner.params}, runner._device_inputs(prep, False),
        out_len=prep.out_len, use_ref_masks=False)
    sp, _ = tr.policy_runner._decode_loop(
        out_p.logits, out_p.valid, out_p.position_ids, out_p.kv_k, out_p.kv_v,
        4, -1)
    sf, _ = runner._decode_loop(
        out_f.logits, out_f.valid, out_f.position_ids, out_f.kv_k, out_f.kv_v,
        4, -1)
    assert not np.array_equal(np.asarray(sp), np.asarray(sf))


def test_score_funcs():
    assert SCORE_FUNCS.get("precision_match")(["q"], ["yes"], ["yes"]) == [1.0]
    # reference format rule (train_qwen_gp.py:767-778): exactly ONE integer
    # box; float boxes and multi-box completions score 0
    assert SCORE_FUNCS.get("one_box_format")(["q"], [""], ["[10,20,30,40]"]) == [1.0]
    assert SCORE_FUNCS.get("one_box_format")(["q"], [""], ["[0.1,0.2,0.3,0.4]"]) == [0.0]
    assert SCORE_FUNCS.get("one_box_format")(["q"], [""], ["[1,2,3,4] [5,6,7,8]"]) == [0.0]
    assert SCORE_FUNCS.get("one_box_format")(["q"], [""], ["no box"]) == [0.0]
    iou = SCORE_FUNCS.get("one_box_iou")(["q"], [[0, 0, 50, 50]], ["[0, 0, 50, 50]"])
    np.testing.assert_allclose(iou, [1.0], atol=1e-3)


def test_grpo_trainer_mask_mixing():
    """gen_mask_usage_ratio < 1 mixes generated masks with bbox refs."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    runner = GlimpsePruneRunner(cfg, params)

    samples = [
        TrainSample("q1", "a1", "d0.jpg", normed_bboxes=[[0.0, 0.0, 0.5, 0.5]]),
        TrainSample("q2", "a2", "d1.jpg", normed_bboxes=[[0.5, 0.5, 1.0, 1.0]]),
    ]

    def load_image(path):
        r = np.random.default_rng(hash(path) % 2**31)
        return r.integers(0, 255, (64, 96, 3), dtype=np.uint8)

    def tokenize(t):
        return [5 + ord(c) % 200 for c in t[:8]]

    trainer = GRPOTrainer(
        cfg, runner, None, tokenize, lambda ids: " ".join(map(str, ids)),
        num_generations=2, max_new_tokens=3, temperature=1.0,
        score_fn="dummy", lora_rank=2, gen_mask_usage_ratio=0.5,
    )
    m = trainer.step_on_batch(samples, load_image, jax.random.PRNGKey(1))
    assert np.isfinite(m["grpo_total"])


def test_insert_lora_matches_apply_lora():
    """In-scan adapters == merged-kernel adapters on real pipeline logits."""
    import dataclasses
    from glimpseprune_tpu.training.lora import apply_lora, insert_lora
    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP

    cfg = tiny_test_config()
    rng = np.random.default_rng(4)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    lora = make_lora_params(params, rank=3, seed=1)
    # nonzero adapters so the paths actually differ from the base
    lora = jax.tree_util.tree_map(lambda x: x + 0.01, lora)

    merged_runner = GlimpsePruneRunner(cfg, apply_lora(params, lora))
    out_merged = merged_runner.glimpse(prep)

    pcfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, lora_rank=3)
    )
    model = Qwen2_5_VL_GP(pcfg)
    inserted_runner = GlimpsePruneRunner(pcfg, insert_lora(params, lora), model=model)
    out_inserted = inserted_runner.glimpse(prep)

    np.testing.assert_allclose(
        np.asarray(out_inserted.logits), np.asarray(out_merged.logits),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(out_inserted.keep_img), np.asarray(out_merged.keep_img)
    )


def test_completion_logprobs_matches_full_logits():
    """gp_model.completion_logprobs (chunked head over completion positions
    only) must equal the full completion_logits -> token_logprobs path it
    replaced in _completion_logps."""
    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.training.grpo import token_logprobs

    cfg = tiny_test_config()
    rng = np.random.default_rng(5)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    model, params = init_params(cfg, prep)

    B, R, T = 2, 9, 5
    H = cfg.text.hidden_size
    prompt_embeds = jnp.asarray(rng.standard_normal((B, R, H)), jnp.float32)
    prompt_valid = jnp.asarray(rng.random((B, R)) > 0.2)
    prompt_pos = jnp.asarray(
        np.broadcast_to(np.arange(R)[None, None], (3, B, R)).copy(), jnp.int32)
    completion_ids = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, (B, T)), jnp.int32)
    completion_valid = jnp.ones((B, T), bool)
    completion_pos = jnp.asarray(
        np.broadcast_to(R + np.arange(T)[None, None], (3, B, T)).copy(), jnp.int32)

    args = (prompt_embeds, prompt_valid, prompt_pos,
            completion_ids, completion_valid, completion_pos)
    logits = model.apply({"params": params}, *args,
                         method=model.completion_logits)
    want = token_logprobs(logits[:, R - 1 : -1], completion_ids)
    got = model.apply({"params": params}, *args,
                      method=model.completion_logprobs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

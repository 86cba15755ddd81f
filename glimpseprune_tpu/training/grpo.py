"""GlimpsePrune+ (GRPO-style RL) losses and training orchestration.

Reference recipe (train_qwen_gp.py `_generate_and_score_completions`
:1122-1396 + loss assembly :1402-1446, :1531-1553):
  1. delayed-selection forward -> mask logits (loc + le supervision)
  2. prune with generated masks, sample G completions per prompt
  3. score completions (LLM judge / offline score funcs)
  4. group-whitened advantages (gathered across data-parallel workers)
  5. GRPO surrogate  -exp(logp - stop_grad(logp)) * A  on completion tokens
  6. k3-KL distillation to the adapter-disabled (reference) policy

Here steps 1/2 run through the shared runner (sampling decode), scoring is a
host-side registry call, and 4-6 are pure-jax functions assembled into one
jitted loss step over (new-modules + LoRA) trainables.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from glimpseprune_tpu.registry import Registry

SCORE_FUNCS: Registry = Registry("score_func")


# ---- train-time reward registry (reference train_qwen_gp.py:715-802) ----


@SCORE_FUNCS.register("precision_match")
def precision_match_score(queries, answers, completions, **kw) -> List[float]:
    return [1.0 if (a or "").strip() == (c or "").strip() else 0.0
            for a, c in zip(answers, completions)]


@SCORE_FUNCS.register("single_choice")
def single_choice_score(queries, answers, completions, **kw) -> List[float]:
    from glimpseprune_tpu.evalsuite.scorers import single_choice

    return single_choice(queries, answers, completions)


@SCORE_FUNCS.register("one_box_iou")
def one_box_iou_score(queries, answers, completions, **kw) -> List[float]:
    from glimpseprune_tpu.evalsuite.scorers import (
        extract_one_bbox_from_str,
        paired_box_iou,
    )

    from glimpseprune_tpu.evalsuite.scorers import _gt_box

    # gt parses like the reference's ast.literal_eval side
    # (train_qwen_gp.py:763); only the PREDICTION goes through the
    # int-pattern extractor. _gt_box zero-fills malformed/non-4 answers
    # instead of crashing the training step.
    pred = np.array([extract_one_bbox_from_str(c) for c in completions])
    gt = np.array([_gt_box(a) for a in answers], dtype=np.float64)
    return paired_box_iou(pred, gt).tolist()


@SCORE_FUNCS.register("one_box_format")
def one_box_format_score(queries, answers, completions, **kw) -> List[float]:
    """1.0 iff EXACTLY ONE [x1, y1, x2, y2] integer box appears — the
    reference's findall-count rule (train_qwen_gp.py:767-778), not a mere
    presence check (two boxes score 0)."""
    import re

    pat = re.compile(r"\[(\d+),\s*(\d+),\s*(\d+),\s*(\d+)\]")
    return [1.0 if len(pat.findall(c or "")) == 1 else 0.0 for c in completions]


@SCORE_FUNCS.register("llm")
def llm_score(queries, answers, completions, client=None, **kw) -> List[float]:
    assert client is not None, "llm score func needs client=LLMClient(...)"
    return client.score(queries, completions, answers)


@SCORE_FUNCS.register("precision_match_or_llm")
def precision_match_or_llm(queries, answers, completions, client=None, **kw):
    base = precision_match_score(queries, answers, completions)
    if client is None:
        return base
    todo = [i for i, s in enumerate(base) if s < 1.0]
    if todo:
        judged = client.score(
            [queries[i] for i in todo],
            [completions[i] for i in todo],
            [answers[i] for i in todo],
        )
        for i, s in zip(todo, judged):
            base[i] = s
    return base


@SCORE_FUNCS.register("dummy")
def dummy_score(queries, answers, completions, **kw) -> List[float]:
    return [float(len(c or "") % 3) / 2.0 for c in completions]


# ---- pure-jax loss pieces -------------------------------------------------


def whiten_group_scores(scores: jnp.ndarray, num_generations: int) -> jnp.ndarray:
    """Scores [B*G] -> whitened advantages.

    Matches the reference exactly (train_qwen_gp.py:1375-1378): subtract the
    *global* mean of all gathered scores and divide by the global UNBIASED
    std (torch .std() default, ddof=1 — jnp.std's ddof=0 inflates the
    advantages by sqrt(n/(n-1)); differential-pinned) + 1e-4.
    (Canonical GRPO would center per-G-group; the reference does not.)
    """
    del num_generations  # kept for signature stability; reference is global
    return (scores - scores.mean()) / (scores.std(ddof=1) + 1e-4)


def token_logprobs(logits: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """[B, T, V] logits + [B, T] token ids -> [B, T] log p(token)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]


def grpo_surrogate(
    policy_logps: jnp.ndarray,    # [B, T] per-token completion logprobs
    advantages: jnp.ndarray,      # [B]
    mask: jnp.ndarray,            # [B, T] completion-token mask
) -> jnp.ndarray:
    """-exp(logp - stop_grad(logp)) * A; per-sequence token mean, then batch
    mean, matching the reference weighting (train_qwen_gp.py:1424-1446) so
    long completions do not dominate short ones."""
    ratio = jnp.exp(policy_logps - jax.lax.stop_gradient(policy_logps))
    per_tok = -ratio * advantages[:, None] * mask
    per_seq = per_tok.sum(axis=-1) / jnp.maximum(mask.sum(axis=-1), 1)
    return per_seq.mean()


def k3_kl(
    policy_logps: jnp.ndarray,  # [B, T]
    ref_logps: jnp.ndarray,     # [B, T]
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """k3 KL estimator: exp(ref-pol) - (ref-pol) - 1 (reference :1402-1421);
    per-sequence token mean then batch mean, like grpo_surrogate."""
    diff = ref_logps - policy_logps
    per_tok = (jnp.exp(diff) - diff - 1.0) * mask
    per_seq = per_tok.sum(axis=-1) / jnp.maximum(mask.sum(axis=-1), 1)
    return per_seq.mean()


class GRPOBatch(NamedTuple):
    """Device arrays for one GRPO loss step (host assembles after sampling
    and scoring). Prompt side is the *pruned* geometry straight out of
    GlimpseOutputs (embeds/valid/positions, G-repeated); completions are the
    sampled token ids with an eos-aware mask."""

    prompt_embeds: jnp.ndarray     # [B*G, R, H] reduced layer-0 embeddings
    prompt_valid: jnp.ndarray      # [B*G, R]
    prompt_pos: jnp.ndarray        # [3, B*G, R]
    completion_ids: jnp.ndarray    # [B*G, Tc]
    completion_valid: jnp.ndarray  # [B*G, Tc]
    completion_pos: jnp.ndarray    # [3, B*G, Tc]
    advantages: jnp.ndarray        # [B*G]
    ref_logps: jnp.ndarray         # [B*G, Tc] adapter-disabled logprobs


def _completion_logps(model, params, batch: GRPOBatch) -> jnp.ndarray:
    # chunked head: never materializes [B*G, T, V] logits and projects only
    # the T completion-predicting positions (gp_model.completion_logprobs)
    return model.apply(
        {"params": params},
        batch.prompt_embeds, batch.prompt_valid, batch.prompt_pos,
        batch.completion_ids, batch.completion_valid, batch.completion_pos,
        method=model.completion_logprobs,
    )


def make_grpo_loss_step(model, optimizer, reward_weight: float = 1.0,
                        kd_weight: float = 0.04):
    """grpo_step(lora, opt_state, frozen, batch) -> (lora, opt_state, metrics).

    Policy = frozen params + LoRA (reference policy = LoRA disabled); both
    teacher-force over the pruned prompt via completion_logits."""
    import optax

    from glimpseprune_tpu.training.lora import insert_lora

    def loss_fn(lora, frozen, batch: GRPOBatch):
        # per-layer adapter application inside the decoder scan — merging
        # (apply_lora) materializes a second full kernel stack and OOMs the
        # 3B GRPO step on one 16GB chip
        params = insert_lora(frozen, lora)
        logps = _completion_logps(model, params, batch)
        cmask = batch.completion_valid.astype(jnp.float32)
        reward_loss = grpo_surrogate(logps, batch.advantages, cmask)
        kd_loss = k3_kl(logps, batch.ref_logps, cmask)
        total = reward_weight * reward_loss + kd_weight * kd_loss
        return total, {
            "reward_loss": reward_loss,
            "kd_loss": kd_loss,
            "grpo_total": total,
            "mean_advantage": batch.advantages.mean(),
        }

    def step(lora, opt_state, frozen, batch: GRPOBatch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            lora, frozen, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, metrics

    return step


def compute_ref_logps(model, frozen, batch: GRPOBatch) -> jnp.ndarray:
    """Adapter-disabled reference logprobs (no LoRA applied)."""
    return _completion_logps(model, frozen, batch)


class GRPOTrainer:
    """GlimpsePrune+ orchestration: prune -> sample G -> score -> step.

    Sampling (masks AND completions) is ON-POLICY through the current
    LoRA adapter, matching the reference's policy-model generate
    (train_qwen_gp.py:1221-1243); the kd reference logprobs are the only
    adapter-disabled forward (:1167-1181). `frozen` may be reassigned
    between steps (e.g. when the base loc/le recipe keeps training the new
    modules concurrently, as the reference's plus stage does in its joint
    loss :1531-1553) — the policy tree is rebuilt from it every step.
    """

    def __init__(self, cfg, runner, dataset, tokenize, detokenize,
                 num_generations: int = 4, max_new_tokens: int = 32,
                 temperature: float = 1.0, score_fn: str = "dummy",
                 score_client=None, reward_weight: float = 1.0,
                 kd_weight: float = 0.04, lora_rank: int = 8,
                 learning_rate: float = 1e-5, seed: int = 0,
                 gen_mask_usage_ratio: float = 1.0):
        # gen_mask_usage_ratio: fraction of samples pruned with the model's
        # own generated masks vs ground-truth bbox masks (reference
        # `_update_ref_token_masks`, train_qwen_gp.py:1091-1119)
        self.gen_mask_usage_ratio = gen_mask_usage_ratio
        import optax

        from glimpseprune_tpu.training.lora import make_lora_params

        self.cfg = cfg
        self.runner = runner
        self.model = runner.model
        self.dataset = dataset
        self.tokenize = tokenize
        self.detokenize = detokenize
        self.G = num_generations
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.score_fn = SCORE_FUNCS.get(score_fn)
        self.score_client = score_client
        self.frozen = runner.params
        self.lora = make_lora_params(self.frozen, rank=lora_rank, seed=seed)
        self.optimizer = optax.adamw(learning_rate)
        self.opt_state = self.optimizer.init(self.lora)
        # policy model declares in-scan LoRA slots (+ remat for the backward)
        import dataclasses

        pcfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, lora_rank=lora_rank, remat=True)
        )
        self.policy_model = self.model.clone(cfg=pcfg)
        self.step_fn = jax.jit(
            make_grpo_loss_step(self.policy_model, self.optimizer,
                                reward_weight, kd_weight)
        )
        # ON-POLICY sampling runner: the reference generates completions (and
        # masks) through the policy model with the adapter ENABLED
        # (train_qwen_gp.py:1140-1148 mask forward, :1221-1243 generate);
        # only the kd reference logprobs disable it (:1167-1181). A second
        # runner over insert_lora(frozen, lora) gives the same semantics —
        # its jitted phases take params as arguments, so refreshing
        # `.params` each step recompiles nothing (no remat: sampling has no
        # backward).
        from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner
        from glimpseprune_tpu.training.lora import insert_lora

        self._insert_lora = insert_lora
        scfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, lora_rank=lora_rank)
        )
        self.policy_runner = GlimpsePruneRunner(
            scfg, insert_lora(self.frozen, self.lora), dtype=runner.dtype,
            model=self.model.clone(cfg=scfg),
        )
        self.seed = seed
        # One host RNG for the whole run so the gen-vs-ref mask mixing draws
        # fresh per step (reference samples fresh each step,
        # train_qwen_gp.py:1091-1119)
        self._host_rng = np.random.default_rng(seed)

    def step_on_batch(self, samples, load_image, rng_key) -> Dict[str, float]:
        from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs

        cfg = self.cfg
        G = self.G
        prompts, images, queries, answers = [], [], [], []
        for s in samples:
            p = ([cfg.vision_start_token_id, cfg.image_token_id,
                  cfg.vision_end_token_id] + self.tokenize(s.query))
            for _ in range(G):  # G-repeat (RepeatRandomSampler semantics)
                prompts.append(p)
                images.append(load_image(s.img_path))
                queries.append(s.query)
                answers.append(s.answer)
        bboxes = None
        if self.gen_mask_usage_ratio < 1.0:
            bboxes = []
            for s in samples:
                for _ in range(G):
                    bboxes.append(getattr(s, "normed_bboxes", None))
            if not any(bboxes):
                bboxes = None
        prep = prepare_inputs(cfg, prompts, images, normed_bboxes=bboxes,
                              seq_multiple=8, patch_multiple=16)

        # refresh the on-policy runner with the current adapter (pure tree
        # re-arrangement: base leaves are shared, only the small lora
        # leaves are new)
        self.policy_runner.params = self._insert_lora(self.frozen, self.lora)

        use_ref = False
        if bboxes is not None and prep.ref_token_masks is not None:
            # mix generated masks into the ref masks per the usage ratio:
            # predict masks first, then overwrite the ref rows selected for
            # generated-mask usage, and prune with use_ref_masks=True
            ml, _ = self.policy_runner.glimpse_delayed(prep, use_ref_masks=False)
            gen_keep = np.asarray(
                jax.nn.sigmoid(ml[-1]) > cfg.gp.reduce_threshold
            )
            use_gen = self._host_rng.random(len(prompts)) < self.gen_mask_usage_ratio
            mixed = prep.ref_token_masks.copy()
            mixed[use_gen] = gen_keep[use_gen]
            prep.ref_token_masks = mixed
            use_ref = True

        out = self.policy_runner._prefill(
            {"params": self.policy_runner.params},
            self.policy_runner._device_inputs(prep, use_ref),
            out_len=prep.out_len, use_ref_masks=use_ref,
        )
        seqs, n_gen = self.policy_runner._decode_loop(
            out.logits, out.valid, out.position_ids, out.kv_k, out.kv_v,
            self.max_new_tokens, cfg.eos_token_id,
            temperature=self.temperature, rng=rng_key,
        )
        completions = [
            self.detokenize([int(x) for x in seqs[i, : n_gen[i]]])
            for i in range(len(prompts))
        ]
        scores = np.asarray(
            self.score_fn(queries, answers, completions, client=self.score_client),
            dtype=np.float32,
        )
        advantages = whiten_group_scores(jnp.asarray(scores), G)

        Tc = seqs.shape[1]
        comp_ids = jnp.asarray(seqs, dtype=jnp.int32)
        comp_valid = jnp.arange(Tc)[None, :] < jnp.asarray(n_gen)[:, None]
        last = out.position_ids[:, :, -1]  # [3, B*G]
        comp_pos = last[:, :, None] + 1 + jnp.arange(Tc)[None, None, :]

        batch = GRPOBatch(
            prompt_embeds=out.embeds,
            prompt_valid=out.valid,
            prompt_pos=out.position_ids,
            completion_ids=comp_ids,
            completion_valid=comp_valid,
            completion_pos=comp_pos,
            advantages=advantages,
            ref_logps=jnp.zeros_like(comp_ids, dtype=jnp.float32),
        )
        ref_logps = compute_ref_logps(self.model, self.frozen, batch)
        batch = batch._replace(ref_logps=ref_logps)

        self.lora, self.opt_state, metrics = self.step_fn(
            self.lora, self.opt_state, self.frozen, batch
        )
        m = {k: float(v) for k, v in metrics.items()}
        m["mean_score"] = float(scores.mean())
        return m

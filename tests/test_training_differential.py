"""Differential validation of the TRAINING loss against the reference's
executable implementation (extends test_reference_differential from the
inference surface to the base-recipe loss surface).

The reference base recipe's total loss (train_qwen_gp.py GPTrainer.compute_loss
with reward_weight=0, :1531-1553) is

    loc_weight * sum_layers MaskLoss(logits_layer, ref_masks)   (:1467-1481)
  + le_weight * le_loss                                          (model CE)

with MaskLoss = 1.0*Dice(eps=1e-6, per-sample) + 0.1*BCE(per-sample mean)
(train_configs/*/qwen2_5_3b_gp.yaml:3-8). Both sides run their OWN forward
on shared random weights and their OWN loss implementation; the asserted
parity therefore covers logits, loss math, and composition end-to-end.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from glimpseprune_tpu.training.losses import bce_loss, dice_loss, mask_loss

from reference_shim import load_reference_train
from test_reference_differential import (  # noqa: F401  (fixture re-export)
    make_case,
    ref_forward,
    stacks,
)

ATOL = 5e-5


def _random_targets(prep, rng):
    """Shared random gt token masks: ours [B, N] over img_valid slots, the
    reference as List(B) of that row's true-token bools (same slot order —
    established by the mask-logit parity tests)."""
    iv = np.asarray(prep.img_valid).astype(bool)
    B, N = iv.shape
    ours = np.zeros((B, N), dtype=bool)
    ref_list = []
    for b in range(B):
        n_b = int(iv[b].sum())
        bits = rng.random(n_b) < 0.3
        if not bits.any():
            bits[0] = True
        ours[b, iv[b]] = bits
        ref_list.append(torch.tensor(bits))
    return jnp.asarray(ours), ref_list


def _our_training_forward(runner, prep, labels):
    """Our delayed-selection training forward: (mask_logits, le_loss)."""
    inputs = runner._device_inputs(prep, use_ref_masks=False)
    merged, taps = runner.model.apply(
        {"params": runner.params}, inputs["patches"], inputs["vis_pos_ids"],
        inputs["full_seg"], inputs["vis_valid"],
        method=runner.model.vision_encode,
    )
    taps = jnp.stack(taps, axis=0)

    def run(m):
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
            labels=labels,
            # training=False: the reference model is .eval() (dropout off);
            # the loss math under test is identical either way
            training=False,
        )

    mask_logits, _state, le_loss = runner.model.apply(
        {"params": runner.params}, method=run,
    )
    return mask_logits, le_loss


def test_loc_and_le_loss_parity(stacks):
    cfg, ref_model, runner = stacks
    rng = np.random.default_rng(11)
    # answers: labels mode INSERTS the le tokens at the answer start on
    # both sides (reference _append_le labels branch; our le_start slots)
    answers = [[31, 32, 33], [41, 42, 43]]
    prep, ref_inputs = make_case(cfg, rng, [(64, 96), (56, 56)],
                                 answers=answers)
    labels_ours = jnp.asarray(prep.labels)
    labels_ref = ref_inputs.pop("labels")
    target_ours, target_ref = _random_targets(prep, rng)

    # reference: training forward (delay_selection, train_qwen_gp.py:1140-1149)
    out = ref_forward(ref_model, ref_inputs, do_selection=True,
                      delay_selection=True, labels=labels_ref)
    ref_train = load_reference_train()
    criterion = ref_train.LOSS_REGISTRY["MaskLoss"](dice_weight=1.0,
                                                    bce_weight=0.1)
    pred_layers = out.image_token_mask_logits[0].shape[0]
    ref_per_layer = []
    with torch.no_grad():
        for layer_id in range(pred_layers):
            per = [one[layer_id] for one in out.image_token_mask_logits]
            ref_per_layer.append(float(criterion(per, target_ref)))
    ref_le = float(out.le_loss)

    # ours: same forward semantics, our loss implementation
    mask_logits, le_loss = _our_training_forward(runner, prep, labels_ours)
    iv = jnp.asarray(prep.img_valid)
    assert mask_logits.shape[0] == pred_layers
    our_per_layer = [
        float(mask_loss(mask_logits[i], target_ours, iv,
                        dice_weight=1.0, bce_weight=0.1))
        for i in range(pred_layers)
    ]

    np.testing.assert_allclose(our_per_layer, ref_per_layer, atol=ATOL,
                               err_msg="per-layer loc loss differs")
    np.testing.assert_allclose(float(le_loss), ref_le, atol=ATOL,
                               err_msg="le CE loss differs")

    # composition: the reference SUMS layers then applies loc_weight
    ref_total = 1.0 * sum(ref_per_layer) + 1.0 * ref_le
    our_total = 1.0 * sum(our_per_layer) + 1.0 * float(le_loss)
    np.testing.assert_allclose(our_total, ref_total, atol=ATOL * pred_layers)


def test_loss_primitives_match_reference_classes(stacks):
    """Dice / BCE primitives vs the reference classes on shared random
    logits (no model in the loop — isolates the loss math: per-sample dice
    with eps=1e-6, per-sample-mean BCE, 1.0/0.1 MaskLoss weights)."""
    ref_train = load_reference_train()
    rng = np.random.default_rng(12)
    B, N = 3, 40
    lens = [40, 28, 33]
    logits = rng.normal(size=(B, N)).astype(np.float32) * 3
    targets = rng.random((B, N)) < 0.4
    valid = np.zeros((B, N), dtype=bool)
    for b, n in enumerate(lens):
        valid[b, :n] = True

    logits_list = [torch.tensor(logits[b, :lens[b]]) for b in range(B)]
    target_list = [torch.tensor(targets[b, :lens[b]]) for b in range(B)]

    with torch.no_grad():
        ref_dice = float(ref_train.LOSS_REGISTRY["DiceLoss"]()(logits_list, target_list))
        ref_bce = float(ref_train.LOSS_REGISTRY["BCELoss"]()(logits_list, target_list))
        ref_mask = float(ref_train.LOSS_REGISTRY["MaskLoss"](
            dice_weight=1.0, bce_weight=0.1)(logits_list, target_list))

    jl = jnp.asarray(np.where(valid, logits, 123.0))  # pad values must not leak
    jt = jnp.asarray(targets & valid)
    jv = jnp.asarray(valid)
    np.testing.assert_allclose(float(dice_loss(jl, jt, jv)), ref_dice, atol=1e-6)
    np.testing.assert_allclose(float(bce_loss(jl, jt, jv)), ref_bce, atol=1e-6)
    np.testing.assert_allclose(float(mask_loss(jl, jt, jv)), ref_mask, atol=1e-6)


def test_grpo_losses_match_reference_methods():
    """GRPO loss surface vs the reference's executable methods: k3 KL
    (:1402-1421), the -exp(logp - detach)*A surrogate (:1424-1446), and
    global-whitened advantages (:1377). The trainer methods are invoked on
    a __new__-constructed instance with just the attributes they read —
    no accelerator/model needed for the math."""
    import collections
    import types as _types

    import jax.numpy as jnp

    from glimpseprune_tpu.training.grpo import (
        grpo_surrogate,
        k3_kl,
        whiten_group_scores,
    )

    ref_train = load_reference_train()
    rng = np.random.default_rng(13)
    B, T = 4, 12
    lens = [12, 7, 9, 3]
    logps = rng.normal(size=(B, T)).astype(np.float32) - 2.0
    ref_logps = logps + rng.normal(size=(B, T)).astype(np.float32) * 0.1
    adv_scores = rng.normal(size=(B,)).astype(np.float32)
    mask = np.zeros((B, T), dtype=bool)
    for b, n in enumerate(lens):
        mask[b, :n] = True

    trainer = ref_train.GPTrainer.__new__(ref_train.GPTrainer)
    trainer.args = _types.SimpleNamespace(kd_weight=0.7)
    trainer.reward_weight = 1.3
    trainer.num_iterations = 1
    trainer._metrics = collections.defaultdict(list)
    trainer.accelerator = _types.SimpleNamespace(
        gather_for_metrics=lambda x: torch.as_tensor(x).reshape(1))

    completion_logps = [torch.tensor(logps[b, :lens[b]]) for b in range(B)]
    ref_completion_logps = [torch.tensor(ref_logps[b, :lens[b]]) for b in range(B)]
    advantages = torch.tensor(
        np.asarray(whiten_group_scores(jnp.asarray(adv_scores), 2)))

    ref_kd = float(trainer._calculate_kd_loss({
        "ref_completion_logps": ref_completion_logps,
        "completion_logps": completion_logps,
    }))
    ref_reward = float(trainer._calculate_reward_loss({
        "completion_logps": completion_logps,
        "advantages": advantages,
    }))

    jl, jr, jm = jnp.asarray(logps), jnp.asarray(ref_logps), jnp.asarray(mask)
    our_kd = 0.7 * float(k3_kl(jl, jr, jm))
    our_reward = 1.3 * float(grpo_surrogate(jl, jnp.asarray(advantages.numpy()), jm))
    np.testing.assert_allclose(our_kd, ref_kd, atol=1e-6)
    np.testing.assert_allclose(our_reward, ref_reward, atol=1e-6)

    # advantages: global mean/std whitening, std + 1e-4 (reference :1377)
    scores_t = torch.tensor(adv_scores)
    ref_adv = (scores_t - scores_t.mean()) / (scores_t.std() + 1e-4)
    np.testing.assert_allclose(np.asarray(advantages), ref_adv.numpy(),
                               atol=1e-6)

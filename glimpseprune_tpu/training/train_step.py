"""Base GP training step: loc (dice+bce with deep supervision) + le CE.

Reproduces the reference base recipe (GPTrainer.compute_loss with
reward_weight=0, train_qwen_gp.py:1531-1553 + _calculate_loc_loss :1467-1481):
one delayed-selection forward yields per-fuser-layer mask logits and the LM
loss on the answer; only the GP new-modules (fuser, glimpse embeddings,
le_proj/le_norm) receive gradients — the base model stays frozen, exactly the
reference's freeze-all/unfreeze-new-modules scheme (train_qwen_gp.py:1942-1951).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from glimpseprune_tpu.config import ModelConfig
from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
from glimpseprune_tpu.training.losses import mask_confusion_stats, mask_loss

NEW_MODULE_KEYS = ("attn_fuser", "learnable_embeddings", "le_proj", "le_norm")


def new_module_filter(path: Tuple[str, ...]) -> bool:
    return any(str(k) in NEW_MODULE_KEYS for k in path)


def split_params(params: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """-> (trainable new-modules subtree, frozen rest). Top-level split:
    new modules live at the root of the param tree."""
    trainable = {k: v for k, v in params.items() if k in NEW_MODULE_KEYS}
    frozen = {k: v for k, v in params.items() if k not in NEW_MODULE_KEYS}
    return trainable, frozen


class TrainState(NamedTuple):
    trainable: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def make_train_step(
    cfg: ModelConfig,
    model: Qwen2_5_VL_GP,
    optimizer: optax.GradientTransformation,
    loc_weight: float = 1.0,
    le_weight: float = 1.0,
    dice_weight: float = 1.0,
    bce_weight: float = 0.1,
) -> Callable:
    """Returns train_step(state, frozen_params, batch, rng) -> (state, metrics).

    batch: dict with the glimpse_encode input arrays plus
      ref_token_masks [B, N] (bbox supervision targets) and labels [B, S].
    """

    def loss_fn(trainable, frozen, batch, rng):
        params = {**frozen, **trainable}
        merged, taps = model.apply(
            {"params": params},
            batch["patches"], batch["vis_pos_ids"], batch["full_seg"], batch["vis_valid"],
            method=model.vision_encode,
        )
        taps = jnp.stack(taps, axis=0)

        def run(m):
            return m.glimpse_encode(
                input_ids=batch["input_ids"],
                valid=batch["valid"],
                position_ids=batch["position_ids"],
                image_embeds=merged,
                taps=taps,
                packed_idx=batch["packed_idx"],
                img_slots=batch["img_slots"],
                img_valid=batch["img_valid"],
                fuser_window_index=batch["fuser_window_index"],
                fuser_reverse_index=batch["fuser_reverse_index"],
                fuser_segment_ids=batch["fuser_segment_ids"],
                fuser_pos_ids=batch["fuser_pos_ids"],
                le_start=batch.get("le_start"),
                labels=batch.get("labels"),
                training=True,
            )

        mask_logits, state, le_loss = model.apply(
            {"params": params}, method=run, rngs={"dropout": rng}
        )

        target = batch["ref_token_masks"]
        img_valid = batch["img_valid"]
        # deep supervision: the reference SUMS the per-layer mask losses
        # (train_qwen_gp.py:1474-1478 `loc_loss += loc_loss_per_layer`) —
        # no layer-count average
        n_out = mask_logits.shape[0]
        loc = 0.0
        for i in range(n_out):
            loc = loc + mask_loss(
                mask_logits[i], target, img_valid,
                dice_weight=dice_weight, bce_weight=bce_weight,
            )

        if le_loss is None:
            le_loss = jnp.float32(0.0)
        total = loc_weight * loc + le_weight * le_loss

        keep_pred = jax.nn.sigmoid(mask_logits[-1]) > cfg.gp.reduce_threshold
        stats = mask_confusion_stats(keep_pred, target, img_valid)
        metrics = {
            "loss": total,
            "loc_loss": loc,
            "le_loss": le_loss,
            "mask_iou": stats["iou"].mean(),
            "mask_precision": (
                stats["tp"] / jnp.maximum(stats["tp"] + stats["fp"], 1)
            ).mean(),
            "mask_recall": (
                stats["tp"] / jnp.maximum(stats["tp"] + stats["fn"], 1)
            ).mean(),
        }
        return total, metrics

    def train_step(state: TrainState, frozen, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, frozen, batch, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return TrainState(trainable, opt_state, state.step + 1), metrics

    return train_step


def init_train_state(params: Dict[str, Any], optimizer) -> Tuple[TrainState, Dict[str, Any]]:
    trainable, frozen = split_params(params)
    opt_state = optimizer.init(trainable)
    return TrainState(trainable, opt_state, jnp.int32(0)), frozen

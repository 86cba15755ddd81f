"""GPTrainer: the base training loop (loc + le recipe).

Reference GPTrainer (train_qwen_gp.py:1008-1623) base path: freeze the LVLM,
train the GP new-modules with MaskLoss deep supervision + answer CE; log
confusion-matrix mask metrics; checkpoint only the new modules. This trainer
drives the jitted train step (train_step.py) over the YAML dataset pipeline
(data.py), with bucketed shapes so recompiles stay bounded.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from glimpseprune_tpu.config import ModelConfig
from glimpseprune_tpu.registry import Registry
from glimpseprune_tpu.training.data import GPDataset, TrainSample
from glimpseprune_tpu.training.train_step import (
    TrainState,
    init_train_state,
    make_train_step,
    split_params,
)

SCHEDULERS: Registry = Registry("scheduler")


@SCHEDULERS.register("constant")
def constant_schedule(lr: float, total_steps: int, warmup_steps: int = 0):
    if warmup_steps:
        return optax.warmup_constant_schedule(0.0, lr, warmup_steps)
    return lr


@SCHEDULERS.register("linear")
def linear_schedule(lr: float, total_steps: int, warmup_steps: int = 0):
    return optax.warmup_cosine_decay_schedule(  # linear warmup
        0.0, lr, warmup_steps, total_steps, end_value=0.0, exponent=1.0
    )


@SCHEDULERS.register("cosine")
def cosine_schedule(lr: float, total_steps: int, warmup_steps: int = 0):
    return optax.warmup_cosine_decay_schedule(0.0, lr, warmup_steps, total_steps)


@SCHEDULERS.register("exponential")
def exponential_schedule(lr: float, total_steps: int, warmup_steps: int = 0):
    return optax.exponential_decay(lr, max(total_steps, 1), 0.1)


@dataclass
class TrainerConfig:
    learning_rate: float = 1e-4
    lr_scheduler: str = "cosine"
    warmup_ratio: float = 0.03
    weight_decay: float = 0.0
    num_epochs: int = 1
    batch_size: int = 2
    loc_weight: float = 1.0
    le_weight: float = 1.0
    dice_weight: float = 1.0
    bce_weight: float = 0.1
    max_grad_norm: Optional[float] = 1.0
    log_every: int = 10
    save_every: int = 500
    output_dir: str = "checkpoints/gp"
    seed: int = 0
    seq_multiple: int = 64
    patch_multiple: int = 256
    max_pixels: Optional[int] = None


def default_collate(cfg: ModelConfig, samples: Sequence[TrainSample],
                    tokenize: Callable, load_image: Callable,
                    tcfg: TrainerConfig):
    """Samples -> device batch dict via the shared input preparation.

    Raw-token variant (no chat template); use chat_collate for the
    reference GPCollator's template-formatted recipe."""
    from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_inputs

    prompts, answers, images, bboxes = [], [], [], []
    for s in samples:
        prompts.append(
            [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
            + tokenize(s.query)
        )
        answers.append(tokenize(s.answer) + [cfg.eos_token_id])
        images.append(load_image(s.img_path))
        bboxes.append(s.normed_bboxes)
    prep = prepare_inputs(
        cfg, prompts, images, normed_bboxes=bboxes, answer_ids=answers,
        seq_multiple=tcfg.seq_multiple, patch_multiple=tcfg.patch_multiple,
        max_pixels=tcfg.max_pixels,
    )
    return batch_from_prep(prep)


def chat_collate(cfg: ModelConfig, samples: Sequence[TrainSample],
                 tokenize: Callable, load_image: Callable,
                 tcfg: TrainerConfig, is_sft: bool = True,
                 special_ids=None, im_start_id: int = 151644):
    """GPCollator parity (reference train_qwen_gp.py:600-662): one user turn
    with [image, query] parts (+ the assistant answer turn when SFT), rendered
    through the Qwen chat template, labels covering exactly the tokens after
    the last "<|im_start|>assistant\\n"."""
    from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_chat_inputs

    messages, images, bboxes = [], [], []
    for s in samples:
        turns = [{
            "role": "user",
            "content": [{"type": "image"}, {"type": "text", "text": s.query}],
        }]
        if is_sft:
            turns.append({
                "role": "assistant",
                "content": [{"type": "text", "text": s.answer}],
            })
        messages.append(turns)
        images.append(load_image(s.img_path))
        bboxes.append(s.normed_bboxes)
    prep = prepare_chat_inputs(
        cfg, messages, images, tokenize,
        special_ids=special_ids, is_sft=is_sft, im_start_id=im_start_id,
        normed_bboxes=bboxes,
        seq_multiple=tcfg.seq_multiple, patch_multiple=tcfg.patch_multiple,
        max_pixels=tcfg.max_pixels,
    )
    return batch_from_prep(prep)


def batch_from_prep(prep):
    """PreparedInputs -> the device batch dict the train step consumes."""
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
        "labels": jnp.asarray(prep.labels),
    }
    return batch


class GPTrainer:
    def __init__(
        self,
        cfg: ModelConfig,
        model,
        params: Dict[str, Any],
        dataset: GPDataset,
        tokenize: Callable,
        load_image: Optional[Callable] = None,
        tcfg: Optional[TrainerConfig] = None,
        collate: Optional[Callable] = None,
        resume_from: Optional[str] = None,
    ):
        # training always remats decoder layers: the 3B glimpse train step
        # needs >16GB HBM without it; remat only changes the VJP so the
        # forward/eval cost is unchanged
        if not cfg.text.remat:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, text=dataclasses.replace(cfg.text, remat=True)
            )
            model = model.clone(cfg=cfg)  # keeps family-specific fields
        self.cfg = cfg
        self.model = model
        self.dataset = dataset
        self.tokenize = tokenize
        self.tcfg = tcfg or TrainerConfig()
        if load_image is None:
            def load_image(path):
                from PIL import Image

                return np.asarray(Image.open(path).convert("RGB"))
        self.load_image = load_image
        self.collate = collate or default_collate

        steps_per_epoch = max(len(dataset) // self.tcfg.batch_size, 1)
        total = steps_per_epoch * self.tcfg.num_epochs
        sched = SCHEDULERS.get(self.tcfg.lr_scheduler)(
            self.tcfg.learning_rate, total, int(self.tcfg.warmup_ratio * total)
        )
        chain = []
        if self.tcfg.max_grad_norm:
            chain.append(optax.clip_by_global_norm(self.tcfg.max_grad_norm))
        chain.append(optax.adamw(sched, weight_decay=self.tcfg.weight_decay))
        self.optimizer = optax.chain(*chain)
        self.step_fn = jax.jit(
            make_train_step(
                cfg, model, self.optimizer,
                loc_weight=self.tcfg.loc_weight,
                le_weight=self.tcfg.le_weight,
                dice_weight=self.tcfg.dice_weight,
                bce_weight=self.tcfg.bce_weight,
            )
        )
        self.state, self.frozen = init_train_state(params, self.optimizer)
        self.history: List[Dict[str, float]] = []
        self._steps_per_epoch = steps_per_epoch
        self._start_step = 0
        if resume_from:
            self.load(resume_from)

    @property
    def params(self) -> Dict[str, Any]:
        return {**self.frozen, **self.state.trainable}

    def save(self, directory: Optional[str] = None):
        from flax import serialization

        from glimpseprune_tpu.persistence import save_new_modules

        directory = directory or self.tcfg.output_dir
        save_new_modules(self.params, self.cfg, directory)
        with open(os.path.join(directory, "train_log.json"), "w") as f:
            json.dump(self.history, f)
        # resume state: optimizer moments + step counter next to the
        # new-modules artifact (reference --resume_from_checkpoint reloads
        # new modules and continues the step count, train_qwen_gp.py:1601-1608;
        # we additionally keep the opt state so adamw moments survive)
        payload = {
            "opt_state": self.state.opt_state,
            "step": np.asarray(self.state.step),
        }
        with open(os.path.join(directory, "trainer_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(payload))
        return directory

    def load(self, directory: str):
        """Resume from a checkpoint directory written by save()."""
        from flax import serialization

        from glimpseprune_tpu.persistence import load_new_modules

        merged, _ = load_new_modules(self.params, directory)
        trainable, _ = split_params(merged)
        opt_state, step = self.state.opt_state, self.state.step
        state_path = os.path.join(directory, "trainer_state.msgpack")
        if os.path.exists(state_path):
            with open(state_path, "rb") as f:
                payload = serialization.from_bytes(
                    {"opt_state": self.state.opt_state,
                     "step": np.asarray(self.state.step)},
                    f.read(),
                )
            opt_state = payload["opt_state"]
            step = jnp.asarray(payload["step"])
        self.state = TrainState(trainable=trainable, opt_state=opt_state, step=step)
        log_path = os.path.join(directory, "train_log.json")
        if os.path.exists(log_path):
            with open(log_path) as f:
                self.history = json.load(f)
        self._start_step = int(step)
        return self

    def train(self, max_steps: Optional[int] = None) -> List[Dict[str, float]]:
        base_rng = jax.random.PRNGKey(self.tcfg.seed)
        step = self._start_step
        start_epoch = step // self._steps_per_epoch
        skip = step - start_epoch * self._steps_per_epoch
        t0 = time.perf_counter()
        for epoch in range(start_epoch, self.tcfg.num_epochs):
            for bi, samples in enumerate(self.dataset.batches(
                self.tcfg.batch_size, shuffle=True, seed=self.tcfg.seed + epoch
            )):
                if epoch == start_epoch and bi < skip:
                    continue  # resume mid-epoch without re-running batches
                batch = self.collate(self.cfg, samples, self.tokenize,
                                     self.load_image, self.tcfg)
                # per-step fold_in (not a split chain) so a killed+resumed run
                # sees the same dropout rng stream as an uninterrupted one
                sub = jax.random.fold_in(base_rng, step)
                self.state, metrics = self.step_fn(self.state, self.frozen, batch, sub)
                step += 1
                if step % self.tcfg.log_every == 0 or step == 1:
                    m = {k: float(v) for k, v in metrics.items()}
                    m.update(step=step, epoch=epoch,
                             elapsed_s=time.perf_counter() - t0)
                    self.history.append(m)
                if self.tcfg.save_every and step % self.tcfg.save_every == 0:
                    self.save()
                if max_steps and step >= max_steps:
                    self.save()
                    return self.history
        self.save()
        return self.history

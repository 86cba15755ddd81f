"""YAML dataset pipeline + GPTrainer end-to-end (tiny synthetic corpus)."""

import json
import os

import numpy as np
import pytest

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.training.data import (
    GPDataset,
    RepeatRandomSampler,
    TRAIN_MAPPERS,
    _apply_sampling,
)
from glimpseprune_tpu.training.trainer import GPTrainer, TrainerConfig

from test_training import init_params, build_batch


def make_corpus(tmp_path, n=8):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir / "cot" / "toy", exist_ok=True)
    from PIL import Image

    rows = []
    for i in range(n):
        name = f"img{i}.jpg"
        arr = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / "cot" / "toy" / name)
        rows.append(
            {
                "question": f"What is in region {i}?",
                "answer": f"object {i}",
                "image": name,
                "width": 96,
                "height": 64,
                "bboxs": [[10.0, 10.0, 50.0, 40.0]],
                "dataset": "toy",
                "split": "train",
            }
        )
    jsonl = tmp_path / "toy_train.jsonl"
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    config = {
        "datasets": [
            {
                "json_path": str(jsonl),
                "sampling_strategy": "first:6",
                "mapper": "cot_train",
                "bbox_type": "xyxy",
                "additional_mappers": ["norm_bboxes"],
                "score_funcs": ["llm"],
            }
        ]
    }
    return config, str(img_dir)


def test_sampling_strategies():
    rows = list(range(10))
    assert _apply_sampling(rows, "first:3", 0) == [0, 1, 2]
    assert _apply_sampling(rows, "end:2", 0) == [8, 9]
    r1 = _apply_sampling(rows, "random:4", 42)
    r2 = _apply_sampling(rows, "random:4", 42)
    assert r1 == r2 and len(r1) == 4
    assert _apply_sampling(rows, None, 0) == rows


def test_dataset_pipeline(tmp_path):
    config, img_dir = make_corpus(tmp_path)
    ds = GPDataset(config, img_dir=img_dir)
    assert len(ds) == 6
    s = ds[0]
    assert s.answer == "object 0"
    assert s.score_funcs == ["llm"]
    # boxes normalized to [0,1]
    np.testing.assert_allclose(
        s.normed_bboxes[0], [10 / 96, 10 / 64, 50 / 96, 40 / 64]
    )
    # missing image filter works
    config2 = {"datasets": [dict(config["datasets"][0], json_path=config["datasets"][0]["json_path"])]}
    ds2 = GPDataset(config2, img_dir="/nonexistent")
    assert len(ds2) == 0


def test_repeat_sampler():
    s = RepeatRandomSampler(3, num_repeats=2, seed=0)
    idx = list(s)
    assert len(idx) == 6
    assert idx[0] == idx[1] and idx[2] == idx[3]


def test_trainer_end_to_end(tmp_path):
    cfg = tiny_test_config()
    config, img_dir = make_corpus(tmp_path)
    ds = GPDataset(config, img_dir=img_dir)

    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng)
    model, params = init_params(cfg, prep)

    def tokenize(text):
        return [5 + (ord(c) % 200) for c in text[:10]]

    tcfg = TrainerConfig(
        batch_size=2, num_epochs=2, log_every=1, save_every=0,
        output_dir=str(tmp_path / "ckpt"), seq_multiple=8, patch_multiple=16,
        learning_rate=3e-3,
    )
    trainer = GPTrainer(cfg, model, params, ds, tokenize, tcfg=tcfg)
    history = trainer.train(max_steps=6)
    assert len(history) >= 5
    assert np.isfinite(history[-1]["loss"])
    assert history[-1]["loc_loss"] < history[0]["loc_loss"]

    # checkpoint written and loadable
    from glimpseprune_tpu.persistence import load_new_modules

    restored, loaded_cfg = load_new_modules(params, str(tmp_path / "ckpt"))
    assert loaded_cfg.gp.selected_layers == cfg.gp.selected_layers
    changed = np.abs(
        np.asarray(restored["learnable_embeddings"])
        - np.asarray(params["learnable_embeddings"])
    ).max()
    assert changed > 0  # trained weights differ from init


def test_trainer_resume(tmp_path):
    """Kill-and-resume must reproduce an uninterrupted run's metric stream
    (reference --resume_from_checkpoint, train_qwen_gp.py:1601-1608,1968)."""
    cfg = tiny_test_config()
    config, img_dir = make_corpus(tmp_path)
    ds = GPDataset(config, img_dir=img_dir)

    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng)
    model, params = init_params(cfg, prep)

    def tokenize(text):
        return [5 + (ord(c) % 200) for c in text[:10]]

    def make_tcfg(out):
        return TrainerConfig(
            batch_size=2, num_epochs=3, log_every=1, save_every=0,
            output_dir=str(tmp_path / out), seq_multiple=8, patch_multiple=16,
            learning_rate=3e-3,
        )

    # uninterrupted 6-step run
    t_full = GPTrainer(cfg, model, params, ds, tokenize, tcfg=make_tcfg("full"))
    hist_full = t_full.train(max_steps=6)

    # 4 steps (crossing an epoch boundary: 3 steps/epoch), kill, resume, 2 more
    t_a = GPTrainer(cfg, model, params, ds, tokenize, tcfg=make_tcfg("part"))
    t_a.train(max_steps=4)
    t_b = GPTrainer(cfg, model, params, ds, tokenize, tcfg=make_tcfg("part"),
                    resume_from=str(tmp_path / "part"))
    assert t_b._start_step == 4
    hist_resumed = t_b.train(max_steps=6)

    full_by_step = {h["step"]: h for h in hist_full}
    res_by_step = {h["step"]: h for h in hist_resumed}
    assert set(res_by_step) == set(full_by_step)
    for step in (5, 6):
        for key in ("loss", "loc_loss", "mask_iou"):
            np.testing.assert_allclose(
                res_by_step[step][key], full_by_step[step][key],
                rtol=2e-4, err_msg=f"step {step} {key}",
            )

"""Model-driven short-form eval: every task in the reference's eval list
(scripts/eval_qwen_gp.sh:94-105) runs prepare -> generate -> official score
end-to-end with a tiny model over official-format fixture files — the
in-process analogue of the reference's lmms-eval loop
(my_lmms_eval/models/qwen2_5_vl_gp.py:203-371).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.evalsuite import protocols as P
from glimpseprune_tpu.evalsuite.shortform import build_task_prompt, run_task
from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
from glimpseprune_tpu.models.qwen2_5_vl.runner import (
    GlimpsePruneRunner,
    prepare_inputs,
)


def tokenize(t):
    return [5 + (ord(c) % 200) for c in t]


def detokenize(ids):
    return "".join(chr(97 + (i % 26)) for i in ids)


def load_image(item):
    key = getattr(item, "question_id", None) or getattr(item, "index", 0)
    rng = np.random.default_rng(abs(hash(str(key))) % 2**32)
    return rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def runner():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(5, 400, 4)]
        + [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
        + [int(x) for x in rng.integers(5, 400, 3)]
    ]
    images = [rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)]
    prep = prepare_inputs(cfg, prompts, images, seq_multiple=8, patch_multiple=16)
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
    return GlimpsePruneRunner(cfg, variables["params"])


def _drive(runner, task, items, **kw):
    out = run_task(
        runner, task, items, tokenize, detokenize, load_image,
        max_new_tokens=4, batch_size=2, **kw,
    )
    # every item went through generate and got a text response
    assert all(isinstance(it.response, str) and it.response for it in items)
    # and the prompt construction produced the task's instruction text
    return out


# ---- fixture builders (official file formats) ------------------------------ #


def _write(tmp_path, name, content):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write(content)
    return p


def test_gqa_e2e(runner, tmp_path):
    p = _write(tmp_path, "questions.json", json.dumps({
        "q1": {"question": "Is the sky blue?", "answer": "yes", "imageId": "i1"},
        "q2": {"question": "What color is the cat?", "answer": "black",
               "imageId": "i2"},
    }))
    items = P.load_gqa_questions(p)
    assert build_task_prompt("gqa", items[0]).endswith("single word or phrase.")
    out = _drive(runner, "gqa", items)
    assert out["num"] == 2 and 0.0 <= out["accuracy"] <= 1.0


def test_vqav2_e2e(runner, tmp_path):
    qp = _write(tmp_path, "q.json", json.dumps({"questions": [
        {"question_id": 1, "image_id": 7, "question": "How many dogs?"},
        {"question_id": 2, "image_id": 8, "question": "What sport?"},
    ]}))
    ap = _write(tmp_path, "a.json", json.dumps({"annotations": [
        {"question_id": 1, "answers": [{"answer": "2"}] * 10},
        {"question_id": 2, "answers": [{"answer": "tennis"}] * 10},
    ]}))
    items = P.load_vqav2_questions(qp, ap)
    assert items[0].answers == ["2"] * 10
    out = _drive(runner, "vqav2_val_lite", items)
    assert out["num"] == 2 and 0.0 <= out["accuracy"] <= 1.0


def test_vizwiz_e2e(runner, tmp_path):
    p = _write(tmp_path, "val.json", json.dumps([
        {"image": "v1.jpg", "question": "What is this?",
         "answers": [{"answer": "soda"}] * 10, "answerable": 1},
    ]))
    items = P.load_vizwiz_annotations(p)
    assert "Unanswerable" in build_task_prompt("vizwiz_vqa_val", items[0])
    out = _drive(runner, "vizwiz_vqa_val", items)
    assert out["num"] == 1


def test_scienceqa_img_e2e(runner, tmp_path):
    p = _write(tmp_path, "problems.json", json.dumps({
        "10": {"question": "Which force?", "choices": ["push", "pull"],
               "answer": 1, "hint": "See the arrow.", "image": "x.png",
               "split": "test"},
        "11": {"question": "Which is bigger?", "choices": ["sun", "moon"],
               "answer": 0, "hint": "", "image": "y.png", "split": "test"},
    }))
    items = P.load_scienceqa_problems(p)
    assert build_task_prompt("scienceqa_img", items[0]).startswith("Context:")
    out = _drive(runner, "scienceqa_img", items)
    assert out["num"] == 2


def test_pope_e2e(runner, tmp_path):
    rows = [
        {"question_id": 1, "image": "a.jpg", "text": "Is there a dog?",
         "label": "yes"},
        {"question_id": 2, "image": "b.jpg", "text": "Is there a car?",
         "label": "no"},
    ]
    p = _write(tmp_path, "coco_pope_adversarial.json",
               "\n".join(json.dumps(r) for r in rows))
    items = P.load_pope_jsonl(p)
    assert items[0].subset == "adversarial"
    out = _drive(runner, "pope", items)
    assert {"accuracy", "precision", "recall", "f1", "yes_ratio"} <= set(out)


def test_mme_e2e(runner, tmp_path):
    d = os.path.join(str(tmp_path), "existence")
    os.makedirs(d)
    with open(os.path.join(d, "img001.txt"), "w") as f:
        f.write("Is there a bottle? Please answer yes or no.\tYes\n")
        f.write("Is there a train? Please answer yes or no.\tNo\n")
    items = P.load_mme_dir(str(tmp_path))
    assert len(items) == 2
    assert build_task_prompt("mme", items[0]).endswith("yes or no.")
    out = _drive(runner, "mme", items)
    assert "existence" in out["categories"]
    assert out["categories"]["existence"]["num_images"] == 1


def test_mmbench_e2e(runner, tmp_path):
    header = "index\tquestion\thint\tA\tB\tC\tD\tanswer\tcategory"
    rows = [
        "7\tWhat shape?\t\tcircle\tsquare\t\t\tA\tattribute",
        f"{7 + P.MMBENCH_CIRCULAR_BASE}\tWhat shape?\t\tsquare\tcircle\t\t\tB\tattribute",
    ]
    p = _write(tmp_path, "mmbench.tsv", "\n".join([header] + rows))
    items = P.load_mmbench_tsv(p)
    assert build_task_prompt("mmbench_en_test", items[0]).endswith("directly.")
    out = _drive(runner, "mmbench_en_test", items)
    # 2 circular rotations of 1 base question
    assert out["num_questions"] == 1 and out["num_rows"] == 2
    out_cn = run_task(runner, "mmbench_cn_test", items, tokenize, detokenize,
                      load_image, max_new_tokens=4)
    assert out_cn["num_questions"] == 1


def test_seedbench_e2e(runner, tmp_path):
    p = _write(tmp_path, "SEED-Bench.json", json.dumps({
        "question_type": {"Scene Understanding": 1},
        "questions": [
            {"question_id": "s1", "question": "Where is this?",
             "choice_a": "beach", "choice_b": "city", "choice_c": "forest",
             "choice_d": "desert", "answer": "A", "question_type_id": 1,
             "data_id": "im.png", "data_type": "image"},
        ],
    }))
    items = P.load_seedbench_json(p)
    out = _drive(runner, "seedbench", items)
    assert "Scene Understanding" in out["dimensions"]


def test_vstar_e2e(runner, tmp_path):
    rows = [
        {"question_id": 1, "image": "a.jpg", "label": "A",
         "category": "direct_attributes",
         "text": "What color is the sign?\n(A) red\n(B) blue\n"
                 "Answer with the option's letter from the given choices directly."},
        {"question_id": 2, "image": "b.jpg", "label": "B",
         "category": "relative_position",
         "text": "Where is the cup?\n(A) left\n(B) right\n"
                 "Answer with the option's letter from the given choices directly."},
    ]
    p = _write(tmp_path, "vstar.jsonl", "\n".join(json.dumps(r) for r in rows))
    items = P.load_vstar_jsonl(p)
    assert build_task_prompt("vstar_bench", items[0]) == items[0].text
    out = _drive(runner, "vstar_bench", items)
    assert set(out["categories"]) == {"direct_attributes", "relative_position"}


def test_run_task_with_generate_kwargs(runner, tmp_path):
    """generate_kwargs flow through (e.g. do_selection=False vanilla
    baseline — reference eval_*.sh --do_selection False)."""
    p = _write(tmp_path, "q.json", json.dumps(
        {"q1": {"question": "Is it day?", "answer": "yes", "imageId": "i"}}
    ))
    items = P.load_gqa_questions(p)
    out = run_task(runner, "gqa", items, tokenize, detokenize, load_image,
                   max_new_tokens=4, generate_kwargs={"do_selection": False})
    assert out["num"] == 1

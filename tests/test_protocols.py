"""Official short-form benchmark protocols over fixtures mirroring each
dataset's REAL schema (reference task list scripts/eval_qwen_gp.sh:96-107)."""

import json
import os

import numpy as np
import pytest

from glimpseprune_tpu.evalsuite.protocols import (
    GQAItem,
    MMBenchItem,
    MMEItem,
    POPEItem,
    ScienceQAItem,
    SeedBenchItem,
    VStarItem,
    build_mmbench_prompt,
    build_scienceqa_prompt,
    build_seedbench_prompt,
    extract_choice_letter,
    load_gqa_questions,
    load_mmbench_tsv,
    load_mme_dir,
    load_pope_jsonl,
    load_scienceqa_problems,
    load_seedbench_json,
    load_vstar_jsonl,
    score_gqa,
    score_mmbench,
    score_mme,
    score_pope,
    score_scienceqa,
    score_seedbench,
    score_vstar,
    vqa_normalize,
    vqav2_accuracy,
)
from glimpseprune_tpu.evalsuite.shortform import score_task


# ---------------------------------------------------------------- MME


def _mme_fixture(tmp_path):
    """Official layout: <cat>/questions_answers_YN/<img>.txt with two
    'question\\tanswer' lines per image."""
    root = tmp_path / "mme"
    for cat, imgs in [("existence", ["0001", "0002"]), ("code_reasoning", ["0003"])]:
        d = root / cat / "questions_answers_YN"
        d.mkdir(parents=True)
        for img in imgs:
            (d / f"{img}.txt").write_text(
                "Is there a dog in the image? Please answer yes or no.\tYes\n"
                "Is there a cat in the image? Please answer yes or no.\tNo\n"
            )
    return str(root)


def test_mme_loader_and_protocol(tmp_path):
    items = load_mme_dir(_mme_fixture(tmp_path))
    assert len(items) == 6
    assert {i.category for i in items} == {"existence", "code_reasoning"}

    # image 0001 fully right, image 0002 half right, cognition image right
    for i in items:
        if i.image_id == "0002" and i.answer == "No":
            i.response = "Yes, there is."
        else:
            i.response = i.answer
    res = score_mme(items)
    ex = res["categories"]["existence"]
    np.testing.assert_allclose(ex["acc"], 3 / 4)
    np.testing.assert_allclose(ex["acc_plus"], 1 / 2)
    np.testing.assert_allclose(ex["score"], (3 / 4 + 1 / 2) * 100)
    assert res["perception_score"] == ex["score"]
    assert res["cognition_score"] == res["categories"]["code_reasoning"]["score"] == 200.0
    assert score_task("mme", items) == res


# ---------------------------------------------------------------- MMBench


def _mmbench_fixture(tmp_path):
    """Official TSV columns, with circular rotations offset by 1e6."""
    rows = [
        "index\tquestion\thint\tA\tB\tC\tD\tanswer\tcategory",
        "1\tWhat color?\tnan\tred\tblue\tgreen\t\tA\tcolor",
        "1000001\tWhat color?\tnan\tblue\tgreen\tred\t\tC\tcolor",
        "2\tHow many?\tThere are animals.\tone\ttwo\tthree\tfour\tB\tcount",
    ]
    p = tmp_path / "mmbench_dev.tsv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_mmbench_loader_prompt_and_circular(tmp_path):
    items = load_mmbench_tsv(_mmbench_fixture(tmp_path))
    assert len(items) == 3
    assert items[0].options == {"A": "red", "B": "blue", "C": "green"}
    prompt = build_mmbench_prompt(items[2])
    assert prompt.startswith("There are animals.\nHow many?\nA. one\n")
    assert prompt.endswith("letter from the given choices directly.")
    # hint 'nan' dropped
    assert "nan" not in build_mmbench_prompt(items[0])

    # circular: q1 correct on base but wrong on rotation -> not counted
    items[0].response = "A"
    items[1].response = "A. blue"       # gt is C
    items[2].response = "The answer is (B)."
    res = score_mmbench(items)
    assert res["num_questions"] == 2 and res["num_rows"] == 3
    np.testing.assert_allclose(res["accuracy"], 1 / 2)
    assert res["categories"] == {"color": 0.0, "count": 1.0}

    # fix the rotation -> circular group counts
    items[1].response = "C"
    np.testing.assert_allclose(score_mmbench(items)["accuracy"], 1.0)


def test_extract_choice_letter_forms():
    opts = {"A": "red", "B": "blue", "C": "green"}
    assert extract_choice_letter("B", opts) == "B"
    assert extract_choice_letter("(C)", opts) == "C"
    assert extract_choice_letter("A. red", opts) == "A"
    assert extract_choice_letter("The answer is B.", opts) == "B"
    assert extract_choice_letter("it looks blue to me", opts) == "B"
    assert extract_choice_letter("either red or blue", opts) is None


# ---------------------------------------------------------------- POPE


def test_pope_loader_and_subsets(tmp_path):
    for subset, labels in [("random", ["yes", "no"]), ("adversarial", ["no", "no"])]:
        p = tmp_path / f"coco_pope_{subset}.json"
        with open(p, "w") as f:
            for i, lab in enumerate(labels):
                f.write(json.dumps({
                    "question_id": i,
                    "image": f"COCO_val2014_{i:012d}.jpg",
                    "text": "Is there a car in the image?",
                    "label": lab,
                }) + "\n")
    items = load_pope_jsonl(str(tmp_path / "coco_pope_random.json"))
    items += load_pope_jsonl(str(tmp_path / "coco_pope_adversarial.json"))
    assert [i.subset for i in items] == ["random", "random", "adversarial", "adversarial"]

    # model says yes to everything
    for i in items:
        i.response = "Yes"
    res = score_pope(items)
    np.testing.assert_allclose(res["accuracy"], 1 / 4)
    np.testing.assert_allclose(res["yes_ratio"], 1.0)
    np.testing.assert_allclose(res["recall"], 1.0)      # all gt-yes found
    np.testing.assert_allclose(res["precision"], 1 / 4)
    assert set(res["subsets"]) == {"random", "adversarial"}
    np.testing.assert_allclose(res["subsets"]["random"]["accuracy"], 1 / 2)


# ---------------------------------------------------------------- GQA


def test_gqa_questions_dict_format(tmp_path):
    p = tmp_path / "val_balanced_questions.json"
    p.write_text(json.dumps({
        "201307251": {"imageId": "2375429", "question": "Is the sky blue?",
                      "answer": "yes", "fullAnswer": "Yes, the sky is blue."},
        "201307252": {"imageId": "2375430", "question": "What is the man holding?",
                      "answer": "umbrella", "fullAnswer": "The man holds an umbrella."},
    }))
    items = load_gqa_questions(str(p))
    assert [i.question_id for i in items] == ["201307251", "201307252"]
    items[0].response = "Yes."
    items[1].response = "An umbrella"
    res = score_gqa(items)
    np.testing.assert_allclose(res["accuracy"], 1.0)
    items[1].response = "a stick"
    np.testing.assert_allclose(score_gqa(items)["accuracy"], 0.5)


# ---------------------------------------------------------------- VQAv2 / VizWiz


def test_vqa_normalization_official_cases():
    assert vqa_normalize("A dog!") == "dog"
    assert vqa_normalize("Two") == "2"
    assert vqa_normalize("dont") == "don't"
    assert vqa_normalize("none") == "0"
    assert vqa_normalize("10,000") == "10000"
    # ':' is NOT in the official punctuation list — it survives
    assert vqa_normalize("the answer is: yes") == "answer is: yes"


def test_vqav2_consensus_accuracy():
    gt10 = ["yes"] * 7 + ["no"] * 3
    # full credit: >=3 of any 9-subset match
    assert vqav2_accuracy(["yes"], [gt10]) == 1.0
    # partial credit for the minority answer: each of the 10 splits has
    # either 2 or 3 "no" among the other 9 -> mean(min(m/3,1))
    per = []
    for i in range(10):
        others = gt10[:i] + gt10[i + 1:]
        per.append(min(others.count("no") / 3.0, 1.0))
    np.testing.assert_allclose(vqav2_accuracy(["no"], [gt10]), np.mean(per))
    assert vqav2_accuracy(["maybe"], [gt10]) == 0.0
    # vizwiz-style short list
    assert vqav2_accuracy(["cat"], [["cat", "cat", "cat", "dog"]]) == 1.0


def test_score_task_dispatch_all_reference_tasks():
    """One scoring call per task in eval_qwen_gp.sh:96-107."""
    assert score_task("vqav2_val_lite", [("yes", ["yes"] * 10)])["accuracy"] == 1.0
    assert score_task("vizwiz_vqa_val", [("cat", ["cat"] * 4)])["accuracy"] == 1.0
    assert score_task("gqa", [GQAItem("1", "q", "yes", response="yes")])["accuracy"] == 1.0
    sqa = [ScienceQAItem("1", "q", {"A": "x", "B": "y"}, answer="B", response="B")]
    assert score_task("scienceqa_img", sqa)["accuracy"] == 1.0
    assert score_task("pope", [POPEItem(0, "q", "yes", response="yes")])["accuracy"] == 1.0
    mme = [MMEItem("1", "existence", "q", "Yes", response="yes")]
    assert score_task("mme", mme)["perception_score"] == 200.0
    mb = [MMBenchItem(1, "q", {"A": "x", "B": "y"}, answer="A", response="A")]
    assert score_task("mmbench_en_test", mb)["accuracy"] == 1.0
    assert score_task("mmbench_cn_test", mb)["accuracy"] == 1.0
    sb = [SeedBenchItem(1, "q", {"A": "x", "C": "z"}, answer="C",
                        question_type="scene", response="C")]
    assert score_task("seedbench", sb)["accuracy"] == 1.0
    vs = [VStarItem(1, "q\n(A) x\n(B) y", {"A": "x", "B": "y"}, label="A",
                    category="direct_attributes", response="(A)")]
    assert score_task("vstar_bench", vs)["accuracy"] == 1.0

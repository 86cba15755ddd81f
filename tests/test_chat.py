"""Chat-template layer: byte parity with the HF jinja rendering, vicuna_v1
format parity, tokenization splitting, and SFT label coverage
(reference GPCollator train_qwen_gp.py:600-662; llava/conversation.py:242)."""

import numpy as np
import pytest

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.preprocessing.chat import (
    LLAVA_IMAGE_TOKEN,
    QWEN_DEFAULT_SYSTEM,
    VICUNA_V1_SYSTEM,
    chat_prompt_ids,
    qwen_special_ids,
    render_qwen_chat,
    render_qwen_chat_jinja,
    render_vicuna_v1,
    split_sft_conversation,
)

CONVERSATIONS = [
    # plain string contents
    [{"role": "user", "content": "hello"}],
    # with explicit system turn
    [
        {"role": "system", "content": "Be terse."},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hey"},
    ],
    # typed parts: single image + text (the GPCollator shape)
    [
        {"role": "user", "content": [
            {"type": "image", "image": "x.jpg"},
            {"type": "text", "text": "What is this?"},
        ]},
        {"role": "assistant", "content": [{"type": "text", "text": "a cat"}]},
    ],
    # multi-image + video
    [
        {"role": "user", "content": [
            {"type": "image"},
            {"type": "image"},
            {"type": "video"},
            {"type": "text", "text": "compare"},
        ]},
    ],
    # image given as bare dict key (no type), as qwen-vl-utils allows
    [
        {"role": "user", "content": [
            {"image": "path.png"},
            {"type": "text", "text": "describe"},
        ]},
    ],
]


@pytest.mark.parametrize("i", range(len(CONVERSATIONS)))
@pytest.mark.parametrize("gen", [False, True])
@pytest.mark.parametrize("vid", [False, True])
def test_qwen_template_byte_parity(i, gen, vid):
    msgs = CONVERSATIONS[i]
    ours = render_qwen_chat(msgs, add_generation_prompt=gen, add_vision_id=vid)
    jinja = render_qwen_chat_jinja(msgs, add_generation_prompt=gen, add_vision_id=vid)
    assert ours == jinja


def test_qwen_template_shape():
    text = render_qwen_chat(CONVERSATIONS[2], add_generation_prompt=False)
    assert text == (
        f"<|im_start|>system\n{QWEN_DEFAULT_SYSTEM}<|im_end|>\n"
        "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>"
        "What is this?<|im_end|>\n"
        "<|im_start|>assistant\na cat<|im_end|>\n"
    )


def test_vicuna_v1_format():
    # reference conversation.py SeparatorStyle.TWO: system + " " then
    # "USER: msg ASSISTANT: msg</s>"; generation prompt = bare "ASSISTANT:"
    msgs = [
        {"role": "user", "content": [
            {"type": "image"}, {"type": "text", "text": "what?"}]},
    ]
    text = render_vicuna_v1(msgs, add_generation_prompt=True)
    assert text == (
        VICUNA_V1_SYSTEM + " USER: " + LLAVA_IMAGE_TOKEN + "\nwhat? ASSISTANT:"
    )

    full = render_vicuna_v1(
        msgs + [{"role": "assistant", "content": "a dog"}],
        add_generation_prompt=False,
    )
    assert full == (
        VICUNA_V1_SYSTEM + " USER: " + LLAVA_IMAGE_TOKEN + "\nwhat? ASSISTANT: a dog</s>"
    )


def _toy_tokenizer():
    def tokenize(t):
        assert "<|" not in t, f"special leaked into plain tokenizer: {t!r}"
        return [5 + (ord(c) % 200) for c in t]

    return tokenize


def test_chat_prompt_ids_splits_specials():
    cfg = tiny_test_config()
    sids = qwen_special_ids(cfg, im_start_id=497)
    tok = _toy_tokenizer()
    text = "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>hi<|im_end|>\n"
    ids = chat_prompt_ids(text, tok, sids)
    assert ids == (
        [497] + tok("user\n")
        + [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
        + tok("hi") + [cfg.eos_token_id] + tok("\n")
    )
    # exactly one image marker for prepare_inputs to expand
    assert ids.count(cfg.image_token_id) == 1


def test_split_sft_conversation_label_coverage():
    """prompt/answer split == reference mask-until-last-<|im_start|>+3:
    prompt ends with [im_start, 'assistant', '\\n'] and the answer carries
    everything after."""
    cfg = tiny_test_config()
    sids = qwen_special_ids(cfg, im_start_id=497)
    tok = _toy_tokenizer()
    msgs = CONVERSATIONS[2]
    prompt, answer = split_sft_conversation(msgs, tok, sids)

    full_text = render_qwen_chat(msgs)
    assert prompt + answer == chat_prompt_ids(full_text, tok, sids)
    # prompt suffix is the assistant header: im_start + tokenize("assistant\n")
    header = [497] + tok("assistant\n")
    assert prompt[-len(header):] == header
    # answer = "a cat" + <|im_end|> + "\n"
    assert answer == tok("a cat") + [cfg.eos_token_id] + tok("\n")


def test_prepare_chat_inputs_and_collate():
    cfg = tiny_test_config()
    from glimpseprune_tpu.models.qwen2_5_vl.runner import prepare_chat_inputs

    tok = _toy_tokenizer()
    sids = qwen_special_ids(cfg, im_start_id=497)
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)]
    msgs = [CONVERSATIONS[2]]

    prep = prepare_chat_inputs(
        cfg, msgs, images, tok, special_ids=sids, is_sft=True,
        normed_bboxes=[[[0.0, 0.0, 0.5, 1.0]]],
        seq_multiple=8, patch_multiple=16,
    )
    assert prep.labels is not None
    # labels cover exactly the answer tokens (+ le splice handled inside)
    lab = prep.labels[0]
    n_labeled = int((lab != -100).sum())
    answer_len = len(tok("a cat")) + 1 + len(tok("\n"))
    assert n_labeled == answer_len

    # inference path: generation prompt, no labels
    prep2 = prepare_chat_inputs(
        cfg, [msgs[0][:1]], images, tok, special_ids=sids, is_sft=False,
        seq_multiple=8, patch_multiple=16,
    )
    assert prep2.labels is None
    # rendered prompt ends with the assistant header before the glimpse slots
    ids = prep2.input_ids[0][prep2.valid[0]]
    n_le = cfg.gp.le_length if cfg.gp.has_le else 0
    header = [497] + tok("assistant\n")
    tail = ids[: len(ids) - n_le][-len(header):]
    assert list(tail) == header


def test_prepare_llava_chat_inputs():
    from glimpseprune_tpu.models.llava.runner import prepare_llava_chat_inputs
    from tests.test_llava import tiny_clip_cfg, tiny_llava_config

    cfg = tiny_llava_config()
    clip_cfg = tiny_clip_cfg()
    tok = _toy_tokenizer()
    rng = np.random.default_rng(2)
    images = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)]
    msgs = [[
        {"role": "user", "content": [
            {"type": "image"}, {"type": "text", "text": "what?"}]},
        {"role": "assistant", "content": "a dog"},
    ]]
    prep = prepare_llava_chat_inputs(
        cfg, clip_cfg, msgs, images, tok, is_sft=True, seq_multiple=8,
    )
    assert prep.labels is not None
    # answer = " a dog" + </s>(eos)
    n_labeled = int((prep.labels[0] != -100).sum())
    assert n_labeled == len(tok(" a dog")) + 1
    # inference path renders a bare "ASSISTANT:" generation prompt
    prep2 = prepare_llava_chat_inputs(
        cfg, clip_cfg, [msgs[0][:1]], images, tok, is_sft=False, seq_multiple=8,
    )
    ids = prep2.input_ids[0][prep2.valid[0]]
    n_le = cfg.gp.le_length if cfg.gp.has_le else 0
    tail = list(ids[: len(ids) - n_le][-len(tok("ASSISTANT:")):])
    assert tail == tok("ASSISTANT:")


def test_chat_collate_matches_reference_shape(tmp_path):
    from glimpseprune_tpu.training.data import TrainSample
    from glimpseprune_tpu.training.trainer import TrainerConfig, chat_collate

    cfg = tiny_test_config()
    rng = np.random.default_rng(1)
    samples = [
        TrainSample(query="what?", answer="a cat", img_path="a",
                    normed_bboxes=[[0.0, 0.0, 0.5, 1.0]]),
        TrainSample(query="where?", answer="left", img_path="b",
                    normed_bboxes=[[0.5, 0.0, 1.0, 1.0]]),
    ]
    tcfg = TrainerConfig(batch_size=2, seq_multiple=8, patch_multiple=16)

    def load_image(_):
        return rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)

    batch = chat_collate(
        cfg, samples, _toy_tokenizer(), load_image, tcfg, im_start_id=497,
        special_ids=qwen_special_ids(cfg, im_start_id=497),
    )
    assert batch["labels"].shape == batch["input_ids"].shape
    assert (np.asarray(batch["labels"]) != -100).any(axis=1).all()
    assert np.asarray(batch["ref_token_masks"]).any(axis=1).all()

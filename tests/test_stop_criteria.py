"""Stop-criteria parity (VERDICT round-2 item #7).

The reference's LLaVA path stops generation on multi-token keyword matches
(llava_gp/mm_utils.py:236-264 KeywordsStoppingCriteria) and its callers strip
the stop string from the output; Qwen stops on eos. Here the id-level
`stop_sequences` hook is checked host-side between decode chunks, and
`check_eos_every` sets the chunk granularity (it used to be accepted and
ignored).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
from glimpseprune_tpu.models.qwen2_5_vl.runner import (
    GlimpsePruneRunner,
    prepare_inputs,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prompts = []
    for _ in range(2):
        prompts.append(
            [int(x) for x in rng.integers(5, 400, 4)]
            + [cfg.vision_start_token_id, cfg.image_token_id, cfg.vision_end_token_id]
            + [int(x) for x in rng.integers(5, 400, 3)]
        )
    images = [rng.integers(0, 255, (64, 96, 3), dtype=np.uint8),
              rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)]
    prep = prepare_inputs(cfg, prompts, images, seq_multiple=8, patch_multiple=16)
    model = Qwen2_5_VL_GP(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prep.input_ids), jnp.asarray(prep.valid),
        jnp.asarray(prep.position_ids), jnp.asarray(prep.patches),
        jnp.asarray(prep.vis_pos_ids), jnp.asarray(prep.full_seg),
        jnp.asarray(prep.vis_valid), jnp.asarray(prep.packed_idx),
        jnp.asarray(prep.img_slots), jnp.asarray(prep.img_valid),
        jnp.asarray(prep.fuser.window_index),
        jnp.asarray(prep.fuser.reverse_index),
        jnp.asarray(prep.fuser.segment_ids),
        jnp.asarray(prep.fuser.pos_ids),
        jnp.asarray(prep.le_start), prep.out_len,
    )
    runner = GlimpsePruneRunner(cfg, variables["params"])
    return cfg, runner, prep


def test_first_stop_match_unit():
    f = GlimpsePruneRunner._first_stop_match
    row = np.array([5, 9, 2, 7, 9, 2, 1], dtype=np.int64)
    assert f(row, [[9, 2]]) == 1
    assert f(row, [[7, 9, 2]]) == 3
    assert f(row, [[9, 2], [7, 9]]) == 1       # earliest of several
    assert f(row, [[2, 9]]) == -1              # order matters
    assert f(row, [[5, 9, 2, 7, 9, 2, 1, 1]]) == -1  # longer than row
    assert f(row, [[]]) == -1


def test_trim_stop_sequence_excluded():
    """Stop match trims BEFORE the sequence (the reference's callers strip
    the stop string); eos still trims inclusively."""
    r = GlimpsePruneRunner
    seqs = np.array([[4, 8, 3, 6, 1, 1],
                     [4, 8, 7, 0, 3, 6]], dtype=np.int64)
    trimmed, n_gen = r._trim_eos(r, seqs.copy(), 6, eos=7,
                                 stop_sequences=[[3, 6]])
    # row 0: stop at 2 -> n_gen 2, tail filled with eos
    np.testing.assert_array_equal(trimmed[0], [4, 8, 7, 7, 7, 7])
    # row 1: eos at 2 beats the later stop match
    np.testing.assert_array_equal(trimmed[1], [4, 8, 7, 7, 7, 7])
    np.testing.assert_array_equal(n_gen, [2, 3])


def test_generate_honors_stop_sequences(setup):
    cfg, runner, prep = setup
    base = runner.generate(prep, max_new_tokens=10, do_selection=True)
    b = np.asarray(base.sequences)
    # build a stop sequence from what row 0 actually generates
    stop = [int(b[0, 3]), int(b[0, 4])]
    res = runner.generate(prep, max_new_tokens=10, do_selection=True,
                          stop_sequences=[stop])
    s = np.asarray(res.sequences)
    m = runner._first_stop_match(b[0], [stop])
    assert m >= 0
    assert res.num_generated[0] == m
    np.testing.assert_array_equal(s[0, :m], b[0, :m])
    assert (s[0, m:] == cfg.eos_token_id).all()
    # rows without a match keep the baseline output
    if runner._first_stop_match(b[1], [stop]) < 0:
        np.testing.assert_array_equal(s[1], b[1])


def test_check_eos_every_changes_chunking_not_tokens(setup):
    cfg, runner, prep = setup
    a = runner.generate(prep, max_new_tokens=7, do_selection=True)
    b = runner.generate(prep, max_new_tokens=7, do_selection=True,
                        check_eos_every=3)
    np.testing.assert_array_equal(a.sequences, b.sequences)
    np.testing.assert_array_equal(a.num_generated, b.num_generated)


def test_stream_generate_stop_sequences(setup):
    cfg, runner, prep = setup
    base = runner.generate(prep, max_new_tokens=8, do_selection=True)
    b = np.asarray(base.sequences)
    stop = [int(b[0, 2]), int(b[0, 3])]

    gen = runner.stream_generate(prep, max_new_tokens=8, chunk_size=2,
                                 stop_sequences=[stop])
    res = None
    try:
        while True:
            next(gen)
    except StopIteration as s:
        res = s.value
    m = runner._first_stop_match(b[0], [stop])
    assert res.num_generated[0] == m
    np.testing.assert_array_equal(np.asarray(res.sequences)[0, :m], b[0, :m])

"""Two-phase (delayed-selection) API: override logits, reuse state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner

from test_training import build_batch, init_params


def test_delayed_selection_matches_one_shot_and_allows_override():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    runner = GlimpsePruneRunner(cfg, params)

    one_shot = runner.glimpse(prep)
    mask_logits, state = runner.glimpse_delayed(prep)
    np.testing.assert_allclose(
        np.asarray(mask_logits), np.asarray(one_shot.mask_logits), rtol=1e-5, atol=1e-5
    )
    out = runner.apply_selection(state, mask_logits, prep.out_len)
    np.testing.assert_array_equal(
        np.asarray(out.keep_img), np.asarray(one_shot.keep_img)
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), np.asarray(one_shot.logits), rtol=1e-4, atol=1e-4
    )

    # override: force-keep only the first two image tokens of each row
    override = jnp.full_like(mask_logits, -30.0)
    override = override.at[-1, :, :2].set(30.0)
    out2 = runner.apply_selection(state, override, prep.out_len)
    keep = np.asarray(out2.keep_img)
    assert keep[:, :2].all()
    assert keep.sum(1).max() <= 2 + cfg.gp.min_remain_num


def test_harvest_rows_api():
    """Per-layer/head glimpse attention rows for visualization (Sep-model
    extraction parity)."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    runner = GlimpsePruneRunner(cfg, params)
    rows = runner.harvest_rows(prep, layers=(0, 1))
    assert set(rows) == {0, 1}
    for r in rows.values():
        r = np.asarray(r)
        assert r.shape == (2, prep.img_valid.shape[1], cfg.text.num_attention_heads)
        assert np.isfinite(r).all()
    # log-prob rows: probabilities over visible keys <= 1
    assert float(np.exp(np.asarray(rows[1])).max()) <= 1.0 + 1e-5


def test_harvest_rows_multi_query():
    """Sep-model multi-query extraction (reference model_sep.py:53-72):
    softmaxed rows for every query from q_start, matching the single-query
    harvest at the last position."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    runner = GlimpsePruneRunner(cfg, params)

    S = prep.input_ids.shape[1]
    q_start = S - 3
    rows = runner.harvest_rows(prep, layers=(0, 1), q_start=q_start)
    N = prep.img_valid.shape[1]
    for r in rows.values():
        r = np.asarray(r)
        assert r.shape == (2, 3, N, cfg.text.num_attention_heads)
        assert np.isfinite(r).all()
        # softmax rows: per-query mass over image keys can't exceed 1
        img_mass = np.where(np.asarray(prep.img_valid)[:, None, :, None], r, 0).sum(2)
        assert (img_mass <= 1 + 1e-5).all()

    # the last query's softmax row == exp(single-query log-prob row)
    single = runner.harvest_rows(prep, layers=(0, 1))
    np.testing.assert_allclose(
        np.asarray(rows[1][:, -1]),
        np.exp(np.asarray(single[1])) * np.asarray(prep.img_valid)[:, :, None],
        rtol=1e-4, atol=1e-6,
    )

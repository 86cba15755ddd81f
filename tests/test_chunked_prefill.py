"""Chunked vanilla prefill == monolithic prefill (token-identical decode).

The chunked path runs language.decode_step with S_new=C per chunk straight
into a decode-ready cache (the admission-granularity primitive for
continuous serving); the monolithic path is run_layers + the decode-cache
build. Same math, different schedule — greedy tokens must match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner

from test_training import build_batch, init_params


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    return cfg, prep, params


@pytest.mark.parametrize("chunk", [8, 16])
def test_chunked_prefill_matches_vanilla(setup, chunk):
    cfg, prep, params = setup
    runner = GlimpsePruneRunner(cfg, params, donate_cache=False)

    base = runner.generate(prep, max_new_tokens=6, do_selection=False)

    max_new = 6
    logits, valid, pos, kc, vc = runner.vanilla_prefill_chunked(
        prep, chunk_size=chunk,
        prealloc_t=int(prep.input_ids.shape[1]) + max_new + 32,
    )
    T = jax.tree.leaves(kc)[0].shape[2]
    seqs, n_gen = runner._decode_loop(
        logits, valid, pos, kc, vc, max_new, cfg.eos_token_id,
        prealloc_t=T,
    )
    np.testing.assert_array_equal(seqs, np.asarray(base.sequences))
    np.testing.assert_array_equal(n_gen, np.asarray(base.num_generated))


def test_chunked_prefill_logits_close(setup):
    """The final-position logits agree with the monolithic forward
    numerically (different attention schedule, same math)."""
    cfg, prep, params = setup
    runner = GlimpsePruneRunner(cfg, params, donate_cache=False)
    inputs = runner._device_inputs(prep, False)
    le_len = cfg.gp.le_length if cfg.gp.has_le else 0
    ids = inputs["input_ids"][:, :-le_len] if le_len else inputs["input_ids"]
    valid = inputs["valid"][:, :-le_len] if le_len else inputs["valid"]
    pos = inputs["position_ids"][:, :, :-le_len] if le_len else inputs["position_ids"]
    image_embeds = runner._vision(
        {"params": runner.params}, inputs["patches"], inputs["vis_pos_ids"],
        inputs["full_seg"], inputs["vis_valid"])[0]
    ref_logits, _, _ = runner._vanilla(
        {"params": runner.params}, ids, valid, pos, image_embeds,
        inputs["packed_idx"], inputs["img_slots"], inputs["img_valid"])

    logits, _, _, _, _ = runner.vanilla_prefill_chunked(prep, chunk_size=8)
    np.testing.assert_allclose(np.asarray(logits)[:, 0],
                               np.asarray(ref_logits)[:, -1],
                               rtol=2e-4, atol=2e-4)


def test_chunked_prefill_int8_kv_cache(setup):
    """Chunked prefill writes through the int8 KV tier identically to the
    monolithic build (both quantize the same values at the same slots)."""
    import dataclasses

    cfg, prep, params = setup
    qcfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, kv_cache_quant="int8"))
    runner = GlimpsePruneRunner(qcfg, params, donate_cache=False)

    base = runner.generate(prep, max_new_tokens=5, do_selection=False)

    logits, valid, pos, kc, vc = runner.vanilla_prefill_chunked(
        prep, chunk_size=8, prealloc_t=int(prep.input_ids.shape[1]) + 5 + 32)
    assert isinstance(kc, dict) and kc["q"].dtype == jnp.int8
    T = kc["q"].shape[2]
    seqs, _ = runner._decode_loop(
        logits, valid, pos, kc, vc, 5, qcfg.eos_token_id, prealloc_t=T)
    np.testing.assert_array_equal(seqs, np.asarray(base.sequences))

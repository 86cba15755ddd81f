"""Sequence (context) parallelism on the 8-device virtual CPU mesh.

SP shards the PREFILL sequence dim over a mesh axis (the "sp" in
dp/tp/sp): window attention with zero collectives, full/causal attention
with Q local + one K/V all-gather, causal masking against global slot
positions via the flash kernel's q_positions path. The reference has no
analogue (DDP only, SURVEY.md §2.8). Every test demands equality with the
unsharded path on the SAME impl (xla vs xla, flash_interpret vs
flash_interpret).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner
from glimpseprune_tpu.ops import attention as attn_mod
from glimpseprune_tpu.ops.attention import (
    batched_window_attention,
    causal_segment_attention,
    segment_attention,
    set_attention_impl,
    set_sequence_parallel,
)
from glimpseprune_tpu.ops.pallas.flash_attention import flash_attention
from glimpseprune_tpu.parallel import make_mesh, sequence_parallel, shard_params

from test_training import build_batch, init_params


@pytest.fixture(autouse=True)
def _sp_off_after():
    yield
    set_sequence_parallel(None)
    set_attention_impl("auto")


def test_flash_qpos_matches_monolithic():
    """Sharded-Q causal flash (q_positions) == one monolithic causal call,
    including a left-padded row, non-block-aligned shard lengths, and the
    int8 tiers."""
    B, H, S, D = 2, 2, 512, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    seg = np.zeros((B, S), np.int32)
    seg[1, :17] = -1  # left padding
    seg = jnp.asarray(seg)

    for int8 in (False, True):
        full = flash_attention(q, k, v, seg, seg, causal=True, interpret=True,
                               block_q=128, block_k=128,
                               qkv_int8=int8, pv_int8=int8)
        n, sl = 4, S // 4
        parts = []
        for i in range(n):
            qpos = jnp.broadcast_to(i * sl + jnp.arange(sl), (B, sl))
            parts.append(flash_attention(
                q[:, :, i * sl:(i + 1) * sl], k, v,
                seg[:, i * sl:(i + 1) * sl], seg, causal=True,
                interpret=True, block_q=128, block_k=128,
                qkv_int8=int8, pv_int8=int8, q_positions=qpos))
        np.testing.assert_array_equal(np.asarray(jnp.concatenate(parts, 2)),
                                      np.asarray(full))

    # non-block-aligned q shard
    full = flash_attention(q, k, v, seg, seg, causal=True, interpret=True,
                           block_q=128, block_k=128)
    qpos = jnp.broadcast_to(jnp.arange(100, 160), (B, 60))
    part = flash_attention(q[:, :, 100:160], k, v, seg[:, 100:160], seg,
                           causal=True, interpret=True, block_q=128,
                           block_k=128, q_positions=qpos)
    np.testing.assert_array_equal(np.asarray(part),
                                  np.asarray(full[:, :, 100:160]))


@pytest.mark.parametrize("impl", ["xla", "flash_interpret"])
def test_sp_segment_attention_matches(impl):
    set_attention_impl(impl)
    S, H, D = 256, 2, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    seg = np.zeros((S,), np.int32)
    seg[: S // 2] = 0
    seg[S // 2:] = 1
    seg[-13:] = -1  # trailing padding
    seg = jnp.asarray(seg)

    base = segment_attention(q, k, v, seg)
    mesh = make_mesh(8, model_axis=2)
    assert attn_mod._sp_split(S) is None  # off until enabled
    with sequence_parallel(mesh):
        assert attn_mod._sp_split(S) is not None
        sp = segment_attention(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["xla", "flash_interpret"])
def test_sp_causal_attention_matches(impl):
    set_attention_impl(impl)
    B, S, Hq, Hkv, D = 2, 256, 4, 2, 16
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    valid = np.ones((B, S), bool)
    valid[1, :29] = False  # left padding
    valid = jnp.asarray(valid)

    base = causal_segment_attention(q, k, v, valid)
    mesh = make_mesh(8, model_axis=2)
    with sequence_parallel(mesh):
        sp = causal_segment_attention(q, k, v, valid)
    # compare only valid rows: the two impls already differ on pad rows
    # (uniform-softmax vs zeroed), and SP preserves each impl's convention
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(sp) * m, np.asarray(base) * m,
                               rtol=2e-5, atol=2e-5)


def test_sp_window_attention_matches():
    wp = 16
    P, H, D = 8 * wp * 4, 2, 16
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((P, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((P, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((P, H, D)), jnp.float32)
    valid = np.ones((P,), bool)
    valid[-9:] = False
    valid = jnp.asarray(valid)

    base = batched_window_attention(q, k, v, valid, wp)
    mesh = make_mesh(8, model_axis=2)
    with sequence_parallel(mesh):
        sp = batched_window_attention(q, k, v, valid, wp)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_sp_generate_matches_single_device():
    """The strongest contract: the full GP pipeline (ViT + glimpse prefill +
    keep/compact + resume + decode) with SP enabled returns the SAME greedy
    tokens and mask logits as the single-device run — runner code untouched
    (mirrors test_sharding.py's zero-touch pattern)."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)

    res_single = GlimpsePruneRunner(cfg, params).generate(prep, max_new_tokens=4)

    mesh = make_mesh(8, model_axis=2)
    # the prefill seq must actually split (seq_multiple=8 on a 4-way axis)
    assert prep.input_ids.shape[1] % mesh.shape["data"] == 0
    sharded = shard_params(params, mesh)
    with sequence_parallel(mesh):
        res_sp = GlimpsePruneRunner(cfg, sharded).generate(prep, max_new_tokens=4)

    np.testing.assert_array_equal(res_single.sequences, res_sp.sequences)
    np.testing.assert_allclose(res_single.mask_logits, res_sp.mask_logits,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["auto", "flash_interpret"])
def test_sp_train_step_runs(impl):
    """Training under SP differentiates through shard_map + both attention
    impls — flash_interpret exercises the q_positions custom vjp (the
    pallas backward with global-position masking) inside the sharded
    causal path."""
    import optax

    from glimpseprune_tpu.training import init_train_state, make_train_step

    set_attention_impl(impl)
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, batch = build_batch(cfg, rng)
    model, params = init_params(cfg, prep)

    mesh = make_mesh(8, model_axis=2)
    opt = optax.adam(1e-3)
    params_sh = shard_params(params, mesh)
    step_fn = jax.jit(make_train_step(cfg, model, opt))
    state, frozen = init_train_state(params_sh, opt)
    with sequence_parallel(mesh):
        state, metrics = step_fn(state, frozen, batch, jax.random.PRNGKey(0))
        loss = float(metrics["loss"])
    assert np.isfinite(loss)

"""Multi-chip sharding on the 8-device virtual CPU mesh (SURVEY.md §4d)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner, prepare_inputs
from glimpseprune_tpu.parallel import make_mesh, shard_batch, shard_params
from glimpseprune_tpu.training import init_train_state, make_train_step

from test_training import build_batch, init_params


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 2, "model": 4}
    mesh2 = make_mesh(8, model_axis=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_sharded_generate_matches_single_device():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)

    runner = GlimpsePruneRunner(cfg, params)
    res_single = runner.generate(prep, max_new_tokens=4)

    mesh = make_mesh(8, model_axis=2)  # tiny cfg: 4 q heads / 2 kv heads
    sharded_params = shard_params(params, mesh)
    runner_sh = GlimpsePruneRunner(cfg, sharded_params)
    res_sharded = runner_sh.generate(prep, max_new_tokens=4)

    np.testing.assert_array_equal(res_single.sequences, res_sharded.sequences)
    np.testing.assert_allclose(
        res_single.mask_logits, res_sharded.mask_logits, rtol=1e-4, atol=1e-4
    )


def test_sharded_train_step_runs():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, batch = build_batch(cfg, rng)
    model, params = init_params(cfg, prep)

    mesh = make_mesh(8, model_axis=2)
    opt = optax.adam(1e-3)
    params_sh = shard_params(params, mesh)
    batch_sh = shard_batch(batch, mesh)
    step_fn = jax.jit(make_train_step(cfg, model, opt))
    state, frozen = init_train_state(params_sh, opt)
    state, metrics = step_fn(state, frozen, batch_sh, jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)


def test_sharded_int8_generate_matches_single_device():
    """Quantized (kernel_q/scale) trees shard by the same rules and generate
    identically across the mesh — the multi-chip serving path for 7B+."""
    from glimpseprune_tpu.quantization import quantize_int8, quantized_config

    cfg = tiny_test_config()
    rng = np.random.default_rng(1)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    qcfg = quantized_config(cfg)
    qparams = quantize_int8(params)

    res_single = GlimpsePruneRunner(qcfg, qparams).generate(prep, max_new_tokens=4)
    mesh = make_mesh(8, model_axis=2)
    res_sharded = GlimpsePruneRunner(qcfg, shard_params(qparams, mesh)).generate(
        prep, max_new_tokens=4
    )
    np.testing.assert_array_equal(res_single.sequences, res_sharded.sequences)
    np.testing.assert_allclose(
        res_single.mask_logits, res_sharded.mask_logits, rtol=1e-4, atol=1e-4
    )

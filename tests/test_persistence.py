"""New-module checkpoint roundtrip + reference torch checkpoint import."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.persistence import (
    import_torch_new_modules,
    load_new_modules,
    save_new_modules,
)
from glimpseprune_tpu.training import split_params

from test_training import build_batch, init_params


def test_save_load_roundtrip(tmp_path):
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)

    save_new_modules(params, cfg, str(tmp_path / "ckpt"))

    # perturb the new modules, then load back
    perturbed = dict(params)
    perturbed["learnable_embeddings"] = params["learnable_embeddings"] + 1.0
    restored, loaded_cfg = load_new_modules(perturbed, str(tmp_path / "ckpt"))
    np.testing.assert_array_equal(
        np.asarray(restored["learnable_embeddings"]),
        np.asarray(params["learnable_embeddings"]),
    )
    assert loaded_cfg.gp.selected_layers == cfg.gp.selected_layers
    # frozen tree untouched
    assert restored["text"] is perturbed["text"]


def test_torch_new_modules_import_matches_reference_layout():
    """Build a reference-layout torch state dict (same module structure as
    model_gp.py _init_new_modules) and check every leaf lands with the right
    shape in our pytree."""
    import torch
    import torch.nn as tnn

    cfg = tiny_test_config()
    gp = cfg.gp
    F, C, H = gp.attn_fuse_size, gp.visual_cond_size, cfg.text.hidden_size
    qk = F + C
    n_fuser = len(gp.selected_visual_layers)
    n_attn_in = len(gp.selected_layers) * cfg.text.num_attention_heads

    torch.manual_seed(0)
    fuser_sd = {}
    fuser_sd["attn_in_proj.weight"] = torch.randn(F, n_attn_in)
    fuser_sd["attn_in_proj.bias"] = torch.randn(F)
    for i in range(n_fuser):
        fuser_sd[f"cond_in_projs.{i}.weight"] = torch.randn(C, cfg.vision.hidden_size)
        fuser_sd[f"cond_in_projs.{i}.bias"] = torch.randn(C)
        fuser_sd[f"layers.{i}.norm1.weight"] = torch.randn(F)
        fuser_sd[f"layers.{i}.norm2.weight"] = torch.randn(F)
        for n, shape in (
            ("q_proj", (qk, qk)), ("k_proj", (qk, qk)),
            ("v_proj", (F, F)), ("o_proj", (F, F)),
        ):
            fuser_sd[f"layers.{i}.attn.{n}.weight"] = torch.randn(*shape)
        for n, shape in (
            ("gate_proj", (2 * F, F)), ("up_proj", (2 * F, F)), ("down_proj", (F, 2 * F)),
        ):
            fuser_sd[f"layers.{i}.mlp.{n}.weight"] = torch.randn(*shape)
            fuser_sd[f"layers.{i}.mlp.{n}.bias"] = torch.randn(shape[0])
        fuser_sd[f"attn_out_projs.{i}.weight"] = torch.randn(1, F)
        fuser_sd[f"attn_out_projs.{i}.bias"] = torch.randn(1)

    state = {
        "attn_fuser": fuser_sd,
        "learnable_embeddings": torch.randn(len(gp.le_layers), gp.le_length, H),
        "le_proj": {"weight": torch.randn(H, H), "bias": torch.randn(H)},
        "le_norm": {"weight": torch.randn(H)},
    }
    ours = import_torch_new_modules(state, cfg)

    # graft onto a real init tree and verify structural compatibility
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    trainable, frozen = split_params(params)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, trainable)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, ours)
    assert ref_shapes == got_shapes

    # run the model with the imported weights to prove it is usable
    from glimpseprune_tpu.models.qwen2_5_vl.runner import GlimpsePruneRunner

    merged = {**frozen, **jax.tree_util.tree_map(jnp.asarray, ours)}
    runner = GlimpsePruneRunner(cfg, merged)
    res = runner.generate(prep, max_new_tokens=3)
    assert res.sequences.shape[1] == 3


def test_full_params_roundtrip(tmp_path):
    from glimpseprune_tpu.persistence import load_full_params, save_full_params

    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    save_full_params(params, str(tmp_path / "full"))
    restored = load_full_params(str(tmp_path / "full"))
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_full_params_int8_roundtrip(tmp_path):
    """Quantized (int8 + scale) trees persist through orbax unchanged."""
    import jax
    from glimpseprune_tpu.persistence import load_full_params, save_full_params
    from glimpseprune_tpu.quantization import quantize_int8

    cfg = tiny_test_config()
    rng = np.random.default_rng(11)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    _, params = init_params(cfg, prep)
    qparams = quantize_int8(params)
    save_full_params(qparams, str(tmp_path))
    loaded = load_full_params(str(tmp_path))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(qparams)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        assert pa == pb
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

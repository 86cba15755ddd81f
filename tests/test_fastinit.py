"""fast_random_params must be a drop-in for model.init in bench/profile paths.

Guards the numpy-PCG host init (utils/fastinit.py) used by
BENCH_REAL_WEIGHTS and profile_train_step --quant: exact tree/shape/dtype
parity with flax init, the documented init law, and a finite forward.
"""

import numpy as np

import jax
import jax.numpy as jnp

from glimpseprune_tpu.config import tiny_test_config
from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
from glimpseprune_tpu.utils.fastinit import fast_random_params

from test_training import build_batch, init_params


def _model_init_args(prep):
    return (
        jax.random.PRNGKey(0),
        jnp.asarray(prep.input_ids), jnp.asarray(prep.valid),
        jnp.asarray(prep.position_ids), jnp.asarray(prep.patches),
        jnp.asarray(prep.vis_pos_ids), jnp.asarray(prep.full_seg),
        jnp.asarray(prep.vis_valid), jnp.asarray(prep.packed_idx),
        jnp.asarray(prep.img_slots), jnp.asarray(prep.img_valid),
        jnp.asarray(prep.fuser.window_index), jnp.asarray(prep.fuser.reverse_index),
        jnp.asarray(prep.fuser.segment_ids), jnp.asarray(prep.fuser.pos_ids),
        jnp.asarray(prep.le_start),
    )


def test_fastinit_tree_matches_flax_init():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    model, flax_params = init_params(cfg, prep)

    fast = fast_random_params(model, _model_init_args(prep), prep.out_len)

    flat_a = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(fast)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        assert va.shape == vb.shape, (pa, va.shape, vb.shape)
        assert va.dtype == vb.dtype, (pa, va.dtype, vb.dtype)


def test_fastinit_law_and_forward():
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    prep, _ = build_batch(cfg, rng, with_labels=False)
    model = Qwen2_5_VL_GP(cfg)
    fast = fast_random_params(model, _model_init_args(prep), prep.out_len)

    checked = {"bias": 0, "norm": 0, "kernel": 0}
    for path, leaf in jax.tree_util.tree_flatten_with_path(fast)[0]:
        name = str(getattr(path[-1], "key", path[-1]))
        arr = np.asarray(leaf, np.float64)
        if name == "bias":
            assert (arr == 0).all(), path
            checked["bias"] += 1
        elif name in ("scale", "weight"):
            # norm scales MUST be ones — zeros here degenerate every block
            # (regression: RMSNorm params are named "weight", layers.py:29)
            assert (arr == 1).all(), path
            checked["norm"] += 1
        elif name == "kernel" and arr.ndim >= 2 and arr.shape[-2] >= 16:
            # normal(0, fan_in ** -0.5): std within 3x of the law
            want = arr.shape[-2] ** -0.5
            assert 0.33 * want < arr.std() < 3 * want, (path, arr.std(), want)
            checked["kernel"] += 1
    assert all(v > 0 for v in checked.values()), checked

    out = model.apply(
        {"params": fast}, *_model_init_args(prep)[1:], prep.out_len
    )
    logits = np.asarray(out.logits, np.float64)
    assert np.isfinite(logits).all()
    # realistic magnitudes: not degenerate-zero, not exploded
    assert 1e-3 < np.abs(logits).mean() < 1e3


def _quantized_model(mode):
    from glimpseprune_tpu.quantization import quantized_config

    cfg = quantized_config(tiny_test_config(), mode)
    return cfg, Qwen2_5_VL_GP(cfg)


def test_fastinit_quantized_tree_matches_flax_init():
    """Direct quantized draw (round 4): exact tree/shape/dtype parity with
    the quantized model's own flax init (quantize_structure placeholders),
    for both weight tiers — this is the tree BENCH_REAL_WEIGHTS ships."""
    for mode in ("int8", "int4"):
        cfg, model = _quantized_model(mode)
        rng = np.random.default_rng(0)
        prep, _ = build_batch(cfg, rng, with_labels=False)
        args = _model_init_args(prep)
        flax_params = jax.eval_shape(
            lambda *a: model.init(*a, prep.out_len), *args
        )["params"]
        fast = fast_random_params(model, args, prep.out_len)
        flat_a = jax.tree_util.tree_flatten_with_path(flax_params)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(fast)[0]
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(flat_a, flat_b):
            assert pa == pb, (mode, pa, pb)
            assert va.shape == vb.shape, (mode, pa, va.shape, vb.shape)
            assert va.dtype == vb.dtype, (mode, pa, va.dtype, vb.dtype)


def test_fastinit_quantized_law_and_forward():
    """Dequantized kernels must follow the lecun law (std == fan_in ** -0.5
    within sampling error) and produce finite, realistic logits — the
    whole point of the real-weights serving headline."""
    for mode in ("int8", "int4"):
        cfg, model = _quantized_model(mode)
        rng = np.random.default_rng(0)
        prep, _ = build_batch(cfg, rng, with_labels=False)
        fast = fast_random_params(model, _model_init_args(prep), prep.out_len)

        def check(node, path=""):
            n_q = 0
            if "kernel_q" in node:
                q = np.asarray(node["kernel_q"], np.float64)
                s = np.asarray(node["kernel_scale"], np.float64)
                w = q * s
                want = q.shape[-2] ** -0.5
                assert 0.5 * want < w.std() < 2 * want, (path, w.std(), want)
                assert np.abs(q).max() <= 127
                n_q += 1
            if "kernel_q4" in node:
                packed = np.asarray(node["kernel_q4"], np.int8)
                lo = ((packed.astype(np.int8) << 4) >> 4).astype(np.float64)
                hi = (packed.astype(np.int8) >> 4).astype(np.float64)
                q = np.concatenate([lo, hi], axis=-2)
                s = np.asarray(node["kernel_scale4"], np.float64)
                want = q.shape[-2] ** -0.5
                # group scales are constant in the fast draw: std check on q*s mean-scale
                w = q * s.mean()
                assert 0.4 * want < w.std() < 2.5 * want, (path, w.std(), want)
                assert np.abs(q).max() <= 7
                n_q += 1
            for k, v in node.items():
                if isinstance(v, dict):
                    n_q += check(v, f"{path}/{k}")
            return n_q

        assert check(fast) > 0, mode

        out = model.apply(
            {"params": fast}, *_model_init_args(prep)[1:], prep.out_len
        )
        logits = np.asarray(out.logits, np.float64)
        assert np.isfinite(logits).all(), mode
        assert 1e-3 < np.abs(logits).mean() < 1e3, mode


def test_device_random_params_matches_tree_and_forward():
    """The on-device generator (bench real-weights path on the chip) must
    produce the same tree/shapes/dtypes as the host fast init and a finite
    realistic forward, for fp and both quantized tiers."""
    from glimpseprune_tpu.utils.fastinit import device_random_params

    for mode in (None, "int8", "int4"):
        if mode is None:
            cfg, model = tiny_test_config(), None
            model = Qwen2_5_VL_GP(cfg)
        else:
            cfg, model = _quantized_model(mode)
        rng = np.random.default_rng(0)
        prep, _ = build_batch(cfg, rng, with_labels=False)
        args = _model_init_args(prep)
        host = fast_random_params(model, args, prep.out_len)
        dev = device_random_params(model, args, prep.out_len)
        flat_a = jax.tree_util.tree_flatten_with_path(host)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(dev)[0]
        assert len(flat_a) == len(flat_b), mode
        for (pa, va), (pb, vb) in zip(flat_a, flat_b):
            assert pa == pb, (mode, pa, pb)
            assert va.shape == vb.shape, (mode, pa, va.shape, vb.shape)
            assert va.dtype == vb.dtype, (mode, pa, va.dtype, vb.dtype)

        out = model.apply(
            {"params": dev}, *_model_init_args(prep)[1:], prep.out_len
        )
        logits = np.asarray(out.logits, np.float64)
        assert np.isfinite(logits).all(), mode
        assert 1e-3 < np.abs(logits).mean() < 1e3, mode

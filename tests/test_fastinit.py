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

"""Fast host-side random param init for benches and profiling tools.

The exact flax init (jitted threefry on the host CPU) takes 20+ minutes for
the 7B tree on this machine's single core — unusable as a bench default.
Real-weight benches (BENCH_REAL_WEIGHTS, profile_train_step --quant) only
need REALISTIC weight magnitudes so logits/sampling/eos behave like real
serving (the values are random either way; there are no checkpoints in this
environment). This generates the same tree via numpy's PCG (~30 s for 7B):

- shapes come from jax.eval_shape over model.init — zero compute, exact
  tree structure;
- the init law mirrors the model's _init_weights intent
  (gp_model docstrings; reference model_gp.py:910-931): normal(0, fan_in
  ** -0.5) for kernels/embeddings (xavier/lecun-magnitude), zeros for
  biases, ones for norm scales, normal(0, 0.02) for the glimpse
  embeddings.

NOT for training convergence runs where matching the shipped init exactly
matters — those keep the flax path (convergence_run --quant default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_random_params(model, init_args, out_len, seed: int = 0):
    """Host-generated random params matching model.init's tree/shapes/dtypes.

    `init_args` are the positional args model.init takes (rng first);
    they may be numpy arrays — eval_shape never touches values.
    """
    shapes = jax.eval_shape(
        lambda *a: model.init(*a, out_len), *init_args
    )["params"]
    rng = np.random.default_rng(seed)

    def leaf(path, sd):
        name = str(getattr(path[-1], "key", path[-1]))
        shape = tuple(sd.shape)
        if name == "bias" or not shape:
            arr = np.zeros(shape, np.float32)
        elif name in ("scale", "weight") and len(shape) <= 2:
            # norm scales: RMSNorm params are named "weight" in this tree
            # (models/layers.py:29; stacked [L, H] in the scan decoders),
            # flax LayerNorm uses "scale"
            arr = np.ones(shape, np.float32)
        elif name == "learnable_embeddings":
            arr = rng.standard_normal(shape, dtype=np.float32) * 0.02
        elif len(shape) >= 2:
            fan_in = shape[-2]
            arr = rng.standard_normal(shape, dtype=np.float32) * (
                float(fan_in) ** -0.5
            )
        else:
            arr = np.zeros(shape, np.float32)
        return jnp.asarray(arr, dtype=sd.dtype)

    return jax.tree_util.tree_map_with_path(leaf, shapes)

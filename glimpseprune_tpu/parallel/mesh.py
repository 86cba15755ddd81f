"""Device mesh + sharding rules: the TPU-native parallelism layer.

The reference scales with DDP only (SURVEY.md §2.8); on TPU we run a 2-D
(data, model) mesh over ICI: batch dims shard over "data", attention heads /
MLP intermediate / vocab shard over "model" (megatron-style), and GSPMD
inserts the collectives. 7B bf16 + KV doesn't fit one v5e core, so the
"model" axis is load-bearing for the flagship config, not an optimization.

Sharding is annotation-only: params get NamedShardings from path-based rules,
batch arrays shard their leading batch dim, and every jitted phase in
runner.py works unchanged — XLA propagates from the input shardings.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_axis: Optional[int] = None,
    devices=None,
) -> Mesh:
    """(data, model) mesh. model_axis defaults to the largest power of two
    <= min(n, 4) that divides the device count (kv_heads=4 on Qwen2.5-VL-7B
    bounds useful tensor parallelism without resharding KV)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_axis is None:
        model_axis = 1
        for cand in (4, 2):
            if n % cand == 0:
                model_axis = cand
                break
    assert n % model_axis == 0
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


# (regex on 'a/b/c' param path, PartitionSpec for the *kernel/embedding* leaf)
_RULES: Tuple[Tuple[str, P], ...] = (
    # ---- text decoder
    (r"text/embed_tokens/embedding", P("model", None)),
    # stacked layers: leading axis is depth (scanned), never sharded
    (r"text/layers/self_attn/(q_proj|k_proj|v_proj)/kernel(_q|_q4)?", P(None, None, "model")),
    (r"text/layers/self_attn/(q_proj|k_proj|v_proj)/bias", P(None, "model")),
    (r"text/layers/self_attn/o_proj/kernel(_q|_q4)?", P(None, "model", None)),
    (r"text/layers/mlp/(gate_proj|up_proj)/kernel(_q|_q4)?", P(None, None, "model")),
    (r"text/layers/mlp/(gate_proj|up_proj)/bias", P(None, "model")),
    (r"text/layers/mlp/down_proj/kernel(_q|_q4)?", P(None, "model", None)),
    (r"text/lm_head/kernel(_q|_q4)?", P(None, "model")),
    (r"text/lm_head/kernel_scale4?", P(None, "model")),
    # ---- vision tower (stacked blocks: leading depth axis unsharded)
    (r"visual/blocks/attn/qkv/kernel(_q|_q4)?", P(None, None, "model")),
    (r"visual/blocks/attn/qkv/bias", P(None, "model")),
    (r"visual/blocks/attn/proj/kernel(_q|_q4)?", P(None, "model", None)),
    (r"visual/blocks/mlp/(gate_proj|up_proj)/kernel(_q|_q4)?", P(None, None, "model")),
    (r"visual/blocks/mlp/(gate_proj|up_proj)/bias", P(None, "model")),
    (r"visual/blocks/mlp/down_proj/kernel(_q|_q4)?", P(None, "model", None)),
    # int8 scales [.., 1, out] are tiny: replicate (fall through to P())
    (r"visual/merger_fc1/kernel", P(None, "model")),
    (r"visual/merger_fc1/bias", P("model")),
    (r"visual/merger_fc2/kernel", P("model", None)),
)


def param_sharding_rules(path: str) -> P:
    for pat, spec in _RULES:
        if re.fullmatch(pat, path):
            return spec
    return P()  # replicate (norms, small GP modules, biases)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def shard_params(params: Dict[str, Any], mesh: Mesh):
    """device_put the param tree with rule-based NamedShardings."""

    def place(path, leaf):
        spec = param_sharding_rules(_path_str(path))
        # drop axes that don't divide evenly (tiny test configs)
        fixed = []
        for dim, ax in enumerate(spec):
            if ax is None:
                fixed.append(None)
            elif dim < leaf.ndim and leaf.shape[dim] % mesh.shape[ax] == 0:
                fixed.append(ax)
            else:
                fixed.append(None)
        spec = P(*fixed) if fixed else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch: Dict[str, Any], mesh: Mesh, batch_axes: Optional[Dict[str, int]] = None):
    """Shard per-example arrays over 'data'; replicate packed/global arrays.

    By convention (runner.PreparedInputs): arrays whose leading dim is the
    batch shard over data; position_ids shards dim 1; packed vision arrays
    (patches, vis_pos_ids, segs) are replicated — the packed patch sequence
    mixes every row's image, which keeps the ViT one dense matmul stream.
    """
    repl = NamedSharding(mesh, P())
    data0 = NamedSharding(mesh, P("data"))
    data1 = NamedSharding(mesh, P(None, "data"))
    packed_keys = {"patches", "vis_pos_ids", "full_seg", "vis_valid"}

    out = {}
    dsize = mesh.shape["data"]
    for k, v in batch.items():
        if v is None:
            out[k] = None
        elif k == "position_ids":
            out[k] = jax.device_put(v, data1 if v.shape[1] % dsize == 0 else repl)
        elif k in packed_keys or v.ndim == 0:
            out[k] = jax.device_put(v, repl)
        elif v.shape[0] % dsize == 0:
            out[k] = jax.device_put(v, data0)
        else:
            out[k] = jax.device_put(v, repl)
    return out


# ------------------------------------------------------------------ #
# sequence (context) parallelism — see ops/attention.py for the design


import contextlib


def enable_sequence_parallel(mesh: Optional[Mesh], axis_name: str = "data"):
    """Enable (mesh) / disable (None) sequence-parallel prefill attention.

    Annotation-free like shard_params: the attention choke points
    (window / full / causal) become shard_map programs over `axis_name`
    and GSPMD partitions everything between them from the boundary
    shardings — runner/trainer code is unchanged. The sequence length must
    divide by the axis size (and window shards by the window size) or the
    call falls back to the unsharded path, per call site."""
    from glimpseprune_tpu.ops.attention import set_sequence_parallel

    set_sequence_parallel(mesh, axis_name)


@contextlib.contextmanager
def sequence_parallel(mesh: Mesh, axis_name: str = "data"):
    """Context-manager form of enable_sequence_parallel; restores the
    previously-active SP context (not necessarily "off") on exit."""
    from glimpseprune_tpu.ops.attention import get_sequence_parallel

    prev = get_sequence_parallel()
    enable_sequence_parallel(mesh, axis_name)
    try:
        yield
    finally:
        if prev is None:
            enable_sequence_parallel(None)
        else:
            enable_sequence_parallel(prev[0], prev[1])

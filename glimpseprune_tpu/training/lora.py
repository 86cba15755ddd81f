"""Hand-rolled LoRA adapters over the frozen param tree.

The reference wraps the LLM's Linears with peft LoRA for the GlimpsePrune+
stage (model_gp.py:883-891 `peft_target_modules` = every LLM Linear except
embeddings; train_qwen_gp.py LoRA knobs). Here adapters are a separate
pytree of (A, B) factors keyed by the target kernel paths; `apply_lora`
materializes W + scale * A @ B on the fly, so the base tree stays frozen and
`disable` (the reference's adapter-disabled reference-policy forwards,
train_qwen_gp.py:1167-1181) is just "don't apply".
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = r"text/layers/(self_attn/(q_proj|k_proj|v_proj|o_proj)|mlp/(gate_proj|up_proj|down_proj))/kernel(_q)?"


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def make_lora_params(
    frozen: Dict[str, Any],
    rank: int = 16,
    targets: str = DEFAULT_TARGETS,
    seed: int = 0,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """LoRA tree mirroring matching kernel leaves: {path: {"a": [in, r],
    "b": [r, out]}}; A ~ N(0, 1/r), B = 0 (standard init)."""
    pattern = re.compile(targets)
    rng = np.random.default_rng(seed)
    flat = {}

    def visit(path, leaf):
        p = _path_str(path)
        if pattern.fullmatch(p) and leaf.ndim in (2, 3):
            p = p.removesuffix("_q")  # int8 base (QLoRA): adapters stay fp
            if leaf.ndim == 2:
                fan_in, fan_out = leaf.shape
                a_shape, b_shape = (fan_in, rank), (rank, fan_out)
            else:  # stacked [L, in, out]: independent adapters per layer
                L, fan_in, fan_out = leaf.shape
                a_shape, b_shape = (L, fan_in, rank), (L, rank, fan_out)
            flat[p] = {
                "a": jnp.asarray(
                    rng.normal(0, 1.0 / max(rank, 1), a_shape), dtype=dtype
                ),
                "b": jnp.zeros(b_shape, dtype=dtype),
            }
        return leaf

    jax.tree_util.tree_map_with_path(visit, frozen)
    return flat


def apply_lora(
    frozen: Dict[str, Any],
    lora: Optional[Dict[str, Any]],
    scale: float = 1.0,
) -> Dict[str, Any]:
    """Materialize adapted params: kernel + scale * A @ B at adapted paths.

    fp kernels only — for an int8 base use insert_lora (QLoRA-style)."""
    if not lora:
        return frozen

    def visit(path, leaf):
        p = _path_str(path)
        if p in lora:
            ab = lora[p]
            a = ab["a"].astype(jnp.float32)
            b = ab["b"].astype(jnp.float32)
            if a.ndim == 3:
                delta = jnp.einsum("lir,lro->lio", a, b) * scale
            else:
                delta = (a @ b) * scale
            return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, frozen)


def insert_lora(
    frozen: Dict[str, Any],
    lora: Optional[Dict[str, Any]],
    scale: float = 1.0,
) -> Dict[str, Any]:
    """Attach adapters as `lora_a`/`lora_b` leaves next to their kernels.

    Unlike `apply_lora` (which materializes a full merged kernel stack — an
    extra 6.2 GB at 3B, the difference between the GRPO step fitting one
    chip or not), the adapted matmul happens per layer inside the decoder
    scan: `_dense` computes y += (x @ a) @ b whenever the leaves are present.
    Requires a model built with cfg.text.lora_rank > 0 so flax declares the
    structure. `scale` is folded into b."""
    if not lora:
        return frozen

    def walk(node, prefix):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            path = f"{prefix}/{name}" if prefix else name
            out[name] = walk(child, path)
            if name in ("kernel", "kernel_q"):
                # int8 base (QLoRA): lora keys are the fp kernel paths
                kpath = path.removesuffix("_q")
                if kpath in lora:
                    out["lora_a"] = lora[kpath]["a"]
                    out["lora_b"] = lora[kpath]["b"] * scale
        return out

    return walk(frozen, "")


def lora_param_count(lora: Dict[str, Any]) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora))

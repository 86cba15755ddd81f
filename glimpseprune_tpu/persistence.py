"""New-module persistence: the separate-artifact checkpoint contract.

The reference trains only the tiny GP modules and ships them as
`new_modules_gp.pt` + `config.json`, with the base model always pulled from
the hub (model_gp.py:934-991, SURVEY.md §5 checkpoint/resume). We keep the
same contract: `save_new_modules` writes the new-module subtree (msgpack) +
config.json; `load_new_modules` re-inits from the saved config and grafts the
weights onto a full param tree; `import_torch_new_modules` converts the
reference's released torch checkpoint so published GP weights run on TPU
without retraining (SURVEY.md §7 step 3).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from glimpseprune_tpu.config import ModelConfig
from glimpseprune_tpu.training.train_step import NEW_MODULE_KEYS, split_params

NEW_MODULES_FILE = "new_modules_gp.msgpack"
LORA_FILE = "lora_adapter.msgpack"


def save_lora(lora, directory: str):
    """GlimpsePrune+ adapter checkpoint (reference _save adds the PEFT
    adapter when RL, train_qwen_gp.py:1556-1598)."""
    from flax import serialization

    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, LORA_FILE), "wb") as f:
        f.write(serialization.to_bytes(lora))


def load_lora(template, directory: str):
    from flax import serialization

    with open(os.path.join(directory, LORA_FILE), "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_new_modules(params: Dict[str, Any], cfg: ModelConfig, directory: str):
    from flax import serialization

    os.makedirs(directory, exist_ok=True)
    new_modules, _ = split_params(params)
    new_modules = {k: np.asarray(v) if not isinstance(v, dict) else v
                   for k, v in new_modules.items()}
    with open(os.path.join(directory, NEW_MODULES_FILE), "wb") as f:
        f.write(serialization.to_bytes(new_modules))
    cfg.save(directory)


def load_new_modules(
    params: Dict[str, Any], directory: str
) -> Tuple[Dict[str, Any], ModelConfig]:
    """Returns (params with the new-module subtree replaced, saved config)."""
    from flax import serialization

    cfg = ModelConfig.load(directory)
    current, frozen = split_params(params)
    with open(os.path.join(directory, NEW_MODULES_FILE), "rb") as f:
        loaded = serialization.from_bytes(current, f.read())
    return {**frozen, **loaded}, cfg


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        try:
            return t.numpy()
        except TypeError:
            return t.float().numpy()
    return np.asarray(t)


def import_torch_new_modules(
    state: Mapping[str, Any], cfg: ModelConfig
) -> Dict[str, Any]:
    """Reference `new_modules_gp.pt` contents -> our new-module pytree.

    `state` is the already-torch.load()ed dict:
      {"attn_fuser": {...}, "learnable_embeddings": tensor,
       "le_proj": {...}, "le_norm": {...}}
    (reference save format model_gp.py:941-952).
    """
    out: Dict[str, Any] = {}

    fuser_sd = state.get("attn_fuser", {})
    fuser: Dict[str, Any] = {}

    def dense(prefix, dest, bias=True):
        if f"{prefix}.weight" in fuser_sd:
            d = {"kernel": _np(fuser_sd[f"{prefix}.weight"]).T}
            if bias and f"{prefix}.bias" in fuser_sd:
                d["bias"] = _np(fuser_sd[f"{prefix}.bias"])
            fuser[dest] = d

    dense("attn_in_proj", "attn_in_proj")
    n_layers = len(cfg.gp.selected_visual_layers)
    for i in range(n_layers):
        dense(f"cond_in_projs.{i}", f"cond_in_projs_{i}")
        layer: Dict[str, Any] = {}
        base = f"layers.{i}"
        if f"{base}.norm1.weight" in fuser_sd:
            layer["norm1"] = {"weight": _np(fuser_sd[f"{base}.norm1.weight"])}
            layer["norm2"] = {"weight": _np(fuser_sd[f"{base}.norm2.weight"])}
            layer["attn"] = {
                name: {"kernel": _np(fuser_sd[f"{base}.attn.{name}.weight"]).T}
                for name in ("q_proj", "k_proj", "v_proj", "o_proj")
            }
            layer["mlp"] = {
                name: {
                    "kernel": _np(fuser_sd[f"{base}.mlp.{name}.weight"]).T,
                    "bias": _np(fuser_sd[f"{base}.mlp.{name}.bias"]),
                }
                for name in ("gate_proj", "up_proj", "down_proj")
            }
            fuser[f"layers_{i}"] = layer
        dense(f"attn_out_projs.{i}", f"attn_out_projs_{i}")
    out["attn_fuser"] = fuser

    if "learnable_embeddings" in state:
        out["learnable_embeddings"] = _np(state["learnable_embeddings"])
        le_proj = state.get("le_proj", {})
        out["le_proj"] = {
            "kernel": _np(le_proj["weight"]).T,
            "bias": _np(le_proj["bias"]),
        }
        le_norm = state.get("le_norm", {})
        if cfg.gp.le_norm_type == "rmsnorm":
            out["le_norm"] = {"weight": _np(le_norm["weight"])}
        else:
            out["le_norm"] = {
                "scale": _np(le_norm["weight"]),
                "bias": _np(le_norm["bias"]),
            }
    return out


def load_torch_new_modules_file(path: str, cfg: ModelConfig) -> Dict[str, Any]:
    import torch

    state = torch.load(path, weights_only=True, map_location="cpu")
    return import_torch_new_modules(state, cfg)


# ------------------------------------------------------------------ #
# full-model checkpoints (orbax): avoids re-converting the HF torch
# checkpoint on every process start for large models


def save_full_params(params: Dict[str, Any], directory: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(directory, "full_params")), params)
    ckptr.wait_until_finished()


def load_full_params(directory: str, template: Optional[Dict[str, Any]] = None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(os.path.join(directory, "full_params"))
    if template is not None:
        return ckptr.restore(path, target=template)
    return ckptr.restore(path)

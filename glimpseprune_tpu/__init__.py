"""GlimpsePrune-TPU: a TPU-native (JAX/Flax/Pallas) visual-token-pruning framework.

A from-scratch rebuild of the capabilities of HVision-NKU/GlimpsePrune
(dynamic visual-token pruning for LVLMs via a learnable glimpse token and a
lightweight visual-importance predictor), re-designed for XLA/TPU:

- static-shape top-k + masked gather instead of data-dependent token dropping
  (reference: transformers_gp/models/qwen2_5_vl/model_gp.py:1552 `_reduce_tokens`)
- host-side geometry (dynamic-resolution tiling, window indices, mRoPE ids)
  feeding statically-shaped jitted compute
- compacted KV-cache decode over surviving tokens only
"""

__version__ = "0.1.0"

from glimpseprune_tpu.registry import Registry

__all__ = ["Registry", "__version__"]

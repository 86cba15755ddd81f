"""Shared Flax building blocks: RMSNorm (HF-exact), gated MLP, dense helpers."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


ACT2FN = {
    "silu": nn.silu,
    "gelu": nn.gelu,
    "relu": nn.relu,
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
    "quick_gelu": lambda x: x * nn.sigmoid(1.702 * x),
}


class RMSNorm(nn.Module):
    """Qwen2-style RMSNorm: fp32 variance, scale applied in fp32, cast back."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (scale * xf).astype(orig_dtype)


class GatedMLP(nn.Module):
    """silu(gate(x)) * up(x) -> down."""

    hidden_size: int
    intermediate_size: int
    hidden_act: str = "silu"
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = ACT2FN[self.hidden_act]
        kw = dict(use_bias=self.use_bias, dtype=self.dtype, param_dtype=self.param_dtype)
        gate = nn.Dense(self.intermediate_size, name="gate_proj", **kw)(x)
        up = nn.Dense(self.intermediate_size, name="up_proj", **kw)(x)
        return nn.Dense(self.hidden_size, name="down_proj", **kw)(act(gate) * up)

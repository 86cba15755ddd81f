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

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = ACT2FN[self.hidden_act]
        gate = nn.Dense(self.intermediate_size, use_bias=self.use_bias, dtype=self.dtype, name="gate_proj")(x)
        up = nn.Dense(self.intermediate_size, use_bias=self.use_bias, dtype=self.dtype, name="up_proj")(x)
        return nn.Dense(self.hidden_size, use_bias=self.use_bias, dtype=self.dtype, name="down_proj")(act(gate) * up)

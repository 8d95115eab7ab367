"""Normalization ops.

TPU-native counterparts of the reference's RMSNorm/LayerNorm modules
(/root/reference/minivllm/models/layers/layernorm.py). Plain jnp — XLA
fuses these into neighboring ops; reductions run in fp32 for stability
regardless of the activation dtype.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["rms_norm", "layer_norm"]


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm: x * rsqrt(mean(x^2) + eps) * weight, computed in fp32."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    out = x32 * lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm in fp32 (used by OPT/GPT2)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * (var + eps) ** -0.5
    out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)

"""Activation ops (reference: models/layers/activation.py)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["silu_and_mul", "gelu_new", "relu"]


def silu_and_mul(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU combine: silu(gate) * up."""
    g32 = gate.astype(jnp.float32)
    return (g32 * jnp.reciprocal(1.0 + jnp.exp(-g32))).astype(gate.dtype) * up


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """GPT2's tanh-approximated GELU."""
    x32 = x.astype(jnp.float32)
    c = jnp.sqrt(2.0 / jnp.pi).astype(jnp.float32)
    out = 0.5 * x32 * (1.0 + jnp.tanh(c * (x32 + 0.044715 * x32**3)))
    return out.astype(x.dtype)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)

"""Rotary position embeddings.

Counterpart of the reference RoPE module
(/root/reference/minivllm/models/layers/rotary_embedding.py:31-242). The
reference precomputes cos/sin caches on the host; here angles are computed
inside the jitted step from the position array — a handful of fused VPU
ops, no HBM table, and "linear"/"dynamic" NTK scaling fall out of the same
arithmetic.

Convention: GPT-NeoX half-rotation (rotate_half), matching HF
Qwen2/Qwen3/Llama.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["compute_cos_sin", "apply_rope"]


def compute_cos_sin(
    positions: jnp.ndarray,
    head_dim: int,
    theta: float,
    scaling_type: str | None = None,
    scaling_factor: float = 1.0,
    max_position_embeddings: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin of rope angles for `positions` (any shape), fp32.

    Returns arrays of shape positions.shape + (head_dim // 2,).

    scaling_type: None | "linear" | "dynamic" (NTK), mirroring the
    reference's supported rope_scaling types (rotary_embedding.py:132-149).
    For "dynamic", the NTK-adjusted theta is computed from the static
    max_model_len bound rather than per-batch length (positions are padded
    to buckets under jit; using the static bound keeps the program shape-
    and data-independent).
    """
    half = head_dim // 2
    pos = positions.astype(jnp.float32)
    if scaling_type == "linear" and scaling_factor != 1.0:
        pos = pos / scaling_factor
    base = theta
    if scaling_type == "dynamic" and scaling_factor != 1.0:
        # NTK-aware base adjustment, evaluated at the extended window
        # (seq_len = factor * max_position_embeddings):
        # base' = theta * (factor * seq_len / max_pos - (factor - 1))^(d/(d-2))
        mult = scaling_factor * scaling_factor - (scaling_factor - 1.0)
        base = theta * mult ** (head_dim / (head_dim - 2))
    inv_freq = base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = pos[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply half-rotation RoPE.

    x: (..., num_heads, head_dim); cos/sin: (..., head_dim // 2) broadcast
    over the head axis.
    """
    dtype = x.dtype
    half = x.shape[-1] // 2
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :half], x32[..., half:]
    c = cos[..., None, :]
    s = sin[..., None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(dtype)

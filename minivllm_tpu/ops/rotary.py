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
    scaling_extra: dict | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin of rope angles for `positions` (any shape), fp32.

    Returns arrays of shape positions.shape + (head_dim // 2,).

    scaling_type: None | "linear" | "dynamic" (NTK) — mirroring the
    reference's supported rope_scaling types (rotary_embedding.py:132-149) —
    plus "llama3" (Llama 3.1+ frequency-banded interpolation) and "yarn"
    (long-context Qwen3 et al.), which the reference does not support.
    Those two read their extra parameters (low/high_freq_factor,
    original_max_position_embeddings, beta_fast/slow) from `scaling_extra`,
    the raw HF rope_scaling dict; the math matches
    transformers.modeling_rope_utils ROPE_INIT_FUNCTIONS (verified in
    tests/test_rotary.py). For "dynamic", the NTK-adjusted theta is
    computed from the static max_model_len bound rather than per-batch
    length (positions are padded to buckets under jit; using the static
    bound keeps the program shape- and data-independent).
    """
    import numpy as np

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
    # Frequency table in numpy: positions-independent, folded into the
    # compiled program as a constant.
    inv_freq = base ** (-np.arange(0, half, dtype=np.float64) / half)
    attn_scale = 1.0
    extra = scaling_extra or {}
    if scaling_type == "llama3":
        factor = float(extra.get("factor", scaling_factor))
        lo_fac = float(extra.get("low_freq_factor", 1.0))
        hi_fac = float(extra.get("high_freq_factor", 4.0))
        orig = float(extra.get("original_max_position_embeddings", 8192))
        wavelen = 2.0 * np.pi / inv_freq
        # Low-frequency (long-wavelength) bands interpolate by `factor`,
        # high-frequency bands stay extrapolated, the middle blends.
        smooth = (orig / wavelen - lo_fac) / (hi_fac - lo_fac)
        smooth = np.clip(smooth, 0.0, 1.0)
        blended = (1 - smooth) * (inv_freq / factor) + smooth * inv_freq
        inv_freq = np.where(
            wavelen > orig / lo_fac,
            inv_freq / factor,
            np.where(wavelen < orig / hi_fac, inv_freq, blended),
        )
    elif scaling_type == "yarn":
        factor = float(extra.get("factor", scaling_factor))
        beta_fast = float(extra.get("beta_fast", 32.0))
        beta_slow = float(extra.get("beta_slow", 1.0))
        orig = float(
            extra.get("original_max_position_embeddings")
            or max_position_embeddings
        )
        def band(beta):
            return (half * np.log(orig / (beta * 2 * np.pi))) / np.log(base)
        lo = max(np.floor(band(beta_fast)), 0.0)
        # transformers clamps to head_dim - 1 (not half - 1): a band edge
        # past half just means the ramp never saturates within the table.
        hi = min(np.ceil(band(beta_slow)), head_dim - 1)
        ramp = np.clip(
            (np.arange(half, dtype=np.float64) - lo) / max(hi - lo, 1e-3),
            0.0,
            1.0,
        )
        extrap_w = 1.0 - ramp
        inv_freq = (inv_freq / factor) * (1 - extrap_w) + inv_freq * extrap_w
        attn_scale = float(
            extra.get("attention_factor")
            or (0.1 * np.log(factor) + 1.0)
        )
    inv_freq = jnp.asarray(inv_freq, jnp.float32)
    angles = pos[..., None] * inv_freq
    return jnp.cos(angles) * attn_scale, jnp.sin(angles) * attn_scale


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

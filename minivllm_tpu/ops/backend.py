"""Attention backend selection.

Replaces the reference's runtime kernel dispatch
(/root/reference/minivllm/models/layers/attention.py:157-173: NPU-FA /
flash-attn / SDPA fallback) with a static choice made at engine build time:
"xla" (pure-jnp oracle, runs anywhere, correctness reference) or "pallas"
(Mosaic TPU kernels). The choice is baked into the compiled step function —
there is no per-call branching.
"""

from __future__ import annotations

import jax.numpy as jnp

from minivllm_tpu.ops import attention as A

__all__ = ["XlaAttentionBackend", "PallasAttentionBackend", "make_backend"]


class XlaAttentionBackend:
    """Gather + masked-softmax oracle (reference analog:
    page_attention.py gather fallback)."""

    name = "xla"

    def __init__(self, block_size: int) -> None:
        self.block_size = block_size

    def prefill(self, q, k_cache, v_cache, meta: A.PrefillBatch, scale,
                base=0, window=None, softcap=None):
        return A.prefill_attention_xla(
            q, k_cache, v_cache, meta, scale, base, window, softcap
        )

    def decode(self, q, k_cache, v_cache, meta: A.DecodeBatch, scale,
               base=0, window=None, softcap=None):
        return A.decode_attention_xla(
            q, k_cache, v_cache, meta, scale, self.block_size, base,
            window, softcap,
        )


class PallasAttentionBackend:
    """Mosaic TPU flash kernels (paged decode / varlen prefill), both with
    in-kernel sliding-window and score-softcap support (Gemma2, Mistral).

    Falls back to the XLA oracle per-phase when a kernel does not support
    the configuration; selection happens at trace time (static).
    """

    name = "pallas"

    def __init__(self, block_size: int) -> None:
        self.block_size = block_size
        self._oracle = XlaAttentionBackend(block_size)

    def prefill(self, q, k_cache, v_cache, meta: A.PrefillBatch, scale,
                base=0, window=None, softcap=None):
        from minivllm_tpu.ops.pallas import prefill_attention as kernel

        if kernel.is_supported(q, k_cache, self.block_size):
            return kernel.prefill_attention(
                q, k_cache, v_cache, meta, scale, self.block_size, base,
                window=window,
                softcap=float(softcap) if softcap is not None else None,
            )
        return self._oracle.prefill(
            q, k_cache, v_cache, meta, scale, base, window, softcap
        )

    def decode(self, q, k_cache, v_cache, meta: A.DecodeBatch, scale,
               base=0, window=None, softcap=None):
        from minivllm_tpu.ops.pallas import decode_attention as kernel

        if kernel.is_supported(q, k_cache, self.block_size):
            # window/softcap are in-kernel (sliding-window blocks are
            # never fetched); softcap must be a static float.
            return kernel.decode_attention(
                q, k_cache, v_cache, meta, scale, self.block_size, base,
                window=window,
                softcap=float(softcap) if softcap is not None else None,
            )
        return self._oracle.decode(
            q, k_cache, v_cache, meta, scale, base, window, softcap
        )


def make_backend(name: str, block_size: int):
    if name == "xla":
        return XlaAttentionBackend(block_size)
    if name == "pallas":
        return PallasAttentionBackend(block_size)
    raise ValueError(f"unknown attention backend {name!r}")

"""Pallas varlen causal prefill flash attention (placeholder).

See decode_attention.py — same staging strategy.
"""

from __future__ import annotations


def is_supported(q, k_cache) -> bool:
    return False


def prefill_attention(q, k_cache, v_cache, meta, scale, block_size):
    raise NotImplementedError

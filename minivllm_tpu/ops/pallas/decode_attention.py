"""Pallas paged flash-decode attention (placeholder until the kernel lands).

The kernel will stream each sequence's KV blocks HBM->VMEM by block-table
lookup with double buffering and fuse the online-softmax flash loop
(SURVEY.md §7.2 step 4). Until then `is_supported` returns False and the
backend uses the XLA oracle.
"""

from __future__ import annotations


def is_supported(q, k_cache) -> bool:
    return False


def decode_attention(q, k_cache, v_cache, meta, scale, block_size):
    raise NotImplementedError

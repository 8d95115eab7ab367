"""Paged attention: batch metadata, KV-cache scatter, and XLA reference
implementations.

This replaces the reference's attention dispatch stack
(/root/reference/minivllm/models/layers/attention.py:102-597,
attention_backend.py, page_attention.py) with a functional design:

- Batch metadata is an explicit pytree argument threaded through the
  jitted step (the reference used a thread-local Context side-channel,
  utils/context.py — side-channels do not survive JAX tracing).
- The KV cache is a flat slot array per layer: (num_slots, kv_heads,
  head_dim) with num_slots = (num_blocks + 1) * block_size. Slot
  `block_id * block_size + offset` holds that token's K/V. The final
  block is a trash block that padding lanes scatter into/gather from, so
  padded programs never branch (the reference's -1 sentinels map here,
  SURVEY.md §7.3).
- `*_attention_xla` are pure-jnp oracles: exact, shape-static, and the
  correctness reference for the Pallas kernels (the same role the
  reference's PageAttention gather+SDPA fallback plays,
  page_attention.py:25-133).

All softmax math runs in fp32; GQA is handled by grouping query heads
over KV heads without materializing repeated K/V.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = [
    "PrefillBatch",
    "DecodeBatch",
    "QuantizedCache",
    "make_quantized_cache",
    "scale_lanes",
    "cache_write",
    "cache_gather",
    "store_kv",
    "prefill_attention_xla",
    "decode_attention_xla",
]

NEG_INF = float(jnp.finfo(jnp.float32).min)


class PrefillBatch(NamedTuple):
    """Packed prefill batch (all arrays padded to compile buckets).

    T = padded new-token count, C = padded context-token count,
    S = padded sequence count, W = padded block-table width.
    """

    input_ids: jnp.ndarray        # (T,) int32; padding -> 0
    positions: jnp.ndarray        # (T,) int32 absolute position; padding -> 0
    q_seg: jnp.ndarray            # (T,) int32 sequence index; padding -> -1
    slot_mapping: jnp.ndarray     # (T,) int32 flat cache slot; padding -> trash
    ctx_slot_mapping: jnp.ndarray  # (C,) int32 slots of packed full context
    k_seg: jnp.ndarray            # (C,) int32 sequence index; padding -> -2
    k_pos: jnp.ndarray            # (C,) int32 absolute position; padding -> 0
    last_token_idx: jnp.ndarray   # (S,) int32 index into T of each seq's last token
    block_tables: jnp.ndarray     # (S, W) int32; padding -> trash block
    ctx_lens: jnp.ndarray         # (S,) int32 total context length; padding -> 0
    # Tile-aligned packing info for the Pallas prefill kernel (each seq's
    # q rows start at a Q_TILE-aligned offset; the XLA oracle ignores these).
    q_start: jnp.ndarray          # (S,) int32 row offset of each seq's q tokens
    q_lens: jnp.ndarray           # (S,) int32 number of new q tokens; padding -> 0


class DecodeBatch(NamedTuple):
    """Decode batch: one new token per sequence (padded to S bucket).

    The optional group fields drive shared-prefix (two-phase) decode
    attention: sequences sharing a block-aligned prefix (system prompts
    resident in the prefix cache) stream those KV blocks once per GROUP
    with group-batched matmuls, then finish their tails individually
    (cf. the PAT two-phase structure, arXiv 2511.22333). All None when
    grouping is off; only the Pallas backend consumes them — the XLA
    oracle computes full per-sequence attention regardless."""

    input_ids: jnp.ndarray        # (S,) int32; padding -> 0
    positions: jnp.ndarray        # (S,) int32 (= ctx_len - 1); padding -> 0
    slot_mapping: jnp.ndarray     # (S,) int32; padding -> trash slot
    block_tables: jnp.ndarray     # (S, W) int32; padding -> trash block
    ctx_lens: jnp.ndarray         # (S,) int32; padding -> 0
    seq_start: jnp.ndarray | None = None    # (S,) tail start (0 ungrouped)
    group_member: jnp.ndarray | None = None  # (G, Gmax) seq ids; pad -> -1
    group_tables: jnp.ndarray | None = None  # (G, W) shared-prefix blocks
    group_ctx: jnp.ndarray | None = None     # (G,) shared prefix length


class QuantizedCache(NamedTuple):
    """INT8 KV cache: per-slot-per-head symmetric scales (north-star
    feature — halves KV HBM traffic and doubles cache capacity).

    The scale layout is block-slabbed, K+V-PACKED, and lane-padded for
    the Pallas kernels: one (kv_heads, lanes>=128) f32 slab per KV
    block where, for head h, lane l in [0, block_size) is the K scale
    of slot block*block_size + l and lane block_size + l is the V scale
    of the same slot. `store_kv` writes the IDENTICAL packed slab into
    both caches of a (k, v) pair, so the flash kernels fetch ONE scale
    DMA per sub-block (not one per cache) — the fix for the issue-bound
    int8 decode path (docs/roadmap.md: 16 -> 12 DMAs per work item) —
    while each cache also stays self-contained for the XLA oracle's
    role-offset gathers. At the default block_size 64 the packing fits
    the existing 128-lane padding, so it costs no extra HBM. block_size
    is recoverable as data.shape[0] // scale.shape[0]."""

    data: jnp.ndarray   # (num_slots, kv_heads, head_dim) int8
    scale: jnp.ndarray  # (num_blocks_total, kv_heads, scale_lanes) float32


def scale_lanes(block_size: int) -> int:
    """Lane-padded K+V-packed scale-slab width for a KV block."""
    return ((2 * block_size + 127) // 128) * 128


def make_quantized_cache(num_slots: int, kvh: int, hd: int, block_size: int):
    """Zero-initialized INT8 cache with the block-slabbed scale layout."""
    return QuantizedCache(
        data=jnp.zeros((num_slots, kvh, hd), jnp.int8),
        scale=jnp.zeros(
            (num_slots // block_size, kvh, scale_lanes(block_size)),
            jnp.float32,
        ),
    )


def _cache_block_size(cache: QuantizedCache) -> int:
    return cache.data.shape[0] // cache.scale.shape[0]


def _quantize_rows(values: jnp.ndarray):
    """(T, kvh, hd) float -> (int8 rows, per-(row, head) f32 scales)."""
    v32 = values.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(v32), axis=-1)              # (T, kvh)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(v32 / scale[..., None]), -127, 127).astype(
        jnp.int8
    )
    return q, scale


def cache_write(cache, slots: jnp.ndarray, values: jnp.ndarray,
                role: int = 0):
    """Scatter new K/V rows (T, kvh, hd) into the flat slot cache at
    `slots` (T,). Under buffer donation XLA lowers this to an in-place
    scatter (the reference needed a Triton kernel for the same operation,
    attention_backend.py:52-78). Quantized caches quantize per row/head
    and write the scales at the cache's `role` lanes (0 = K half, 1 = V
    half of the packed slab); a (k, v) PAIR must be written via
    `store_kv`, which keeps both caches' packed slabs complete."""
    if isinstance(cache, QuantizedCache):
        q, scale = _quantize_rows(values)
        bs = _cache_block_size(cache)
        kvh = cache.data.shape[1]
        blocks = (slots // bs)[:, None]                       # (T, 1)
        lanes = (role * bs + slots % bs)[:, None]
        heads = jnp.arange(kvh, dtype=slots.dtype)[None, :]   # (1, kvh)
        return QuantizedCache(
            data=cache.data.at[slots].set(q),
            scale=cache.scale.at[blocks, heads, lanes].set(scale),
        )
    return cache.at[slots].set(values.astype(cache.dtype))


def cache_gather(cache, idx, role: int = 0):
    """Gather rows by flat slot index, dequantizing if needed (`role`
    selects the K (0) or V (1) half of the packed scale slab). Returns
    float arrays shaped idx.shape + (kvh, hd)."""
    if isinstance(cache, QuantizedCache):
        bs = _cache_block_size(cache)
        s = cache.scale[idx // bs, :, role * bs + idx % bs]
        return cache.data[idx].astype(jnp.float32) * s[..., None]
    return cache[idx]


def cache_kv_heads(cache) -> int:
    return (cache.data if isinstance(cache, QuantizedCache) else cache).shape[1]


def cache_len(cache) -> int:
    """Total flat slot count of a plain or quantized cache."""
    return (cache.data if isinstance(cache, QuantizedCache) else cache).shape[0]


def store_kv(
    k_cache,
    v_cache,
    k: jnp.ndarray,
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,
):
    """Scatter new K/V rows into both flat caches (plain or quantized).

    This is the canonical write path for quantized PAIRS: both caches
    receive the IDENTICAL packed scale slab (K scales at lanes
    [0, block_size), V at [block_size, 2*block_size)), so the flash
    kernels need only ONE scale DMA per sub-block while each cache also
    remains self-contained for role-offset oracle gathers."""
    if isinstance(k_cache, QuantizedCache):
        qk, sk = _quantize_rows(k)
        qv, sv = _quantize_rows(v)
        bs = _cache_block_size(k_cache)
        kvh = k_cache.data.shape[1]
        blocks = (slot_mapping // bs)[:, None]                # (T, 1)
        lane_k = (slot_mapping % bs)[:, None]
        lane_v = lane_k + bs
        heads = jnp.arange(kvh, dtype=slot_mapping.dtype)[None, :]

        def packed(scale_arr):
            scale_arr = scale_arr.at[blocks, heads, lane_k].set(sk)
            return scale_arr.at[blocks, heads, lane_v].set(sv)

        return (
            QuantizedCache(
                data=k_cache.data.at[slot_mapping].set(qk),
                scale=packed(k_cache.scale),
            ),
            QuantizedCache(
                data=v_cache.data.at[slot_mapping].set(qv),
                scale=packed(v_cache.scale),
            ),
        )
    return (
        cache_write(k_cache, slot_mapping, k),
        cache_write(v_cache, slot_mapping, v),
    )


def _grouped_scores(q: jnp.ndarray, k: jnp.ndarray, scale: float) -> jnp.ndarray:
    """q: (T, h, d), k: (C, kvh, d) -> scores (kvh, g, T, C) in fp32,
    where h = kvh * g (GQA without repeating K)."""
    T, h, d = q.shape
    kvh = k.shape[1]
    g = h // kvh
    qg = q.reshape(T, kvh, g, d).astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    return jnp.einsum("tkgd,ckd->kgtc", qg, k32) * scale


def _grouped_out(p: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """p: (kvh, g, T, C), v: (C, kvh, d) -> out (T, h, d) fp32."""
    kvh, g, T, C = p.shape
    out = jnp.einsum("kgtc,ckd->tkgd", p, v.astype(jnp.float32))
    return out.reshape(T, kvh * g, -1)


def _masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jax_stop_nan(m))
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(denom, 1e-30)


def jax_stop_nan(m: jnp.ndarray) -> jnp.ndarray:
    """Rows that are fully masked have max = -inf; clamp so exp() stays 0
    instead of NaN."""
    return jnp.maximum(m, NEG_INF)


def _softcap(scores: jnp.ndarray, cap) -> jnp.ndarray:
    """Attention logit soft-capping (Gemma2): cap * tanh(scores / cap)."""
    return cap * jnp.tanh(scores / cap)


def prefill_attention_xla(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    meta: PrefillBatch,
    scale: float,
    base=0,
    window=None,
    softcap=None,
) -> jnp.ndarray:
    """Packed varlen causal prefill attention over the paged cache.

    q: (T, h, d) — roped queries for the packed new tokens. Keys/values are
    gathered from the cache at the packed context slots (which include any
    prefix-cache-hit tokens plus this step's freshly scattered tokens).
    Valid (query, key) pairs: same sequence and k_pos <= q_pos; with
    `window` (sliding-window attention, may be a traced per-layer scalar)
    additionally k_pos > q_pos - window. `softcap` applies Gemma2-style
    tanh capping to the scores.

    `base` offsets slots into a flat multi-layer cache (layer * stride);
    the caches are the whole (L*num_slots, kvh, d) arrays so no per-layer
    slice is ever materialized.
    """
    k = cache_gather(k_cache, base + meta.ctx_slot_mapping)   # (C, kvh, d)
    v = cache_gather(v_cache, base + meta.ctx_slot_mapping, role=1)
    scores = _grouped_scores(q, k, scale)        # (kvh, g, T, C)
    if softcap is not None:
        scores = _softcap(scores, softcap)
    same_seq = meta.q_seg[:, None] == meta.k_seg[None, :]
    causal = meta.k_pos[None, :] <= meta.positions[:, None]
    mask = same_seq & causal
    if window is not None:
        mask &= meta.k_pos[None, :] > meta.positions[:, None] - window
    p = _masked_softmax(scores, mask[None, None, :, :])
    out = _grouped_out(p, v)                     # (T, h, d) fp32
    return out.astype(q.dtype)


def decode_attention_xla(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    meta: DecodeBatch,
    scale: float,
    block_size: int,
    base=0,
    window=None,
    softcap=None,
) -> jnp.ndarray:
    """Paged decode attention: one query per sequence against its block
    table (reference oracle: page_attention.py:25-133).

    q: (S, h, d). Gathers each sequence's context (S, W*bs, kvh, d) from
    the flat cache and applies a context-length mask (plus a sliding
    `window` / score `softcap` when set — Gemma2). `base` offsets into
    a flat multi-layer cache.
    """
    S, h, d = q.shape
    W = meta.block_tables.shape[1]
    bs = block_size
    # Flat slots for every (block, offset) pair in the table.
    offs = jnp.arange(bs, dtype=jnp.int32)
    slots = base + (
        meta.block_tables[:, :, None] * bs + offs[None, None, :]
    ).reshape(S, W * bs)
    k = cache_gather(k_cache, slots)             # (S, C, kvh, d)
    v = cache_gather(v_cache, slots, role=1)
    kvh = k.shape[2]
    g = h // kvh
    qg = q.reshape(S, kvh, g, d).astype(jnp.float32)
    scores = jnp.einsum("skgd,sckd->skgc", qg, k.astype(jnp.float32)) * scale
    if softcap is not None:
        scores = _softcap(scores, softcap)
    ctx_pos = jnp.arange(W * bs, dtype=jnp.int32)
    mask = ctx_pos[None, :] < meta.ctx_lens[:, None]
    if window is not None:
        # The query sits at position ctx_len - 1; keep the last `window` keys.
        mask &= ctx_pos[None, :] >= meta.ctx_lens[:, None] - window
    p = _masked_softmax(scores, mask[:, None, None, :])
    out = jnp.einsum("skgc,sckd->skgd", p, v.astype(jnp.float32))
    return out.reshape(S, h, d).astype(q.dtype)

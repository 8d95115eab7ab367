"""Pallas (Mosaic TPU) paged flash-decode attention.

The hot kernel of decode serving (SURVEY.md §7.3 "the single most
performance-critical artifact"; reference analog: the vendor
flash_attn_with_kvcache / npu_incre_flash_attention calls,
attention.py:394-449). One grid step per sequence:

- the sequence's KV blocks are streamed HBM -> VMEM by block-table lookup
  (scalar-prefetched indices) with double buffering, so the kernel runs at
  HBM speed-of-light on the KV bytes;
- a block arrives as the contiguous (block_size, kvh, d) slab of the flat
  slot cache — one DMA covers every KV head;
- online-softmax (flash) accumulation in fp32 VMEM scratch, GQA groups
  computed against their KV head without materializing repeats;
- the context-length tail is masked, and whole invalid blocks are never
  fetched (the fori_loop trip count is the sequence's actual block count).

Layout contract (matches ops/attention.py):
  q            (S, h, d)
  k/v cache    (num_slots, kvh, d), slot = block_id * block_size + offset
  block_tables (S, W) int32, padding entries point at the trash block
  ctx_lens     (S,) int32 (0 for padding rows)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _cache_parts(cache):
    """(data, scale, quantized) for a plain array or QuantizedCache."""
    from minivllm_tpu.ops.attention import QuantizedCache

    if isinstance(cache, QuantizedCache):
        return cache.data, cache.scale, True
    return cache, None, False


def is_supported(q, k_cache, block_size: int | None = None) -> bool:
    data, _, _ = _cache_parts(k_cache)
    if not hasattr(data, "shape"):
        return False
    h = q.shape[-2]
    kvh = data.shape[-2]
    d = q.shape[-1]
    return d % 128 == 0 and h % kvh == 0


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # (S*W,) int32 in SMEM
    ctx_lens_ref,      # (S,) int32 in SMEM
    base_ref,          # (2,) int32 — [flat-cache layer offset, window]
    # inputs
    q_ref,             # (1, h, d) VMEM — this sequence's queries
    k_hbm,             # (num_slots, kvh, d) ANY/HBM
    v_hbm,
    ks_hbm,            # (total_blocks, kvh, lanes) fp32 ANY — per-block
    vs_hbm,            #   scale slabs (lane l = slot offset l); dummy if
                       #   !quantized
    # outputs
    o_ref,             # (1, h, d) VMEM
    # scratch
    kbuf, vbuf,        # (2, bs, kvh, d) VMEM
    ksbuf, vsbuf,      # (2, 1, kvh, lanes) fp32 VMEM (int8 dequant scales)
    acc, m_i, l_i,     # (h, d) fp32, (h, 128) fp32, (h, 128) fp32
    sems,              # DMA semaphores (2, 4)
    *,
    block_size: int,
    num_kv_heads: int,
    scale: float,
    max_blocks: int,
    quantized: bool,
    softcap: float | None,
):
    s = pl.program_id(0)
    ctx_len = ctx_lens_ref[s]
    num_blocks = pl.cdiv(ctx_len, block_size)
    # Sliding window (Gemma2): keys before ctx_len - window are invalid,
    # so blocks wholly below the window start are never even fetched.
    win_start = jnp.maximum(ctx_len - base_ref[1], 0)
    first_block = win_start // block_size
    h = q_ref.shape[1]
    d = q_ref.shape[2]
    g = h // num_kv_heads

    def start_fetch(j, slot):
        blk = block_tables_ref[s * max_blocks + j]
        off = base_ref[0] + blk * block_size
        pltpu.make_async_copy(
            k_hbm.at[pl.ds(off, block_size)], kbuf.at[slot], sems.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[pl.ds(off, block_size)], vbuf.at[slot], sems.at[slot, 1]
        ).start()
        if quantized:
            row = off // block_size  # scale row per block (lane-aligned)
            pltpu.make_async_copy(
                ks_hbm.at[pl.ds(row, 1)], ksbuf.at[slot], sems.at[slot, 2]
            ).start()
            pltpu.make_async_copy(
                vs_hbm.at[pl.ds(row, 1)], vsbuf.at[slot], sems.at[slot, 3]
            ).start()

    def wait_fetch(slot):
        pltpu.make_async_copy(
            k_hbm.at[pl.ds(0, block_size)], kbuf.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[pl.ds(0, block_size)], vbuf.at[slot], sems.at[slot, 1]
        ).wait()
        if quantized:
            pltpu.make_async_copy(
                ks_hbm.at[pl.ds(0, 1)], ksbuf.at[slot], sems.at[slot, 2]
            ).wait()
            pltpu.make_async_copy(
                vs_hbm.at[pl.ds(0, 1)], vsbuf.at[slot], sems.at[slot, 3]
            ).wait()

    @pl.when(num_blocks > first_block)
    def _():
        start_fetch(first_block, first_block % 2)

    acc[...] = jnp.zeros_like(acc)
    m_i[...] = jnp.full_like(m_i, NEG_INF)
    l_i[...] = jnp.zeros_like(l_i)

    q = q_ref[0].astype(jnp.float32) * scale  # (h, d)

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < num_blocks)
        def _():
            start_fetch(j + 1, (j + 1) % 2)

        wait_fetch(slot)
        k = kbuf[slot].astype(jnp.float32)  # (bs, kvh, d)
        v = vbuf[slot].astype(jnp.float32)
        if quantized:
            # Scale slabs for this block: lane l of head kv holds the
            # dequant scale of slot offset l. Scores/probabilities are
            # scaled per lane (mathematically identical to dequantizing
            # k/v, but lane-aligned for Mosaic — no shape casts needed).
            ks = ksbuf[slot][0]  # (kvh, lanes)
            vs = vsbuf[slot][0]
        # Per-KV-head 2D matmuls (static unroll — Mosaic requires equal
        # batch-dim positions, so grouped batched dots are avoided).
        score_rows = []
        for kv in range(num_kv_heads):
            qh = q[kv * g : (kv + 1) * g, :]      # (g, d)
            kh = k[:, kv, :]                       # (bs, d)
            sc = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (g, bs)
            if quantized:
                sc = sc * ks[kv : kv + 1, :block_size]  # (1, bs) broadcast
            score_rows.append(sc)
        scores = jnp.concatenate(score_rows, axis=0)  # (h, bs)
        if softcap is not None:
            scores = softcap * jnp.tanh(scores / softcap)
        # mask context tail and the sliding-window head
        pos = j * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (h, block_size), 1
        )
        scores = jnp.where(
            (pos < ctx_len) & (pos >= win_start), scores, NEG_INF
        )

        m_prev = m_i[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # (h, bs)
        l_new = alpha * l_i[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
        pv_rows = []
        for kv in range(num_kv_heads):
            ph = p[kv * g : (kv + 1) * g, :]       # (g, bs)
            if quantized:
                ph = ph * vs[kv : kv + 1, :block_size]
            vh = v[:, kv, :]                        # (bs, d)
            pv_rows.append(
                jnp.dot(ph, vh, preferred_element_type=jnp.float32)
            )  # (g, d)
        pv = jnp.concatenate(pv_rows, axis=0)       # (h, d)
        acc[...] = acc[...] * alpha + pv
        m_i[...] = jnp.broadcast_to(m_new, m_i.shape)
        l_i[...] = jnp.broadcast_to(l_new, l_i.shape)
        return 0

    jax.lax.fori_loop(first_block, num_blocks, body, 0)
    denom = jnp.maximum(l_i[:, 0:1], 1e-30)
    out = acc[...] / denom
    # Fully-masked rows (padding sequences) produce 0/eps -> 0; keep finite.
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_size", "interpret", "softcap"),
)
def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    meta,
    scale: float,
    block_size: int,
    base=0,
    window=None,
    softcap: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paged flash-decode. q (S, h, d) -> (S, h, d).

    k_cache/v_cache: plain (num_slots, kvh, d) arrays or QuantizedCache
    (int8 data + per-slot-per-head scales, dequantized in-kernel — the
    north-star "dequant fused into the flash-decode" path).

    `window` (may be a traced per-layer scalar — Gemma2's alternating
    sliding/full layers) bounds attention to the last `window` keys;
    out-of-window blocks are never fetched. `softcap` (static) applies
    tanh score capping in-kernel."""
    S, h, d = q.shape
    k_data, k_scale, quantized = _cache_parts(k_cache)
    v_data, v_scale, _ = _cache_parts(v_cache)
    kvh = k_data.shape[1]
    lanes = k_scale.shape[-1] if quantized else 128
    if not quantized:
        # dummies keep one kernel signature; never DMA'd when !quantized
        k_scale = jnp.ones((1, kvh, lanes), jnp.float32)
        v_scale = k_scale
    W = meta.block_tables.shape[1]
    kernel = functools.partial(
        _decode_kernel,
        block_size=block_size,
        num_kv_heads=kvh,
        scale=scale,
        max_blocks=W,
        quantized=quantized,
        softcap=softcap,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda s, *_: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_size, kvh, d), k_data.dtype),
            pltpu.VMEM((2, block_size, kvh, d), v_data.dtype),
            pltpu.VMEM((2, 1, kvh, lanes), jnp.float32),
            pltpu.VMEM((2, 1, kvh, lanes), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        meta.block_tables.reshape(-1),
        meta.ctx_lens,
        jnp.stack(
            [
                jnp.asarray(base, jnp.int32),
                jnp.asarray(window if window is not None else 1 << 30, jnp.int32),
            ]
        ),
        q,
        k_data,
        v_data,
        k_scale,
        v_scale,
    )
    return out

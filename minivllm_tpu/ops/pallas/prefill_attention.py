"""Pallas (Mosaic TPU) varlen causal prefill flash attention over the
paged KV cache.

Replaces the reference's flash_attn_varlen_func path
(/root/reference/minivllm/models/layers/attention.py:394-449) with a
packed, tile-aligned design:

- The runner packs each sequence's query tokens at Q_TILE-aligned offsets
  (PrefillBatch.q_start/q_lens), so every Q_TILE-row tile belongs to
  exactly one sequence — the grid is simply (num_tiles,) with identity
  q/out block maps, no dynamic output aliasing.
- Per tile, the owning sequence's KV blocks are streamed HBM -> VMEM by
  block-table lookup with double buffering; the causal structure bounds
  the trip count (blocks entirely above the tile's last query position
  are never fetched).
- Online-softmax accumulation in fp32; GQA by per-KV-head matmuls with
  all of a group's query rows folded into the M dimension
  ((g * Q_TILE, d) x (d, block_size) on the MXU).
- Prefix-cache hits come for free: cached context tokens live in the same
  paged cache and q positions start at PrefillBatch.positions.

Scalar-prefetch metadata (host-built in the runner):
  tile_seq  (nt,) — owning sequence of each tile (padding tiles -> -1)
  tile_pos0 (nt,) — absolute context position of the tile's first row
  tile_rows (nt,) — valid rows in the tile
  block_tables (S*W,), ctx_lens (S,)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

Q_TILE = 64
# KV streaming super-blocks: _pick_mblk gather-DMAs per pipeline slot,
# one compute pass over (mblk * block_size) keys. Single-block passes
# left the kernel issue/VPU-bound at ~4 TFLOP/s issued; wide passes
# amortize the per-pass mask/softmax lanes and matmul issue.


def _pick_mblk(block_size: int) -> int:
    """Sub-blocks per super-block, targeting 512-KEY spans (mblk *
    block_size keys per pipeline slot): the 256->512 jump measured +63%
    at block_size 128, and lifting the old 4-sub-block cap so the
    DEFAULT block_size 64 also reaches 512 keys measured 2.05 -> 1.57
    ms at 8x512, 5.04 -> 3.04 at 2x2048, 7.61 -> 4.08 ms (13.8 -> 25.8
    TFLOP/s) at 2x1024/ctx4096 on v5e — confirmed end-to-end by an
    adjacent-run serving A/B (16x1024-token prompts: prefill 33.8k ->
    35.5k tok/s, TTFT p50 -4.5%, decode unchanged). Sub-block count is
    capped at 8 (small block sizes would otherwise multiply per-span
    gather-DMA issues). Larger spans stay out: wider passes waste
    masked-lane work on ragged tails (see the block-size study)."""
    return max(1, min(8, 512 // block_size))


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


def _prefill_kernel(
    # scalar prefetch
    tile_seq_ref, tile_pos0_ref, tile_rows_ref, block_tables_ref, ctx_lens_ref,
    base_ref,
    # inputs
    q_ref,            # (Q_TILE, h, d) VMEM
    k_hbm, v_hbm,     # (num_slots, kvh, d) ANY
    kvs_hbm,          # (total_blocks, kvh, lanes) fp32 ANY — per-block
                      #   K+V-PACKED scale slabs (lane l = K scale of
                      #   slot offset l, lane block_size + l = V scale;
                      #   one DMA covers both); dummy if !quantized
    # outputs
    o_ref,            # (Q_TILE, h, d) VMEM
    # scratch
    kbuf, vbuf,       # (2, mblk*bs, kvh, d) VMEM
    ksbuf,            # (2, mblk, kvh, lanes) fp32 VMEM (packed scales)
    acc,              # (h * Q_TILE, d) fp32
    m_i, l_i,         # (h * Q_TILE, 128) fp32
    sems,
    *,
    block_size: int,
    mblk: int,
    num_kv_heads: int,
    scale: float,
    max_blocks: int,
    quantized: bool,
    softcap: float | None,
    int8_scores: bool,
    interior_skip: bool,
    qk_bf16: bool,
):
    t = pl.program_id(0)
    s = tile_seq_ref[t]
    active = s >= 0
    s = jnp.maximum(s, 0)
    pos0 = tile_pos0_ref[t]
    rows = jnp.where(active, tile_rows_ref[t], 0)
    ctx_len = ctx_lens_ref[s]
    window = base_ref[1]
    h = q_ref.shape[1]
    d = q_ref.shape[2]
    g = h // num_kv_heads
    bs = block_size
    # Causal bound: only blocks whose first position <= last query position.
    last_q_pos = pos0 + rows - 1
    kv_limit = jnp.minimum(ctx_len, last_q_pos + 1)
    num_blocks = jnp.where(active, pl.cdiv(kv_limit, bs), 0)
    # Sliding-window bound: the tile's earliest query (pos0) sees nothing
    # before pos0 - window + 1, so earlier blocks are never fetched.
    first_block = jnp.maximum(pos0 - window + 1, 0) // bs

    first_super = first_block // mblk
    num_super = pl.cdiv(num_blocks, mblk)

    def start_fetch(js, slot):
        """Fetch super-block js (up to mblk gather-DMAs); sub-blocks
        outside [first_block, num_blocks) are predicated off entirely —
        no ragged-tail or below-window traffic."""
        for m in range(mblk):
            j = jnp.clip(js * mblk + m, 0, max_blocks - 1)
            blk = block_tables_ref[s * max_blocks + j]
            off = base_ref[0] + blk * bs
            dst = pl.ds(m * bs, bs)

            @pl.when(
                (js * mblk + m >= first_block) & (js * mblk + m < num_blocks)
            )
            def _():
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(off, bs)], kbuf.at[slot, dst],
                    sems.at[slot, m, 0],
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(off, bs)], vbuf.at[slot, dst],
                    sems.at[slot, m, 1],
                ).start()
                if quantized:
                    row = off // bs  # scale row per block (lane-aligned)
                    pltpu.make_async_copy(
                        kvs_hbm.at[pl.ds(row, 1)], ksbuf.at[slot, pl.ds(m, 1)],
                        sems.at[slot, m, 2],
                    ).start()

    def wait_fetch(js, slot):
        for m in range(mblk):
            dst = pl.ds(m * bs, bs)

            @pl.when(
                (js * mblk + m >= first_block) & (js * mblk + m < num_blocks)
            )
            def _():
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(0, bs)], kbuf.at[slot, dst],
                    sems.at[slot, m, 0],
                ).wait()
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(0, bs)], vbuf.at[slot, dst],
                    sems.at[slot, m, 1],
                ).wait()
                if quantized:
                    pltpu.make_async_copy(
                        kvs_hbm.at[pl.ds(0, 1)], ksbuf.at[slot, pl.ds(m, 1)],
                        sems.at[slot, m, 2],
                    ).wait()

    # Never-fetched (predicated-off) V regions must be finite: masked
    # probabilities are zero, but 0 * NaN = NaN in the PV matmul. Must
    # precede the prologue fetch (a DMA lands in this buffer).
    vbuf[...] = jnp.zeros_like(vbuf)
    if quantized:
        ksbuf[...] = jnp.zeros_like(ksbuf)

    @pl.when(num_super > first_super)
    def _():
        start_fetch(first_super, first_super % 2)

    acc[...] = jnp.zeros_like(acc)
    m_i[...] = jnp.full_like(m_i, NEG_INF)
    l_i[...] = jnp.zeros_like(l_i)

    # q rows folded per KV-head group: (kvh, g*QT, d) conceptually; we
    # slice per kv head below. Scale once.
    if int8_scores:
        # W8A8 scores (int8-KV only): per-(row, head) q quantization;
        # q.k runs int8 x int8 -> int32 on the MXU and the K slab's
        # int8 -> fp32 conversion disappears (see the decode kernel).
        q_raw = q_ref[...].astype(jnp.float32)      # (QT, h, d)
        q_qs = jnp.maximum(
            jnp.max(jnp.abs(q_raw), axis=-1, keepdims=True), 1e-30
        ) / 127.0                                    # (QT, h, 1)
        q8 = jnp.round(q_raw / q_qs).astype(jnp.int8)
    elif qk_bf16:
        # bf16 MXU operands for the QK dot (4x the fp32 issue rate),
        # fp32 accumulation. LOSSLESS for the serving inputs: q and the
        # KV cache are bf16-sourced (bf16 x bf16 products are exact in
        # fp32), and int8 cache values (|v| <= 127 integers) are
        # bf16-exact too. `scale` applies AFTER the dot so the raw bf16
        # bits reach the MXU unrounded. Unlike the falsified DECODE
        # bf16 operands (tiny odd-M g=7 relayout wall), prefill dots
        # have M = Q_TILE*g — large and even.
        qb = q_ref[...].astype(jnp.bfloat16)         # (QT, h, d)
    else:
        q = q_ref[...].astype(jnp.float32) * scale  # (QT, h, d)
    q_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (Q_TILE, 1), 0)[:, 0]

    span = mblk * bs
    # Hoisted per-pass mask ingredients: the lane iota never changes and
    # k_pos is just iota + js * span.
    iota_span = jax.lax.broadcasted_iota(jnp.int32, (Q_TILE, span), 1)

    def body(js, _, masked):
        slot = js % 2

        @pl.when(js + 1 < num_super)
        def _():
            start_fetch(js + 1, (js + 1) % 2)

        wait_fetch(js, slot)
        if int8_scores:
            k8 = kbuf[slot]                          # (span, kvh, d) int8
        elif qk_bf16:
            kb = kbuf[slot].astype(jnp.bfloat16)     # (span, kvh, d)
        else:
            k = kbuf[slot].astype(jnp.float32)       # (span, kvh, d)
        v = vbuf[slot].astype(jnp.float32)
        if quantized:
            # Per-head (1, span) scale rows by lane-concatenating the
            # mblk sub-slabs of the PACKED slab (lane l of sub-block m,
            # head kv = the K scale of slot offset l; lane bs + l the V
            # scale); mathematically identical to dequantizing k/v but
            # lane-aligned for Mosaic.
            ksb = ksbuf[slot]

            def scale_row(role, kv):
                lo = role * bs
                return jnp.concatenate(
                    [ksb[m, kv : kv + 1, lo : lo + bs] for m in range(mblk)],
                    axis=1,
                )  # (1, span)
        score_rows = []
        for kv in range(num_kv_heads):
            if int8_scores:
                qh8 = q8[:, kv * g : (kv + 1) * g, :].reshape(Q_TILE * g, d)
                qs2 = q_qs[:, kv * g : (kv + 1) * g, :].reshape(Q_TILE * g, 1)
                sc = jax.lax.dot_general(
                    qh8, k8[:, kv, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                sc = sc * (qs2 * scale)
                sc = sc * scale_row(0, kv)
                score_rows.append(sc)
                continue
            if qk_bf16:
                qh2 = qb[:, kv * g : (kv + 1) * g, :].reshape(Q_TILE * g, d)
                kh = kb[:, kv, :]
                sc = jax.lax.dot_general(
                    qh2, kh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
            else:
                qh = q[:, kv * g : (kv + 1) * g, :]  # (QT, g, d)
                qh2 = qh.reshape(Q_TILE * g, d)
                kh = k[:, kv, :]                      # (bs, d)
                sc = jax.lax.dot_general(
                    qh2, kh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (QT*g, span)
            if quantized:
                sc = sc * scale_row(0, kv)           # (1, span) broadcast
            score_rows.append(sc)
        scores = jnp.concatenate(score_rows, axis=0)  # (kvh*QT*g = h*QT, span)
        if softcap is not None:
            scores = softcap * jnp.tanh(scores / softcap)
        # `masked` is STATIC per loop range (see the three-range split
        # below): interior passes compile with no mask construction, no
        # application, and no per-pass branch at all.
        if masked:
            k_pos = js * span + iota_span
            causal = (
                (k_pos <= q_pos[:, None])
                & (k_pos < ctx_len)
                & (k_pos > q_pos[:, None] - window)
            )  # (QT, span)
            # Row r within a kv-head block corresponds to q row (r // g):
            # same causal mask for every head in the group.
            mask = jnp.broadcast_to(
                causal[:, None, :], (Q_TILE, g, span)
            ).reshape(Q_TILE * g, span)
            mask = jnp.concatenate([mask] * num_kv_heads, axis=0)
            scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_i[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        m_new = jnp.maximum(m_new, NEG_INF)
        alpha = jnp.exp(m_prev - m_new)
        # exp(NEG_INF - m_new) underflows to exactly 0 for any finite
        # m_new, so masked lanes need no explicit re-zeroing; a pass
        # with EVERY lane masked for a row keeps that row's m at
        # NEG_INF, and its garbage p-contributions are wiped by
        # alpha = exp(NEG_INF - m) = 0 at the row's first valid pass
        # (rows with no valid pass at all are packing padding, never
        # read back).
        p = jnp.exp(scores - m_new)
        l_i[...] = jnp.broadcast_to(
            alpha * l_i[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True), l_i.shape
        )
        pv_rows = []
        for kv in range(num_kv_heads):
            ph = p[kv * Q_TILE * g : (kv + 1) * Q_TILE * g, :]
            if quantized:
                ph = ph * scale_row(1, kv)
            vh = v[:, kv, :]
            pv_rows.append(jnp.dot(ph, vh, preferred_element_type=jnp.float32))
        pv = jnp.concatenate(pv_rows, axis=0)         # (h*QT, d)
        acc[...] = acc[...] * alpha + pv
        m_i[...] = jnp.broadcast_to(m_new, m_i.shape)
        return 0

    # Three-range pass split: passes wholly below the tile's FIRST query
    # position, inside the context, and inside the LAST row's window are
    # INTERIOR — every lane is valid for every row, so the whole
    # causal/window/context mask (iota + compares + where over
    # (h*QT, span)) is dead weight there. Splitting the loop makes that
    # a STATIC property per range: [first, mid_start) masked window
    # head, [mid_start, mid_end) clean interior, [mid_end, num_super)
    # masked diagonal + context tail. At long context the interior
    # range dominates (measured +7-17% at 2-4k ctx on v5e); at
    # diagonal-only shapes the interior range is empty and the kernel
    # is exactly the always-masked one (a per-pass lax.cond instead
    # measured -7% there). MINIVLLM_MASK_SKIP=0 forces single-loop
    # always-masked (A/B kill-switch).
    if interior_skip:
        mid_start = jnp.maximum(
            first_super,
            pl.cdiv(jnp.maximum(pos0 + Q_TILE - window, 0), span),
        )
        mid_end = jnp.minimum((pos0 + 1) // span, kv_limit // span)
        mid_start = jnp.clip(mid_start, first_super, num_super)
        mid_end = jnp.clip(mid_end, mid_start, num_super)
        jax.lax.fori_loop(
            first_super, mid_start, lambda js, c: body(js, c, True), 0
        )
        jax.lax.fori_loop(
            mid_start, mid_end, lambda js, c: body(js, c, False), 0
        )
        jax.lax.fori_loop(
            mid_end, num_super, lambda js, c: body(js, c, True), 0
        )
    else:
        jax.lax.fori_loop(
            first_super, num_super, lambda js, c: body(js, c, True), 0
        )
    denom = jnp.maximum(l_i[:, 0:1], 1e-30)
    out = acc[...] / denom                            # (h*QT, d) kv-major rows
    # rows are ordered (kv, q_row, g); restore (QT, h, d)
    out = out.reshape(num_kv_heads, Q_TILE, g, d).transpose(1, 0, 2, 3)
    o_ref[...] = out.reshape(Q_TILE, h, d).astype(o_ref.dtype)


def tile_metadata(meta, nt: int):
    """Per-tile metadata from the per-sequence packing arrays, in-jit.

    Each Q_TILE-row tile belongs to exactly one sequence (the runner
    packs at Q_TILE-aligned offsets). Returns (tile_seq, tile_pos0,
    tile_rows), each (nt,) int32; padding tiles get tile_seq = -1.
    Computed at the GLOBAL packed layout — under sequence parallelism
    the arrays shard along tiles and the kernel needs no other change
    (it never reads q_start directly)."""
    tile_idx = jnp.arange(nt, dtype=jnp.int32)
    starts = meta.q_start // Q_TILE                  # (S,) first tile of seq
    n_tiles = (meta.q_lens + Q_TILE - 1) // Q_TILE   # (S,)
    # tile -> seq: mark tile ranges [starts, starts + n_tiles).
    in_range = (tile_idx[None, :] >= starts[:, None]) & (
        tile_idx[None, :] < (starts + n_tiles)[:, None]
    )                                                 # (S, nt)
    valid_seq = meta.q_lens > 0
    in_range = in_range & valid_seq[:, None]
    tile_seq = jnp.where(
        jnp.any(in_range, axis=0),
        jnp.argmax(in_range, axis=0).astype(jnp.int32),
        -1,
    )
    s_clamped = jnp.maximum(tile_seq, 0)
    local = tile_idx - starts[s_clamped]
    qpos0_seq = meta.ctx_lens - meta.q_lens          # first q position per seq
    tile_pos0 = qpos0_seq[s_clamped] + local * Q_TILE
    tile_rows = jnp.clip(
        meta.q_lens[s_clamped] - local * Q_TILE, 0, Q_TILE
    )
    return tile_seq, tile_pos0, tile_rows


def prefill_attention_tiles(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    tile_seq, tile_pos0, tile_rows,
    block_tables, ctx_lens,
    scale: float,
    block_size: int,
    base=0,
    window=None,
    softcap: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Tile-level entry: takes precomputed (possibly sharded) per-tile
    metadata — the shard_map SPMD path enters here with tiles/q sharded
    along the packed-token axis."""
    T, h, d = q.shape
    k_data, kv_scale, quantized = _cache_parts(k_cache)
    v_data, _, _ = _cache_parts(v_cache)
    kvh = k_data.shape[1]
    lanes = kv_scale.shape[-1] if quantized else 128
    if not quantized:
        # dummy keeps one kernel signature; never DMA'd when !quantized
        kv_scale = jnp.ones((1, kvh, lanes), jnp.float32)
    W = block_tables.shape[1]
    nt = T // Q_TILE
    mblk = _pick_mblk(block_size)
    import os

    if os.environ.get("MINIVLLM_PREFILL_MBLK"):  # A/B experiments only
        mblk = max(1, min(int(os.environ["MINIVLLM_PREFILL_MBLK"]), W))

    int8_scores = (
        quantized
        and k_data.dtype == jnp.int8
        and os.environ.get("MINIVLLM_INT8_SCORES", "0") == "1"
    )
    kernel = functools.partial(
        _prefill_kernel,
        block_size=block_size,
        mblk=mblk,
        num_kv_heads=kvh,
        scale=scale,
        max_blocks=W,
        quantized=quantized,
        softcap=softcap,
        int8_scores=int8_scores,
        # A/B kill-switch for the interior-pass mask skip.
        interior_skip=os.environ.get("MINIVLLM_MASK_SKIP", "1") != "0",
        # bf16 QK operands: lossless for bf16/int8 caches (see kernel);
        # fp32 caches keep fp32 operands (a cast would drop mantissa).
        qk_bf16=(
            os.environ.get("MINIVLLM_PREFILL_QK_BF16", "0") == "1"
            and not int8_scores
            and k_data.dtype in (jnp.bfloat16, jnp.int8)
            and q.dtype == jnp.bfloat16
        ),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((Q_TILE, h, d), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Q_TILE, h, d), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, mblk * block_size, kvh, d), k_data.dtype),
            pltpu.VMEM((2, mblk * block_size, kvh, d), v_data.dtype),
            pltpu.VMEM((2, mblk, kvh, lanes), jnp.float32),
            pltpu.VMEM((h * Q_TILE, d), jnp.float32),
            pltpu.VMEM((h * Q_TILE, 128), jnp.float32),
            pltpu.VMEM((h * Q_TILE, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, mblk, 3)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The Mosaic default scoped-VMEM budget is 16 MB (v5e has
            # 128 MB physical): Qwen2-7B prefill at block_size 128
            # needs 16.2 MB. 64 MB leaves headroom without starving
            # XLA's own VMEM needs for the surrounding program.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        tile_seq, tile_pos0, tile_rows,
        block_tables.reshape(-1), ctx_lens,
        jnp.stack(
            [
                jnp.asarray(base, jnp.int32),
                jnp.asarray(window if window is not None else 1 << 30, jnp.int32),
            ]
        ),
        q, k_data, v_data, kv_scale,
    )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_size", "interpret", "softcap"),
)
def prefill_attention(
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
    """Tile-aligned packed varlen prefill flash attention.

    Requires the runner's Q_TILE-aligned packing: meta.q_start (S,) row
    offsets, meta.q_lens (S,), plus positions/ctx_lens/block_tables.
    `window` bounds attention to the trailing window per query (sliding-
    window models; blocks wholly below a tile's window are not fetched);
    `softcap` (static) applies tanh score capping in-kernel.
    """
    nt = q.shape[0] // Q_TILE
    tile_seq, tile_pos0, tile_rows = tile_metadata(meta, nt)
    return prefill_attention_tiles(
        q, k_cache, v_cache, tile_seq, tile_pos0, tile_rows,
        meta.block_tables, meta.ctx_lens, scale, block_size, base,
        window, softcap, interpret,
    )

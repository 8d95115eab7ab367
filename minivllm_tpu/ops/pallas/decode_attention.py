"""Pallas (Mosaic TPU) paged flash-decode attention — persistent kernel.

The hot kernel of decode serving (SURVEY.md §7.3 "the single most
performance-critical artifact"; reference analog: the vendor
flash_attn_with_kvcache / npu_incre_flash_attention calls,
attention.py:394-449).

Design: ONE grid step processes a flat work list of (sequence,
super-block) items instead of one grid step per sequence. Earlier
per-sequence-grid versions paid a prologue DMA bubble, accumulator
init and output write per sequence — at short contexts (1-4
super-blocks per sequence) that overhead bounded the kernel at ~25% of
HBM roofline. The persistent loop keeps gather-DMAs continuously in
flight ACROSS sequence boundaries: while item i (seq A) computes, item
i+1 (possibly seq B) is already streaming into the other buffer slot.

- The work list is built in-jit (jnp cumsum/searchsorted over
  ctx_lens) and read from SMEM via scalar prefetch, so it works inside
  the fused multi-step decode scan where ctx_lens are traced values.
- A super-block is MBLK cache blocks (MBLK gather-DMAs per item, one
  compute pass over MBLK*block_size keys) — wide compute passes
  amortize instruction issue, which otherwise bounds the loop.
- A block arrives as the contiguous (block_size, kvh, d) slab of the
  flat slot cache — one DMA covers every KV head.
- Online-softmax (flash) accumulation in fp32 VMEM scratch; GQA groups
  computed against their KV head without materializing repeats.
- The context tail is masked; whole out-of-window / out-of-context
  super-blocks never appear in the work list, so their KV is never
  fetched (sliding-window KV traffic is O(min(context, window))).

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

# KV streaming shape: each pipeline slot holds a super-block of `mblk`
# cache blocks. NBUF slots keep the next item's fetches in flight behind
# the current item's compute. VMEM cost: NBUF * mblk * block_size * kvh
# * d per cache. mblk adapts to the (static) block-table width: wide
# passes amortize per-item overhead at long contexts (+10% GB/s at ctx
# >= 1024) but waste VPU/MXU lanes on masked keys at short ones (-30%
# at ctx 256), so W <= 8 buckets use 4 and larger buckets use 8.
NBUF = 2


def _pick_mblk(max_blocks: int, block_size: int = 64) -> int:
    # Span choice is a compute-waste tradeoff, and REAL (ragged)
    # context lengths decide it: exact power-of-two microbenches said
    # span 1024 wins (bf16 1.53 -> 1.21 ms at ctx 4096), but the
    # adjacent-run serving A/B at 1024-token prompts said the opposite
    # (decode 1820 -> 1648 tok/s): per-key VPU/softmax work runs on
    # masked lanes too, and a wide span wastes nearly a full pass on
    # every ragged tail. Span 512 (mblk 8 at block 64) balances it;
    # W <= 8 tables stay at 4 (short contexts are mostly tail).
    mblk = 4 if max_blocks <= 8 else 8
    return max(1, min(mblk, 1024 // block_size))


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
    *refs,
    block_size: int,
    num_kv_heads: int,
    scale: float,
    max_blocks: int,
    quantized: bool,
    softcap: float | None,
    mblk: int,
    carry: bool,
    return_state: bool,
    int8_scores: bool,
    interior_skip: bool,
    qrows: int,
):
    """Ref order (optional groups controlled by the static flags):

    qrows > 1 = MULTI-ROW VERIFY items (speculative decoding): one work
    item processes ALL qrows consecutive query rows of a sequence
    (q rows [s*qrows, (s+1)*qrows), consecutive positions) against ONE
    KV stream — the per-item DMA/prologue cost and the KV traffic are
    paid once per sequence instead of once per verify row, and the MXU
    M dimension grows qrows-fold. Row r's causal bound is
    ctx_len - (qrows - 1) + r (ctx_lens holds the LAST row's bound).
    Incompatible with carry/return_state/start (qrows == 1 only there).

    scalar prefetch: block_tables (S*W,), ctx_lens (S,), start (S,) —
      per-seq first attended token (shared-prefix tail start; zeros
      normally), base (3,) [flat-cache layer offset, window, n_work],
      work (3, WI) [seq, super-block js, flags] per item.
    inputs: q (S, h, d) VMEM; k/v (num_slots, kvh, d) ANY/HBM;
      kvs (total_blocks, kvh, lanes) fp32 K+V-PACKED scale slabs — per
      block, lanes [0, bs) hold K scales and [bs, 2bs) V scales, so ONE
      DMA per sub-block covers both (dummy if !quantized); [if carry]
      acc0 (S, h, d) f32 + ml0 (S, 2, h, 128) f32 — softmax state to
      continue from (shared-prefix phase 1).
    outputs: o (S, h, d); [if return_state] acc_out (S, h, d) f32 +
      ml_out (S, 2, h, 128) f32 — UNNORMALIZED accumulator and (m, l)
      written at each sequence's last item.
    scratch: kbuf/vbuf, ksbuf, acc, m_i, l_i, sems.
    """
    (
        block_tables_ref, ctx_lens_ref, start_ref, base_ref, work_ref,
        q_ref, k_hbm, v_hbm, kvs_hbm, *rest
    ) = refs
    if carry:
        acc0_ref, ml0_ref = rest[:2]
        rest = rest[2:]
    o_ref = rest[0]
    rest = rest[1:]
    if return_state:
        accout_ref, mlout_ref = rest[:2]
        rest = rest[2:]
    kbuf, vbuf, ksbuf, acc, m_i, l_i, sems = rest
    total = base_ref[2]
    h = q_ref.shape[1]
    d = q_ref.shape[2]
    g = h // num_kv_heads
    span = mblk * block_size  # keys per compute pass

    def _sub_blocks(i):
        """(sub-block validity predicate maker) — DMAs for sub-blocks
        past the sequence's block count are skipped entirely (predicated
        off), saving both bandwidth and issue slots on ragged tails."""
        s = work_ref[0, i]
        js = work_ref[1, i]
        nb = pl.cdiv(ctx_lens_ref[s], block_size)
        return s, js, nb

    def start_fetch(i, slot):
        """Fetch work item i's super-block (up to mblk gather-DMAs)
        into `slot`."""
        s, js, nb = _sub_blocks(i)
        for m in range(mblk):
            j = jnp.minimum(js * mblk + m, max_blocks - 1)
            blk = block_tables_ref[s * max_blocks + j]
            off = base_ref[0] + blk * block_size
            dst = pl.ds(m * block_size, block_size)

            @pl.when(js * mblk + m < nb)
            def _():
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(off, block_size)], kbuf.at[slot, dst],
                    sems.at[slot, m, 0],
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(off, block_size)], vbuf.at[slot, dst],
                    sems.at[slot, m, 1],
                ).start()
                if quantized:
                    row = off // block_size
                    pltpu.make_async_copy(
                        kvs_hbm.at[pl.ds(row, 1)],
                        ksbuf.at[slot, pl.ds(m, 1)],
                        sems.at[slot, m, 2],
                    ).start()

    def wait_fetch(i, slot):
        s, js, nb = _sub_blocks(i)
        for m in range(mblk):
            dst = pl.ds(m * block_size, block_size)

            @pl.when(js * mblk + m < nb)
            def _():
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(0, block_size)], kbuf.at[slot, dst],
                    sems.at[slot, m, 0],
                ).wait()
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(0, block_size)], vbuf.at[slot, dst],
                    sems.at[slot, m, 1],
                ).wait()
                if quantized:
                    pltpu.make_async_copy(
                        kvs_hbm.at[pl.ds(0, 1)], ksbuf.at[slot, pl.ds(m, 1)],
                        sems.at[slot, m, 2],
                    ).wait()

    # The V-buffer fill keeps never-fetched (predicated-off) regions
    # finite: masked scores zero their softmax weights, but 0 * NaN =
    # NaN in the PV matmul. (Stale data from earlier items is finite
    # and fully masked, so one fill at kernel start suffices.) It MUST
    # precede the prologue fetch — a DMA lands in this buffer.
    vbuf[...] = jnp.zeros_like(vbuf)
    if quantized:
        # Same for the packed scale slabs, whose garbage V lanes would
        # multiply the zeroed weights of masked keys.
        ksbuf[...] = jnp.zeros_like(ksbuf)

    @pl.when(total > 0)
    def _():
        start_fetch(0, 0)

    # Padding rows (never in the work list) must still produce finite
    # output; the zero fill overlaps the first item's DMA.
    o_ref[...] = jnp.zeros_like(o_ref)

    def body(i, _):
        slot = i % NBUF

        @pl.when(i + 1 < total)
        def _():
            start_fetch(i + 1, (i + 1) % NBUF)

        wait_fetch(i, slot)
        s = work_ref[0, i]
        js = work_ref[1, i]
        flags = work_ref[2, i]  # bit0: first item of seq, bit1: last

        @pl.when(flags & 1 == 1)
        def _():
            if carry:
                # Continue a partial softmax (shared-prefix phase 2):
                # ungrouped rows carry the identity state (0, -inf, 0).
                acc[...] = acc0_ref[s]
                m_i[...] = ml0_ref[s, 0]
                l_i[...] = ml0_ref[s, 1]
            else:
                acc[...] = jnp.zeros_like(acc)
                m_i[...] = jnp.full_like(m_i, NEG_INF)
                l_i[...] = jnp.zeros_like(l_i)

        ctx_len = ctx_lens_ref[s]
        win_start = jnp.maximum(ctx_len - base_ref[1], start_ref[s])
        win_start = jnp.maximum(win_start, 0)
        # fp32 MXU operands: measured faster than bf16 here — the
        # per-head (g, span) matmuls have tiny, often odd M (g = h/kvh),
        # and bf16's sublane-pair layout forces relayouts that cost far
        # more than the fp32 rate penalty (6x regression at g=7 on v5e).
        if int8_scores:
            # W8A8 scores (int8-KV only): quantize q per (row, head) to
            # int8 and feed the MXU int8 x int8 -> int32 (2x the bf16
            # issue rate on v5e, and the K slab's int8 -> fp32 VPU
            # conversion disappears); dequant folds into the existing
            # score-scale multiply: sc = i32 * (q_scale * softmax_scale)
            # * k_scale_row. q error <= 1/254 relative per element.
            if qrows > 1:
                q_raw = q_ref[pl.ds(s * qrows, qrows)].astype(jnp.float32)
                qs = jnp.maximum(                   # (qrows, h, 1)
                    jnp.max(jnp.abs(q_raw), axis=-1, keepdims=True), 1e-30
                ) / 127.0
            else:
                q_raw = q_ref[s].astype(jnp.float32)   # (h, d)
                qs = jnp.maximum(
                    jnp.max(jnp.abs(q_raw), axis=-1, keepdims=True), 1e-30
                ) / 127.0                               # (h, 1)
            q8 = jnp.round(q_raw / qs).astype(jnp.int8)
            k8 = kbuf[slot]                         # (span, kvh, d) int8
        elif qrows > 1:
            q = (
                q_ref[pl.ds(s * qrows, qrows)].astype(jnp.float32) * scale
            )                                       # (qrows, h, d)
            k = kbuf[slot].astype(jnp.float32)      # (span, kvh, d)
        else:
            q = q_ref[s].astype(jnp.float32) * scale  # (h, d)
            k = kbuf[slot].astype(jnp.float32)  # (span, kvh, d)
        v = vbuf[slot].astype(jnp.float32)
        if quantized:
            # Packed scale slabs: ksbuf[slot] is (MBLK, kvh, lanes);
            # per sub-block m and head kv, lane l holds the K scale of
            # slot offset l and lane block_size + l the V scale (one
            # DMA covers both). Assemble a per-head (1, span) scale row
            # by lane-concatenating the MBLK sub-slabs (Mosaic supports
            # lane concat; a (MBLK,kvh,bs)->(kvh,span) shape cast
            # doesn't lower). Mathematically identical to dequantizing
            # k/v.
            ksb = ksbuf[slot]

            def scale_row(role, kv):
                lo = role * block_size
                return jnp.concatenate(
                    [
                        ksb[m, kv : kv + 1, lo : lo + block_size]
                        for m in range(mblk)
                    ],
                    axis=1,
                )  # (1, span)

        # Per-KV-head 2D matmuls (static unroll — Mosaic requires equal
        # batch-dim positions, so grouped batched dots are avoided).
        # qrows > 1 folds the item's verify rows into M: per kv head the
        # matmul is (qrows*g, d) x (d, span), rows ordered (r, j).
        score_rows = []
        for kv in range(num_kv_heads):
            if int8_scores:
                if qrows > 1:
                    qh8 = q8[:, kv * g : (kv + 1) * g, :].reshape(
                        qrows * g, d
                    )
                    qsc = qs[:, kv * g : (kv + 1) * g, 0].reshape(
                        qrows * g, 1
                    )
                else:
                    qh8 = q8[kv * g : (kv + 1) * g, :]  # (g, d) int8
                    qsc = qs[kv * g : (kv + 1) * g]
                kh8 = k8[:, kv, :]                   # (span, d) int8
                sc = jax.lax.dot_general(
                    qh8, kh8,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                sc = sc * (qsc * scale)
                sc = sc * scale_row(0, kv)
                score_rows.append(sc)
                continue
            if qrows > 1:
                qh = q[:, kv * g : (kv + 1) * g, :].reshape(qrows * g, d)
            else:
                qh = q[kv * g : (kv + 1) * g, :]   # (g, d)
            kh = k[:, kv, :]                       # (span, d)
            sc = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (qrows*g, span)
            if quantized:
                sc = sc * scale_row(0, kv)         # (1, span) broadcast
            score_rows.append(sc)
        scores = jnp.concatenate(score_rows, axis=0)  # (qrows*h, span)
        if softcap is not None:
            scores = softcap * jnp.tanh(scores / softcap)
        # Mask the context tail and the sliding-window head — but only
        # on boundary passes; interior passes (span wholly inside every
        # row's [win_start, bound)) skip the iota/compare/where lanes.
        # The work list guarantees every pass has at least one valid
        # key, so the online-softmax state stays finite either way.
        # qrows > 1: row r's exclusive bound is ctx_len - (qrows-1) + r
        # (ctx_len is the LAST row's), so interior requires the span
        # below the FIRST row's bound; the per-row window floor rides
        # the same row offset.
        interior = (
            ((js + 1) * span <= ctx_len - (qrows - 1))
            & (js * span >= win_start)
        )

        def apply_mask(sc):
            pos = js * span + jax.lax.broadcasted_iota(
                jnp.int32, (qrows * h, span), 1
            )
            if qrows > 1:
                row = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (qrows * h, span), 0
                    )
                    % (qrows * g)
                ) // g
                bound = ctx_len - (qrows - 1) + row
                lo = jnp.maximum(bound - base_ref[1], start_ref[s])
                return jnp.where(
                    (pos < bound) & (pos >= lo), sc, NEG_INF
                )
            return jnp.where(
                (pos < ctx_len) & (pos >= win_start), sc, NEG_INF
            )

        if interior_skip:
            scores = jax.lax.cond(
                interior, lambda sc: sc, apply_mask, scores
            )
        else:
            scores = apply_mask(scores)

        m_prev = m_i[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # (h, span)
        l_new = alpha * l_i[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
        pv_rows = []
        for kv in range(num_kv_heads):
            ph = p[kv * qrows * g : (kv + 1) * qrows * g, :]
            if quantized:
                ph = ph * scale_row(1, kv)
            vh = v[:, kv, :]                        # (span, d)
            pv_rows.append(
                jnp.dot(ph, vh, preferred_element_type=jnp.float32)
            )  # (qrows*g, d)
        pv = jnp.concatenate(pv_rows, axis=0)       # (qrows*h, d)
        acc[...] = acc[...] * alpha + pv
        m_i[...] = jnp.broadcast_to(m_new, m_i.shape)
        l_i[...] = jnp.broadcast_to(l_new, l_i.shape)

        @pl.when(flags & 2 == 2)
        def _():
            denom = jnp.maximum(l_i[:, 0:1], 1e-30)
            out = acc[...] / denom
            if qrows > 1:
                # acc rows are ordered (kv, r, j); restore (r, h, d).
                out = (
                    out.reshape(num_kv_heads, qrows, g, d)
                    .transpose(1, 0, 2, 3)
                    .reshape(qrows, h, d)
                )
                o_ref[pl.ds(s * qrows, qrows)] = out.astype(o_ref.dtype)
            else:
                o_ref[s] = out.astype(o_ref.dtype)
            if return_state:
                accout_ref[s] = acc[...]
                mlout_ref[s, 0] = m_i[...]
                mlout_ref[s, 1] = l_i[...]

        return 0

    jax.lax.fori_loop(0, total, body, 0)


def _build_work_list(
    ctx_lens, window, block_size: int, max_blocks: int, mblk: int,
    start_tok=None,
):
    """Flat (seq, super-block) work list, computed in-jit.

    Returns (work (3, WI) int32, n_work (int32 scalar)). Row 0: sequence
    index; row 1: super-block index within the sequence; row 2: flags
    (bit0 first-item-of-seq, bit1 last). Items of one sequence are
    consecutive (the kernel's accumulators carry across them). Padding
    rows (ctx 0) contribute no items; super-blocks wholly below the
    per-seq start (sliding window / shared-prefix tail) or past the
    context are excluded up front so their KV is never fetched."""
    S = ctx_lens.shape[0]
    WI = S * ((max_blocks + mblk - 1) // mblk)
    n_blocks = (ctx_lens + block_size - 1) // block_size
    win_start = jnp.maximum(ctx_lens - window, 0)
    if start_tok is not None:
        win_start = jnp.maximum(win_start, start_tok)
    first = (win_start // block_size) // mblk
    n_sup = jnp.maximum((n_blocks + mblk - 1) // mblk - first, 0)
    n_sup = jnp.where(ctx_lens > 0, n_sup, 0)
    offs = jnp.cumsum(n_sup)
    total = offs[-1] if S > 0 else jnp.int32(0)
    i = jnp.arange(WI, dtype=jnp.int32)
    s_of = jnp.searchsorted(offs, i, side="right").astype(jnp.int32)
    s_cl = jnp.minimum(s_of, S - 1)
    start = jnp.where(s_of > 0, offs[jnp.maximum(s_of - 1, 0)], 0)
    js = first[s_cl] + (i - start)
    flags = (
        jnp.where(i == start, 1, 0)
        | jnp.where(i == start + n_sup[s_cl] - 1, 2, 0)
    )
    work = jnp.stack([s_cl, js, flags]).astype(jnp.int32)
    return work, total.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "block_size", "interpret", "softcap", "return_state",
        "qrows",
    ),
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
    start=None,
    init_state=None,
    return_state: bool = False,
    qrows: int = 1,
):
    """Paged flash-decode. q (S, h, d) -> (S, h, d).

    k_cache/v_cache: plain (num_slots, kvh, d) arrays or QuantizedCache
    (int8 data + per-slot-per-head scales, dequantized in-kernel — the
    north-star "dequant fused into the flash-decode" path).

    `window` (may be a traced per-layer scalar — Gemma2's alternating
    sliding/full layers) bounds attention to the last `window` keys;
    out-of-window blocks are never fetched. `softcap` (static) applies
    tanh score capping in-kernel.

    Shared-prefix (two-phase) support: `start` (S,) int32 bounds each
    sequence's attention to keys at positions >= start[s] (blocks below
    it are never fetched); `init_state` = (acc0 (S,h,d) f32, ml0
    (S,2,h,128) f32) continues the online softmax from a prior partial
    pass; `return_state=True` additionally returns that state pair,
    UNNORMALIZED, for a later continuation. Composing a bounded pass
    over [0, L) (return_state) with a pass over [L, ctx) (start +
    init_state) is bit-equivalent to one full pass.

    `qrows > 1` (speculative-verify mode): q holds qrows CONSECUTIVE
    query rows per sequence (row i of seq s at q[s*qrows + i], position
    base+i); meta's per-row arrays are strided down to per-sequence
    inside (every row of a sequence shares its block table; ctx_lens of
    the LAST row bounds the work list) and ONE work item serves all of
    a sequence's rows — per-item cost and KV streaming divided by
    qrows. Mutually exclusive with start/init_state/return_state."""
    S, h, d = q.shape
    if qrows > 1:
        assert start is None and init_state is None and not return_state, (
            "qrows > 1 is incompatible with shared-prefix state threading"
        )
    k_data, kv_scale, quantized = _cache_parts(k_cache)
    v_data, _, _ = _cache_parts(v_cache)
    kvh = k_data.shape[1]
    lanes = kv_scale.shape[-1] if quantized else 128
    if not quantized:
        # dummy keeps one kernel signature; never DMA'd when !quantized
        kv_scale = jnp.ones((1, kvh, lanes), jnp.float32)
    W = meta.block_tables.shape[1]
    mblk = _pick_mblk(W, block_size)
    import os

    if os.environ.get("MINIVLLM_DECODE_MBLK"):  # A/B experiments only
        mblk = max(1, min(int(os.environ["MINIVLLM_DECODE_MBLK"]), W))
    win = jnp.asarray(window if window is not None else 1 << 30, jnp.int32)
    S_seq = S // qrows
    tables_seq = (
        meta.block_tables if qrows == 1
        else meta.block_tables[qrows - 1 :: qrows]
    )
    ctx_seq = (
        meta.ctx_lens if qrows == 1 else meta.ctx_lens[qrows - 1 :: qrows]
    )
    start_arr = (
        jnp.zeros((S_seq,), jnp.int32) if start is None
        else start.astype(jnp.int32)
    )
    # Work-list window floor: row r's window reaches down to
    # ctx_len - (qrows-1) + r - window; ctx_seq holds the LAST row's
    # bound, so build the list with the FIRST row's (lowest) floor —
    # window + (qrows-1) — or sliding-window models would never fetch
    # super-blocks holding keys only earlier verify rows attend to.
    # The kernel's per-row masks and interior check use the true `win`.
    list_win = win if qrows == 1 else win + (qrows - 1)
    work, n_work = _build_work_list(
        ctx_seq, list_win, block_size, W, mblk, start_tok=start_arr
    )
    carry = init_state is not None
    # W8A8 int8 MXU scores (int8-KV only): opt-in via env for A/B
    # measurement (see docs/performance.md "INT8 / FP8").
    int8_scores = (
        quantized
        and k_data.dtype == jnp.int8
        and os.environ.get("MINIVLLM_INT8_SCORES", "0") == "1"
    )
    kernel = functools.partial(
        _decode_kernel,
        block_size=block_size,
        num_kv_heads=kvh,
        scale=scale,
        max_blocks=W,
        quantized=quantized,
        softcap=softcap,
        mblk=mblk,
        carry=carry,
        return_state=return_state,
        int8_scores=int8_scores,
        # A/B kill-switch for the interior-pass mask skip.
        interior_skip=os.environ.get("MINIVLLM_MASK_SKIP", "1") != "0",
        qrows=qrows,
    )
    vmem = lambda shp: pl.BlockSpec(shp, lambda *_: (0,) * len(shp))  # noqa: E731
    in_specs = [
        vmem((S, h, d)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [q, k_data, v_data, kv_scale]
    if carry:
        acc0, ml0 = init_state
        in_specs += [vmem((S, h, d)), vmem((S, 2, h, 128))]
        inputs += [acc0, ml0]
    out_specs = vmem((S, h, d))
    out_shape = jax.ShapeDtypeStruct((S, h, d), q.dtype)
    if return_state:
        out_specs = (
            out_specs, vmem((S, h, d)), vmem((S, 2, h, 128))
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((S, h, d), jnp.float32),
            jax.ShapeDtypeStruct((S, 2, h, 128), jnp.float32),
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((NBUF, mblk * block_size, kvh, d), k_data.dtype),
            pltpu.VMEM((NBUF, mblk * block_size, kvh, d), v_data.dtype),
            pltpu.VMEM((NBUF, mblk, kvh, lanes), jnp.float32),
            pltpu.VMEM((qrows * h, d), jnp.float32),
            pltpu.VMEM((qrows * h, 128), jnp.float32),
            pltpu.VMEM((qrows * h, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, mblk, 3)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
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
        tables_seq.reshape(-1),
        ctx_seq,
        start_arr,
        jnp.stack(
            [
                jnp.asarray(base, jnp.int32),
                win,
                n_work,
            ]
        ),
        work,
        *inputs,
    )
    return out

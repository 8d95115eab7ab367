"""Pallas varlen prefill flash kernel vs the XLA oracle (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from minivllm_tpu.ops.attention import PrefillBatch, prefill_attention_xla, store_kv
from minivllm_tpu.ops.pallas import prefill_attention as ppre
from minivllm_tpu.ops.pallas.prefill_attention import Q_TILE

BS = 16  # kv block size


def build_aligned_case(rng, specs, kvh, h, d, num_blocks=64, dtype=jnp.float32,
                       quantized=False, BS=BS):
    """specs: list of (ctx_len, cached_len). Returns (q, kc, vc, meta).

    Mimics the runner's Q_TILE-aligned packing: seq s's new-token queries
    occupy rows [q_start[s], q_start[s] + q_len).
    """
    S = len(specs)
    slots_total = (num_blocks + 1) * BS
    trash_slot = num_blocks * BS
    from test_pallas_decode import _zero_cache
    kc = _zero_cache(slots_total, kvh, d, dtype, quantized, BS)
    vc = _zero_cache(slots_total, kvh, d, dtype, quantized, BS)
    q_lens = [c - p for c, p in specs]
    q_start, ofs = [], 0
    for ql in q_lens:
        q_start.append(ofs)
        ofs += -(-ql // Q_TILE) * Q_TILE
    T = max(ofs, Q_TILE)
    W = max(-(-c // BS) for c, _ in specs)
    tables = np.full((S, W), num_blocks, np.int32)
    q = np.zeros((T, h, d), np.float32)
    positions = np.zeros(T, np.int32)
    q_seg = np.full(T, -1, np.int32)
    slot_map = np.full(T, trash_slot, np.int32)
    nxt = 0
    ks, vs, qs = [], [], []
    for s, (ctx, cached) in enumerate(specs):
        nb = -(-ctx // BS)
        blocks = list(range(nxt, nxt + nb))
        nxt += nb
        tables[s, :nb] = blocks
        k = rng.standard_normal((ctx, kvh, d)).astype(np.float32)
        v = rng.standard_normal((ctx, kvh, d)).astype(np.float32)
        ks.append(k)
        vs.append(v)
        slots = np.array([blocks[i // BS] * BS + i % BS for i in range(ctx)], np.int32)
        kc, vc = store_kv(kc, vc, jnp.asarray(k, dtype), jnp.asarray(v, dtype),
                          jnp.asarray(slots))
        qv = rng.standard_normal((q_lens[s], h, d)).astype(np.float32)
        qs.append(qv)
        o = q_start[s]
        q[o : o + q_lens[s]] = qv
        positions[o : o + q_lens[s]] = np.arange(cached, ctx)
        q_seg[o : o + q_lens[s]] = s
        slot_map[o : o + q_lens[s]] = slots[cached:]
    # oracle context packing
    C = 1
    ctx_slots, k_seg, k_pos = [], [], []
    nxt = 0
    for s, (ctx, cached) in enumerate(specs):
        blocks = tables[s][tables[s] != num_blocks]
        ctx_slots += [int(blocks[i // BS]) * BS + i % BS for i in range(ctx)]
        k_seg += [s] * ctx
        k_pos += list(range(ctx))
    C = len(ctx_slots)
    meta = PrefillBatch(
        input_ids=jnp.zeros(T, jnp.int32),
        positions=jnp.asarray(positions),
        q_seg=jnp.asarray(q_seg),
        slot_mapping=jnp.asarray(slot_map),
        ctx_slot_mapping=jnp.asarray(np.array(ctx_slots, np.int32)),
        k_seg=jnp.asarray(np.array(k_seg, np.int32)),
        k_pos=jnp.asarray(np.array(k_pos, np.int32)),
        last_token_idx=jnp.asarray(
            np.array([q_start[s] + q_lens[s] - 1 for s in range(S)], np.int32)
        ),
        block_tables=jnp.asarray(tables),
        ctx_lens=jnp.asarray(np.array([c for c, _ in specs], np.int32)),
        q_start=jnp.asarray(np.array(q_start, np.int32)),
        q_lens=jnp.asarray(np.array(q_lens, np.int32)),
    )
    return jnp.asarray(q, dtype), kc, vc, meta


@pytest.mark.parametrize(
    "specs,kvh,h",
    [
        ([(33, 0), (7, 0)], 2, 4),          # fresh prefills, ragged
        ([(80, 64), (20, 0)], 2, 4),        # prefix-cache hit (64 cached)
        ([(130, 0)], 4, 8),                 # multi-tile single seq
        ([(5, 0), (65, 32), (9, 0)], 1, 2), # mixed cached offsets
    ],
)
def test_matches_oracle(specs, kvh, h):
    rng = np.random.default_rng(0)
    d = 128
    q, kc, vc, meta = build_aligned_case(rng, specs, kvh, h, d)
    ref = np.asarray(prefill_attention_xla(q, kc, vc, meta, 0.1))
    out = np.asarray(ppre.prefill_attention(q, kc, vc, meta, 0.1, BS, interpret=True))
    valid = np.asarray(meta.q_seg) >= 0
    np.testing.assert_allclose(out[valid], ref[valid], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_large_block_size_matches_oracle(quant):
    """block_size 128 (serving-bench setting): the span cap drops the
    super-block to 4 sub-blocks of 128 and widens the scale slabs."""
    rng = np.random.default_rng(9)
    q, kc, vc, meta = build_aligned_case(
        rng, [(300, 256), (70, 0)], 2, 4, 128, num_blocks=8,
        quantized=quant, BS=128
    )
    ref = np.asarray(prefill_attention_xla(q, kc, vc, meta, 0.125))
    out = np.asarray(
        ppre.prefill_attention(q, kc, vc, meta, 0.125, 128, interpret=True)
    )
    valid = np.asarray(meta.q_seg) >= 0
    np.testing.assert_allclose(out[valid], ref[valid], rtol=3e-5, atol=3e-5)


def test_bf16():
    rng = np.random.default_rng(1)
    q, kc, vc, meta = build_aligned_case(
        rng, [(70, 16), (40, 0)], 2, 4, 128, dtype=jnp.bfloat16
    )
    ref = np.asarray(prefill_attention_xla(q, kc, vc, meta, 0.1), np.float32)
    out = np.asarray(
        ppre.prefill_attention(q, kc, vc, meta, 0.1, BS, interpret=True), np.float32
    )
    valid = np.asarray(meta.q_seg) >= 0
    np.testing.assert_allclose(out[valid], ref[valid], rtol=3e-2, atol=3e-2)


def test_qk_bf16_operands_match_fp32_path(monkeypatch):
    """MINIVLLM_PREFILL_QK_BF16=1 (bf16/int8 caches only): the QK dot
    runs bf16 x bf16 on the MXU with fp32 accumulation. For
    bf16-sourced inputs this is LOSSLESS up to fp32 summation order
    (bf16 products are exact in fp32), so the output must track the
    fp32-operand kernel tightly — far tighter than bf16 storage noise."""
    rng = np.random.default_rng(9)
    q, kc, vc, meta = build_aligned_case(
        rng, [(70, 16), (40, 0)], 2, 4, 128, dtype=jnp.bfloat16
    )
    ref = np.asarray(
        ppre.prefill_attention(q, kc, vc, meta, 0.1, BS, interpret=True),
        np.float32,
    )
    monkeypatch.setenv("MINIVLLM_PREFILL_QK_BF16", "1")
    ppre.prefill_attention.clear_cache()
    out = np.asarray(
        ppre.prefill_attention(q, kc, vc, meta, 0.1, BS, interpret=True),
        np.float32,
    )
    monkeypatch.delenv("MINIVLLM_PREFILL_QK_BF16")
    ppre.prefill_attention.clear_cache()
    valid = np.asarray(meta.q_seg) >= 0
    np.testing.assert_allclose(out[valid], ref[valid], rtol=2e-3, atol=2e-3)


def test_quantized_cache_matches_oracle():
    """INT8 QuantizedCache through the varlen prefill kernel (in-VMEM
    dequant) vs the oracle."""
    rng = np.random.default_rng(5)
    q, kc, vc, meta = build_aligned_case(
        rng, [(80, 64), (20, 0)], 2, 4, 128, quantized=True
    )
    ref = np.asarray(prefill_attention_xla(q, kc, vc, meta, 0.125))
    out = np.asarray(
        ppre.prefill_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    )
    # Padding rows are don't-care (oracle and kernel fill them from
    # different trash-slot reads under quantization); compare the rows the
    # engine consumes.
    valid = np.asarray(meta.q_seg) >= 0
    np.testing.assert_allclose(out[valid], ref[valid], atol=3e-5, rtol=3e-5)


def test_int8_mxu_scores_accuracy(monkeypatch):
    """MINIVLLM_INT8_SCORES=1 (int8-KV only): per-(row, head) q
    quantization + int8 x int8 MXU scores in the prefill kernel. Error
    is bounded by q's quantization step; outputs stay within ~1% of the
    fp32-score quantized path."""
    rng = np.random.default_rng(9)
    q, kc, vc, meta = build_aligned_case(
        rng, [(100, 0), (70, 64), (20, 0)], 2, 8, 128, quantized=True
    )
    ref = np.asarray(
        ppre.prefill_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    )
    monkeypatch.setenv("MINIVLLM_INT8_SCORES", "1")
    ppre.prefill_attention.clear_cache()
    out = np.asarray(
        ppre.prefill_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    )
    monkeypatch.delenv("MINIVLLM_INT8_SCORES")
    ppre.prefill_attention.clear_cache()
    valid = np.asarray(meta.q_seg) >= 0
    np.testing.assert_allclose(out[valid], ref[valid], rtol=0.05, atol=0.04)
    a = out[valid].reshape(valid.sum(), -1)
    b = ref[valid].reshape(valid.sum(), -1)
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    )
    assert cos.min() > 0.999, cos


@pytest.mark.parametrize("window", [8, 40, 1 << 30])
def test_sliding_window_matches_oracle(window):
    """Sliding-window prefill (Gemma2/Mistral): blocks below each tile's
    window are skipped by the kernel; the oracle masks them."""
    rng = np.random.default_rng(8)
    specs = [(90, 64), (33, 0)]  # prefix-cache hit + fresh, multi-block
    q, kc, vc, meta = build_aligned_case(rng, specs, 2, 4, 128)
    ref = np.asarray(
        prefill_attention_xla(q, kc, vc, meta, 0.1, window=window)
    )
    out = np.asarray(
        ppre.prefill_attention(
            q, kc, vc, meta, 0.1, BS, window=jnp.int32(window), interpret=True
        )
    )
    valid = np.asarray(meta.q_seg) >= 0
    np.testing.assert_allclose(out[valid], ref[valid], rtol=2e-5, atol=2e-5)


def test_softcap_matches_oracle():
    rng = np.random.default_rng(9)
    q, kc, vc, meta = build_aligned_case(rng, [(70, 0)], 2, 4, 128)
    ref = np.asarray(prefill_attention_xla(q, kc, vc, meta, 0.1, softcap=50.0))
    out = np.asarray(
        ppre.prefill_attention(q, kc, vc, meta, 0.1, BS, softcap=50.0,
                               interpret=True)
    )
    valid = np.asarray(meta.q_seg) >= 0
    np.testing.assert_allclose(out[valid], ref[valid], rtol=2e-5, atol=2e-5)

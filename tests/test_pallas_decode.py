"""Pallas paged flash-decode kernel vs the XLA oracle (interpret mode on
CPU — the tier-2 strategy from SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from minivllm_tpu.ops.attention import DecodeBatch, decode_attention_xla, store_kv
from minivllm_tpu.ops.pallas import decode_attention as pdec

BS = 16


def _zero_cache(slots_total, kvh, d, dtype, quantized, bs=BS):
    if quantized:
        from minivllm_tpu.ops.attention import make_quantized_cache

        return make_quantized_cache(slots_total, kvh, d, bs)
    return jnp.zeros((slots_total, kvh, d), dtype)


def build_case(rng, ctx_lens, kvh, h, d, num_blocks=32, dtype=jnp.float32,
               quantized=False, BS=BS):
    S = len(ctx_lens)
    W = max(1, -(-max(ctx_lens) // BS))
    slots_total = (num_blocks + 1) * BS
    kc = _zero_cache(slots_total, kvh, d, dtype, quantized, BS)
    vc = _zero_cache(slots_total, kvh, d, dtype, quantized, BS)
    tables = np.full((S, W), num_blocks, np.int32)
    nxt = 0
    for s, L in enumerate(ctx_lens):
        if L == 0:
            continue
        nb = -(-L // BS)
        blocks = list(range(nxt, nxt + nb))
        nxt += nb
        tables[s, :nb] = blocks
        slots = np.array([blocks[i // BS] * BS + i % BS for i in range(L)], np.int32)
        k = rng.standard_normal((L, kvh, d)).astype(np.float32)
        v = rng.standard_normal((L, kvh, d)).astype(np.float32)
        kc, vc = store_kv(kc, vc, jnp.asarray(k, dtype), jnp.asarray(v, dtype), jnp.asarray(slots))
    q = jnp.asarray(rng.standard_normal((S, h, d)).astype(np.float32), dtype)
    meta = DecodeBatch(
        input_ids=jnp.zeros(S, jnp.int32),
        positions=jnp.maximum(jnp.asarray(np.array(ctx_lens, np.int32)) - 1, 0),
        slot_mapping=jnp.zeros(S, jnp.int32),
        block_tables=jnp.asarray(tables),
        ctx_lens=jnp.asarray(np.array(ctx_lens, np.int32)),
    )
    return q, kc, vc, meta


@pytest.mark.parametrize(
    "ctx_lens,kvh,h",
    [
        ([17, 33, 5], 2, 4),     # GQA g=2, mixed partial blocks
        ([16, 64], 4, 4),        # exact block multiples, MHA
        ([1], 1, 8),             # single token context, g=8
        ([40, 0, 23, 7], 2, 8),  # padding row with ctx_len=0
        ([150, 40, 200], 2, 4),  # W>8 -> wide (mblk=8) super-blocks
    ],
)
def test_matches_oracle(ctx_lens, kvh, h):
    rng = np.random.default_rng(0)
    d = 128
    q, kc, vc, meta = build_case(rng, ctx_lens, kvh, h, d)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS)
    out = pdec.decode_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("quant", [False, True])
def test_large_block_size_matches_oracle(quant):
    """block_size 128 (the serving-bench setting: fewer, fatter DMAs)
    exercises the span cap and the wide lane-padded scale slabs."""
    rng = np.random.default_rng(4)
    bs, d = 128, 128
    q, kc, vc, meta = build_case(
        rng, [300, 70, 129], 2, 4, d, num_blocks=8, quantized=quant, BS=bs
    )
    from minivllm_tpu.ops.attention import decode_attention_xla as oracle
    ref = oracle(q, kc, vc, meta, 0.125, bs)
    out = pdec.decode_attention(q, kc, vc, meta, 0.125, bs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_int8_mxu_scores_accuracy(monkeypatch):
    """MINIVLLM_INT8_SCORES=1 (int8-KV only): q quantizes per (row,
    head) to int8 and q.k runs int8 x int8 -> int32 on the MXU. The
    added error is bounded by q's 1/254 relative quantization step;
    the output must stay within ~1% of the fp32-score quantized path
    and direction-aligned with it (cosine > 0.999 per row)."""
    rng = np.random.default_rng(7)
    q, kc, vc, meta = build_case(
        rng, [300, 70, 129, 17], 2, 8, 128, num_blocks=16, quantized=True
    )
    ref = np.asarray(
        pdec.decode_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    )
    monkeypatch.setenv("MINIVLLM_INT8_SCORES", "1")
    pdec.decode_attention.clear_cache()
    out = np.asarray(
        pdec.decode_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    )
    monkeypatch.delenv("MINIVLLM_INT8_SCORES")
    pdec.decode_attention.clear_cache()
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.04)
    a = out.reshape(out.shape[0], -1)
    b = ref.reshape(ref.shape[0], -1)
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    )
    assert cos.min() > 0.999, cos


@pytest.mark.parametrize("quant", [False, True])
def test_multi_row_verify_items_match_per_row(quant):
    """qrows > 1 (speculative multi-row verify): one work item serves a
    sequence's qrows consecutive query rows with per-row causal bounds.
    Must be IDENTICAL to running the same rows as qrows separate
    sequences (the per-row reference), incl. sub-block contexts and
    quantized caches."""
    from minivllm_tpu.ops.attention import make_quantized_cache

    rng = np.random.default_rng(11)
    kvh, h, d, K1 = 2, 4, 128, 5
    ctx_last = [67, 33, 18, 130]  # bound of the LAST row per seq
    S = len(ctx_last)
    num_blocks = 64
    slots_total = (num_blocks + 1) * BS
    if quant:
        kc = make_quantized_cache(slots_total, kvh, d, BS)
        vc = make_quantized_cache(slots_total, kvh, d, BS)
    else:
        kc = jnp.zeros((slots_total, kvh, d), jnp.float32)
        vc = jnp.zeros_like(kc)
    W = max(1, -(-max(ctx_last) // BS))
    tables = np.full((S, W), num_blocks, np.int32)
    nxt = 0
    for s, L in enumerate(ctx_last):
        nb = -(-L // BS)
        tables[s, :nb] = range(nxt, nxt + nb)
        nxt += nb
        slots = np.array(
            [tables[s, i // BS] * BS + i % BS for i in range(L)], np.int32
        )
        k = rng.standard_normal((L, kvh, d)).astype(np.float32)
        v = rng.standard_normal((L, kvh, d)).astype(np.float32)
        kc, vc = store_kv(
            kc, vc, jnp.asarray(k), jnp.asarray(v), jnp.asarray(slots)
        )
    q = jnp.asarray(rng.standard_normal((S * K1, h, d)).astype(np.float32))
    ctx_rows = np.array(
        [[L - (K1 - 1) + i for i in range(K1)] for L in ctx_last], np.int32
    ).reshape(-1)
    meta_rows = DecodeBatch(
        input_ids=jnp.zeros(S * K1, jnp.int32),
        positions=jnp.asarray(ctx_rows - 1),
        slot_mapping=jnp.zeros(S * K1, jnp.int32),
        block_tables=jnp.asarray(np.repeat(tables, K1, axis=0)),
        ctx_lens=jnp.asarray(ctx_rows),
    )
    ref = np.asarray(
        pdec.decode_attention(q, kc, vc, meta_rows, 0.125, BS, interpret=True)
    )
    out = np.asarray(
        pdec.decode_attention(
            q, kc, vc, meta_rows, 0.125, BS, interpret=True, qrows=K1
        )
    )
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)


def test_multi_row_verify_sliding_window_straddles_super_block():
    """qrows > 1 + sliding window: the work list is built from the LAST
    verify row's ctx_lens, but row r's window floor is
    ctx - (qrows-1) + r - window — up to qrows-1 keys LOWER. With ctx
    128, window 64, qrows 5 (BS 16, mblk 4 -> 64-key super-blocks) the
    last row's floor (64) lands in super-block 1 while rows 0-3 still
    attend keys 60-63 in super-block 0: the list must fetch it (the
    regression dropped those keys silently for sliding-window models
    under fused speculation)."""
    from minivllm_tpu.ops.attention import make_quantized_cache  # noqa: F401

    rng = np.random.default_rng(13)
    kvh, h, d, K1, window = 2, 4, 128, 5, 64
    ctx_last = [128, 80]  # 128 straddles; 80's floor stays in sb 0
    S = len(ctx_last)
    num_blocks = 64
    slots_total = (num_blocks + 1) * BS
    kc = jnp.zeros((slots_total, kvh, d), jnp.float32)
    vc = jnp.zeros_like(kc)
    W = max(1, -(-max(ctx_last) // BS))
    tables = np.full((S, W), num_blocks, np.int32)
    nxt = 0
    for s, L in enumerate(ctx_last):
        nb = -(-L // BS)
        tables[s, :nb] = range(nxt, nxt + nb)
        nxt += nb
        slots = np.array(
            [tables[s, i // BS] * BS + i % BS for i in range(L)], np.int32
        )
        k = rng.standard_normal((L, kvh, d)).astype(np.float32)
        v = rng.standard_normal((L, kvh, d)).astype(np.float32)
        kc, vc = store_kv(
            kc, vc, jnp.asarray(k), jnp.asarray(v), jnp.asarray(slots)
        )
    q = jnp.asarray(rng.standard_normal((S * K1, h, d)).astype(np.float32))
    ctx_rows = np.array(
        [[L - (K1 - 1) + i for i in range(K1)] for L in ctx_last], np.int32
    ).reshape(-1)
    meta_rows = DecodeBatch(
        input_ids=jnp.zeros(S * K1, jnp.int32),
        positions=jnp.asarray(ctx_rows - 1),
        slot_mapping=jnp.zeros(S * K1, jnp.int32),
        block_tables=jnp.asarray(np.repeat(tables, K1, axis=0)),
        ctx_lens=jnp.asarray(ctx_rows),
    )
    ref = np.asarray(
        pdec.decode_attention(
            q, kc, vc, meta_rows, 0.125, BS,
            window=jnp.int32(window), interpret=True,
        )
    )
    out = np.asarray(
        pdec.decode_attention(
            q, kc, vc, meta_rows, 0.125, BS,
            window=jnp.int32(window), interpret=True, qrows=K1,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=3e-5)


def test_bf16_cache():
    rng = np.random.default_rng(1)
    q, kc, vc, meta = build_case(rng, [29, 50], 2, 4, 128, dtype=jnp.bfloat16)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS)
    out = pdec.decode_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_is_supported_gates():
    q = jnp.zeros((2, 4, 64))
    kc = jnp.zeros((32, 2, 64))
    assert not pdec.is_supported(q, kc)  # d=64 not 128-aligned
    q = jnp.zeros((2, 4, 128))
    kc = jnp.zeros((32, 2, 128))
    assert pdec.is_supported(q, kc)


def test_quantized_cache_matches_oracle():
    """INT8 QuantizedCache: the kernel DMAs the per-slot scale slabs and
    dequantizes in VMEM — output must equal the oracle's cache_gather
    dequant exactly (same fp32 math, same values)."""
    rng = np.random.default_rng(3)
    q, kc, vc, meta = build_case(rng, [17, 33, 5, 0], 2, 4, 128, quantized=True)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS)
    out = pdec.decode_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # W>8 exercises the wide (mblk=8) super-block path with scale slabs
    q, kc, vc, meta = build_case(rng, [150, 77], 2, 4, 128, quantized=True)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS)
    out = pdec.decode_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_quantized_is_supported():
    from minivllm_tpu.ops.attention import make_quantized_cache

    q = jnp.zeros((2, 4, 128))
    qc = make_quantized_cache(64, 2, 128, BS)
    assert pdec.is_supported(q, qc, BS)


@pytest.mark.parametrize("window", [8, 24, 1 << 30])
def test_sliding_window_matches_oracle(window):
    """Gemma2 sliding-window path: out-of-window blocks are skipped by the
    kernel; the oracle masks them. Both must agree for windows smaller
    than, comparable to, and larger than the contexts."""
    rng = np.random.default_rng(5)
    q, kc, vc, meta = build_case(rng, [40, 7, 33], 2, 4, 128)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS, window=window)
    out = pdec.decode_attention(
        q, kc, vc, meta, 0.125, BS, window=jnp.int32(window), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_softcap_matches_oracle():
    rng = np.random.default_rng(6)
    q, kc, vc, meta = build_case(rng, [21, 48], 2, 4, 128)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS, softcap=50.0)
    out = pdec.decode_attention(
        q, kc, vc, meta, 0.125, BS, softcap=50.0, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_window_and_softcap_quantized():
    rng = np.random.default_rng(7)
    q, kc, vc, meta = build_case(rng, [40, 19], 2, 4, 128, quantized=True)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS, window=16, softcap=30.0)
    out = pdec.decode_attention(
        q, kc, vc, meta, 0.125, BS,
        window=jnp.int32(16), softcap=30.0, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-2
    )


def test_two_phase_composition_matches_full():
    """Shared-prefix machinery: a bounded pass over [0, L) with
    return_state composed with a pass over [L, ctx) via start+init_state
    must equal one full pass (same online-softmax trajectory)."""
    rng = np.random.default_rng(9)
    q, kc, vc, meta = build_case(rng, [40, 23, 0], 2, 4, 128)
    full = pdec.decode_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    L = 16  # one full block boundary
    meta1 = meta._replace(
        ctx_lens=jnp.minimum(meta.ctx_lens, L)
    )
    _, acc1, ml1 = pdec.decode_attention(
        q, kc, vc, meta1, 0.125, BS, interpret=True, return_state=True
    )
    out2 = pdec.decode_attention(
        q, kc, vc, meta, 0.125, BS, interpret=True,
        start=jnp.where(meta.ctx_lens > 0, L, 0),
        init_state=(acc1, ml1),
    )
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(full), rtol=2e-5, atol=2e-5
    )


def test_two_phase_quantized_and_wide():
    """Composition holds for the quantized cache and the wide (mblk=8)
    work-list path, with a 64-token shared region."""
    rng = np.random.default_rng(10)
    q, kc, vc, meta = build_case(rng, [150, 77], 2, 4, 128, quantized=True)
    full = pdec.decode_attention(q, kc, vc, meta, 0.125, BS, interpret=True)
    L = 64
    meta1 = meta._replace(ctx_lens=jnp.minimum(meta.ctx_lens, L))
    _, acc1, ml1 = pdec.decode_attention(
        q, kc, vc, meta1, 0.125, BS, interpret=True, return_state=True
    )
    out2 = pdec.decode_attention(
        q, kc, vc, meta, 0.125, BS, interpret=True,
        start=jnp.full((2,), L, jnp.int32),
        init_state=(acc1, ml1),
    )
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(full), rtol=2e-5, atol=2e-5
    )

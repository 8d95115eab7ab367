"""Paged-attention oracle vs dense SDPA reference
(reference analog: tests/test_page_attention.py:14-363)."""

import numpy as np
import jax.numpy as jnp
import pytest

from minivllm_tpu.ops.attention import (
    DecodeBatch,
    PrefillBatch,
    decode_attention_xla,
    prefill_attention_xla,
    store_kv,
)

BS = 4  # block size


def dense_attention(q, k, v, scale, causal_offset=None):
    """Reference dense attention. q (Tq, h, d), k/v (Tk, kvh, d)."""
    h, kvh = q.shape[1], k.shape[1]
    rep = h // kvh
    k = np.repeat(k, rep, axis=1)
    v = np.repeat(v, rep, axis=1)
    scores = np.einsum("qhd,khd->hqk", q.astype(np.float64), k.astype(np.float64)) * scale
    if causal_offset is not None:
        Tq, Tk = q.shape[0], k.shape[0]
        qpos = np.arange(Tq) + causal_offset
        mask = np.arange(Tk)[None, :] <= qpos[:, None]
        scores = np.where(mask[None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hqk,khd->qhd", p, v.astype(np.float64))


def build_cache(num_blocks, kvh, d, dtype=jnp.float32):
    slots = (num_blocks + 1) * BS
    return (
        jnp.zeros((slots, kvh, d), dtype),
        jnp.zeros((slots, kvh, d), dtype),
    )


class TestDecode:
    @pytest.mark.parametrize("kvh,h", [(2, 2), (2, 4), (1, 8)])
    def test_matches_dense(self, kvh, h):
        rng = np.random.default_rng(0)
        d = 16
        ctx_lens = [7, 3, 11]
        S = len(ctx_lens)
        W = 3  # max blocks
        kc, vc = build_cache(num_blocks=16, kvh=kvh, d=d)
        trash_block = 16
        block_tables = np.full((S, W), trash_block, np.int32)
        ks, vs, qs = [], [], []
        next_block = 0
        for s, L in enumerate(ctx_lens):
            k = rng.standard_normal((L, kvh, d), np.float32)
            v = rng.standard_normal((L, kvh, d), np.float32)
            ks.append(k)
            vs.append(v)
            qs.append(rng.standard_normal((h, d), np.float32))
            # scatter into cache via per-token slots
            nb = (L + BS - 1) // BS
            blocks = list(range(next_block, next_block + nb))
            next_block += nb
            block_tables[s, :nb] = blocks
            slots = np.array(
                [blocks[i // BS] * BS + i % BS for i in range(L)], np.int32
            )
            kc, vc = store_kv(kc, vc, jnp.asarray(k), jnp.asarray(v), jnp.asarray(slots))
        q = jnp.asarray(np.stack(qs))
        meta = DecodeBatch(
            input_ids=jnp.zeros(S, jnp.int32),
            positions=jnp.asarray(np.array(ctx_lens, np.int32) - 1),
            slot_mapping=jnp.zeros(S, jnp.int32),
            block_tables=jnp.asarray(block_tables),
            ctx_lens=jnp.asarray(np.array(ctx_lens, np.int32)),
        )
        out = np.asarray(decode_attention_xla(q, kc, vc, meta, 0.25, BS))
        for s, L in enumerate(ctx_lens):
            ref = dense_attention(qs[s][None], ks[s], vs[s], 0.25)[0]
            np.testing.assert_allclose(out[s], ref, rtol=1e-5, atol=1e-5)

    def test_padded_rows_are_finite(self):
        kc, vc = build_cache(4, 2, 8)
        S = 4
        meta = DecodeBatch(
            input_ids=jnp.zeros(S, jnp.int32),
            positions=jnp.zeros(S, jnp.int32),
            slot_mapping=jnp.full((S,), 4 * BS, jnp.int32),
            block_tables=jnp.full((S, 2), 4, jnp.int32),
            ctx_lens=jnp.zeros(S, jnp.int32),  # fully masked rows
        )
        q = jnp.ones((S, 4, 8))
        out = decode_attention_xla(q, kc, vc, meta, 1.0, BS)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestPrefill:
    def test_packed_varlen_matches_dense(self):
        """Two fresh sequences packed together, no cached prefix."""
        rng = np.random.default_rng(1)
        kvh, h, d = 2, 4, 16
        lens = [5, 9]
        T = sum(lens)
        kc, vc = build_cache(8, kvh, d)
        trash = 8 * BS
        q_all, k_all, v_all = [], [], []
        q_seg, q_pos, slots = [], [], []
        next_block = 0
        for s, L in enumerate(lens):
            q_all.append(rng.standard_normal((L, h, d), np.float32))
            k_all.append(rng.standard_normal((L, kvh, d), np.float32))
            v_all.append(rng.standard_normal((L, kvh, d), np.float32))
            nb = (L + BS - 1) // BS
            blocks = list(range(next_block, next_block + nb))
            next_block += nb
            q_seg += [s] * L
            q_pos += list(range(L))
            slots += [blocks[i // BS] * BS + i % BS for i in range(L)]
        q = jnp.asarray(np.concatenate(q_all))
        k = jnp.asarray(np.concatenate(k_all))
        v = jnp.asarray(np.concatenate(v_all))
        slots = jnp.asarray(np.array(slots, np.int32))
        kc, vc = store_kv(kc, vc, k, v, slots)
        # context = the same packed tokens (no cached prefix)
        meta = PrefillBatch(
            input_ids=jnp.zeros(T, jnp.int32),
            positions=jnp.asarray(np.array(q_pos, np.int32)),
            q_seg=jnp.asarray(np.array(q_seg, np.int32)),
            slot_mapping=slots,
            ctx_slot_mapping=slots,
            k_seg=jnp.asarray(np.array(q_seg, np.int32)),
            k_pos=jnp.asarray(np.array(q_pos, np.int32)),
            last_token_idx=jnp.asarray(np.array([4, 13], np.int32)),
            block_tables=jnp.zeros((2, 3), jnp.int32),
            ctx_lens=jnp.asarray(np.array(lens, np.int32)),
            q_start=jnp.asarray(np.array([0, lens[0]], np.int32)),
            q_lens=jnp.asarray(np.array(lens, np.int32)),
        )
        out = np.asarray(prefill_attention_xla(q, kc, vc, meta, 0.25))
        ofs = 0
        for s, L in enumerate(lens):
            ref = dense_attention(q_all[s], k_all[s], v_all[s], 0.25, causal_offset=0)
            np.testing.assert_allclose(out[ofs : ofs + L], ref, rtol=1e-5, atol=1e-5)
            ofs += L

    def test_prefix_cached_context(self):
        """New tokens attend to previously cached prefix KV."""
        rng = np.random.default_rng(2)
        kvh, h, d = 2, 4, 16
        P, N = 4, 3  # cached prefix len (1 block), new tokens
        kc, vc = build_cache(8, kvh, d)
        k_prefix = rng.standard_normal((P, kvh, d), np.float32)
        v_prefix = rng.standard_normal((P, kvh, d), np.float32)
        pre_slots = jnp.asarray(np.arange(P, dtype=np.int32))  # block 0
        kc, vc = store_kv(kc, vc, jnp.asarray(k_prefix), jnp.asarray(v_prefix), pre_slots)
        q_new = rng.standard_normal((N, h, d), np.float32)
        k_new = rng.standard_normal((N, kvh, d), np.float32)
        v_new = rng.standard_normal((N, kvh, d), np.float32)
        new_slots = jnp.asarray(np.array([BS, BS + 1, BS + 2], np.int32))  # block 1
        kc, vc = store_kv(kc, vc, jnp.asarray(k_new), jnp.asarray(v_new), new_slots)
        C = P + N
        meta = PrefillBatch(
            input_ids=jnp.zeros(N, jnp.int32),
            positions=jnp.asarray(np.arange(P, P + N, dtype=np.int32)),
            q_seg=jnp.zeros(N, jnp.int32),
            slot_mapping=new_slots,
            ctx_slot_mapping=jnp.asarray(
                np.concatenate([np.arange(P), np.array([BS, BS + 1, BS + 2])]).astype(np.int32)
            ),
            k_seg=jnp.zeros(C, jnp.int32),
            k_pos=jnp.asarray(np.arange(C, dtype=np.int32)),
            last_token_idx=jnp.asarray(np.array([N - 1], np.int32)),
            block_tables=jnp.zeros((1, 2), jnp.int32),
            ctx_lens=jnp.asarray(np.array([C], np.int32)),
            q_start=jnp.zeros(1, jnp.int32),
            q_lens=jnp.asarray(np.array([N], np.int32)),
        )
        q = jnp.asarray(q_new)
        out = np.asarray(prefill_attention_xla(q, kc, vc, meta, 0.25))
        k_full = np.concatenate([k_prefix, k_new])
        v_full = np.concatenate([v_prefix, v_new])
        ref = dense_attention(q_new, k_full, v_full, 0.25, causal_offset=P)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_padding_isolation(self):
        """Padded q/k lanes (seg -1 / -2) never mix with real tokens."""
        rng = np.random.default_rng(3)
        kvh, h, d = 1, 2, 8
        L = 3
        kc, vc = build_cache(4, kvh, d)
        k = rng.standard_normal((L, kvh, d), np.float32)
        v = rng.standard_normal((L, kvh, d), np.float32)
        qv = rng.standard_normal((L, h, d), np.float32)
        slots = jnp.asarray(np.arange(L, dtype=np.int32))
        kc, vc = store_kv(kc, vc, jnp.asarray(k), jnp.asarray(v), slots)
        T, C = 6, 8  # padded buckets
        trash = 4 * BS
        pad_t = np.full(T - L, trash, np.int32)
        meta = PrefillBatch(
            input_ids=jnp.zeros(T, jnp.int32),
            positions=jnp.asarray(np.concatenate([np.arange(L), np.zeros(T - L)]).astype(np.int32)),
            q_seg=jnp.asarray(np.concatenate([np.zeros(L), -np.ones(T - L)]).astype(np.int32)),
            slot_mapping=jnp.asarray(np.concatenate([np.arange(L, dtype=np.int32), pad_t])),
            ctx_slot_mapping=jnp.asarray(
                np.concatenate([np.arange(L, dtype=np.int32), np.full(C - L, trash, np.int32)])
            ),
            k_seg=jnp.asarray(np.concatenate([np.zeros(L), -2 * np.ones(C - L)]).astype(np.int32)),
            k_pos=jnp.zeros(C, jnp.int32).at[:L].set(jnp.arange(L, dtype=jnp.int32)),
            last_token_idx=jnp.asarray(np.array([L - 1], np.int32)),
            block_tables=jnp.zeros((1, 1), jnp.int32),
            ctx_lens=jnp.asarray(np.array([L], np.int32)),
            q_start=jnp.zeros(1, jnp.int32),
            q_lens=jnp.asarray(np.array([L], np.int32)),
        )
        q_padded = jnp.asarray(np.concatenate([qv, np.ones((T - L, h, d), np.float32)]))
        out = np.asarray(prefill_attention_xla(q_padded, kc, vc, meta, 0.3))
        ref = dense_attention(qv, k, v, 0.3, causal_offset=0)
        np.testing.assert_allclose(out[:L], ref, rtol=1e-5, atol=1e-5)
        assert np.isfinite(out).all()

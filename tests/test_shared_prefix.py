"""Shared-prefix (two-phase / PAT-style) decode attention.

Sequences sharing a block-aligned prefix stream those KV blocks once
per group (phase 1, member queries stacked into the head axis) and
finish their tails individually (phase 2, online-softmax continuation).
Verified against the ordinary full-attention paths in interpret mode.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.llm import LLM
from minivllm_tpu.ops.attention import (
    DecodeBatch,
    decode_attention_xla,
    make_quantized_cache,
    store_kv,
)
from minivllm_tpu.ops.backend import PallasAttentionBackend
from minivllm_tpu.utils.testing import make_tiny_checkpoint

BS = 16


def build_shared_case(rng, tails, kvh, h, d, shared_blocks=2,
                      quantized=False, extra_lone=None):
    """Sequences sharing `shared_blocks` prefix blocks + per-seq tails.
    `extra_lone` appends an ungrouped sequence of that context length."""
    ctx_lens = [shared_blocks * BS + t for t in tails]
    if extra_lone:
        ctx_lens.append(extra_lone)
    S = len(ctx_lens)
    W = max(1, -(-max(ctx_lens) // BS))
    num_blocks = 64
    slots_total = (num_blocks + 1) * BS
    if quantized:
        kc = make_quantized_cache(slots_total, kvh, d, BS)
        vc = make_quantized_cache(slots_total, kvh, d, BS)
    else:
        kc = jnp.zeros((slots_total, kvh, d), jnp.float32)
        vc = jnp.zeros_like(kc)
    shared = list(range(shared_blocks))
    # shared-prefix KV written once
    L = shared_blocks * BS
    slots = np.arange(L, dtype=np.int32)
    k = rng.standard_normal((L, kvh, d)).astype(np.float32)
    v = rng.standard_normal((L, kvh, d)).astype(np.float32)
    kc, vc = store_kv(kc, vc, jnp.asarray(k), jnp.asarray(v), jnp.asarray(slots))
    tables = np.full((S, W), num_blocks, np.int32)
    nxt = shared_blocks
    n_grouped = len(tails)
    for s in range(S):
        ctx = ctx_lens[s]
        if s < n_grouped:
            table = list(shared)
            start = L
        else:  # lone sequence: no shared blocks
            table = []
            start = 0
        nb = -(-ctx // BS)
        while len(table) < nb:
            table.append(nxt)
            nxt += 1
        tables[s, :nb] = table
        tail = ctx - start
        if tail > 0:
            tslots = np.array(
                [table[i // BS] * BS + i % BS for i in range(start, ctx)],
                np.int32,
            )
            tk = rng.standard_normal((tail, kvh, d)).astype(np.float32)
            tv = rng.standard_normal((tail, kvh, d)).astype(np.float32)
            kc, vc = store_kv(
                kc, vc, jnp.asarray(tk), jnp.asarray(tv), jnp.asarray(tslots)
            )
    q = jnp.asarray(rng.standard_normal((S, h, d)).astype(np.float32))
    seq_start = np.zeros((S,), np.int32)
    seq_start[:n_grouped] = L
    member = np.full((1, max(2, n_grouped)), -1, np.int32)
    member[0, :n_grouped] = np.arange(n_grouped)
    meta = DecodeBatch(
        input_ids=jnp.zeros(S, jnp.int32),
        positions=jnp.asarray(np.array(ctx_lens, np.int32)) - 1,
        slot_mapping=jnp.zeros(S, jnp.int32),
        block_tables=jnp.asarray(tables),
        ctx_lens=jnp.asarray(np.array(ctx_lens, np.int32)),
        seq_start=jnp.asarray(seq_start),
        group_member=jnp.asarray(member),
        group_tables=jnp.asarray(np.array([shared], np.int32)),
        group_ctx=jnp.asarray(np.array([L], np.int32)),
    )
    return q, kc, vc, meta


@pytest.mark.parametrize(
    "tails,kvh,h,quantized,lone",
    [
        ([5, 20, 11], 2, 4, False, None),   # GQA g=2, ragged tails
        ([1, 1], 1, 8, False, None),        # minimum tails, g=8
        ([9, 3], 2, 4, True, None),         # quantized cache
        ([7, 30], 2, 8, False, 25),         # grouped + ungrouped mix
    ],
)
def test_backend_shared_prefix_matches_oracle(tails, kvh, h, quantized, lone):
    rng = np.random.default_rng(0)
    q, kc, vc, meta = build_shared_case(
        rng, tails, kvh, h, 128, quantized=quantized, extra_lone=lone
    )
    backend = PallasAttentionBackend(BS, interpret=True)
    out = backend.decode(q, kc, vc, meta, 0.125)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
@pytest.mark.parametrize("both_chunks", [True, False])
def test_spmd_shared_prefix_matches_oracle(both_chunks):
    """Two-phase shared-prefix decode inside the shard_map SPMD wrapper
    under a dp x tp mesh: group arrays shard over dp with chunk-local
    member indices. `both_chunks=False` leaves one dp chunk groupless
    (its group rows are all padding — the identity-carry path)."""
    import jax

    from minivllm_tpu.ops.pallas.spmd import decode_attention_spmd
    from minivllm_tpu.parallel.sharding import make_mesh

    rng = np.random.default_rng(8)
    kvh, h, d = 2, 4, 128
    # Build two independent 3-seq cases and concatenate them as the two
    # dp chunks of one batch (padding each to 4 rows).
    cases = [
        build_shared_case(rng, [5, 20, 11], kvh, h, d, shared_blocks=2),
        build_shared_case(
            rng, [9, 3], kvh, h, d, shared_blocks=3, extra_lone=25
        ),
    ]
    CH = 4  # rows per chunk
    num_blocks = 64
    qs, metas = [], []
    kc = cases[0][1]
    vc = cases[0][2]
    # Rebuild chunk 1's KV into a disjoint block range so one cache
    # serves both chunks: offset its tables/slots by half the blocks.
    OFF = 32
    q1, kc1, vc1, meta1 = cases[1]
    kc = kc.at[OFF * BS:(num_blocks) * BS].set(kc1[:(num_blocks - OFF) * BS])
    vc = vc.at[OFF * BS:(num_blocks) * BS].set(vc1[:(num_blocks - OFF) * BS])

    def pad_rows(q, meta, trash, off=0, grouped=True):
        S = q.shape[0]
        pad = CH - S
        qp = jnp.concatenate([q, jnp.zeros((pad, h, d), q.dtype)])
        shift = lambda t: jnp.where(t < num_blocks, t + off, t)  # noqa: E731
        mshift = jnp.where(
            meta.group_member >= 0, meta.group_member, -1
        )
        return qp, DecodeBatch(
            input_ids=jnp.pad(meta.input_ids, (0, pad)),
            positions=jnp.pad(meta.positions, (0, pad)),
            slot_mapping=jnp.pad(meta.slot_mapping, (0, pad)),
            block_tables=jnp.pad(
                shift(meta.block_tables), ((0, pad), (0, 0)),
                constant_values=trash,
            ),
            ctx_lens=jnp.pad(meta.ctx_lens, (0, pad)),
            seq_start=jnp.pad(meta.seq_start, (0, pad)) if grouped else None,
            group_member=mshift if grouped else None,
            group_tables=shift(meta.group_tables) if grouped else None,
            group_ctx=meta.group_ctx if grouped else None,
        )

    trash = num_blocks
    q0, m0 = pad_rows(cases[0][0], cases[0][3], trash)
    q1p, m1 = pad_rows(q1, meta1, trash, off=OFF, grouped=both_chunks)
    W = max(m0.block_tables.shape[1], m1.block_tables.shape[1])
    Gmax = max(m0.group_member.shape[1],
               m1.group_member.shape[1] if both_chunks else 0)
    Wg = max(m0.group_tables.shape[1],
             m1.group_tables.shape[1] if both_chunks else 0)

    def padw(t, w, cv):
        return jnp.pad(t, ((0, 0), (0, w - t.shape[1])), constant_values=cv)

    if both_chunks:
        gm = jnp.concatenate([
            padw(m0.group_member, Gmax, -1), padw(m1.group_member, Gmax, -1)
        ])
        gt = jnp.concatenate([
            padw(m0.group_tables, Wg, trash), padw(m1.group_tables, Wg, trash)
        ])
        gc = jnp.concatenate([m0.group_ctx, m1.group_ctx])
        ss = jnp.concatenate([m0.seq_start, m1.seq_start])
    else:
        gm = jnp.concatenate([
            padw(m0.group_member, Gmax, -1),
            jnp.full((1, Gmax), -1, jnp.int32),
        ])
        gt = jnp.concatenate([
            padw(m0.group_tables, Wg, trash),
            jnp.full((1, Wg), trash, jnp.int32),
        ])
        gc = jnp.concatenate([m0.group_ctx, jnp.zeros((1,), jnp.int32)])
        ss = jnp.concatenate([m0.seq_start, jnp.zeros((CH,), jnp.int32)])
    meta = DecodeBatch(
        input_ids=jnp.concatenate([m0.input_ids, m1.input_ids]),
        positions=jnp.concatenate([m0.positions, m1.positions]),
        slot_mapping=jnp.concatenate([m0.slot_mapping, m1.slot_mapping]),
        block_tables=jnp.concatenate([
            padw(m0.block_tables, W, trash), padw(m1.block_tables, W, trash)
        ]),
        ctx_lens=jnp.concatenate([m0.ctx_lens, m1.ctx_lens]),
        seq_start=ss, group_member=gm, group_tables=gt, group_ctx=gc,
    )
    q = jnp.concatenate([q0, q1p])
    mesh = make_mesh(2, dp_size=2)
    out = jax.jit(lambda q, kc, vc: decode_attention_spmd(
        mesh, q, kc, vc, meta, 0.125, BS, interpret=True
    ))(q, kc, vc)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS)
    # Padding rows (ctx 0) are garbage in both paths; compare real rows.
    real = np.r_[0:3, CH:CH + 3]
    np.testing.assert_allclose(
        np.asarray(out)[real], np.asarray(ref)[real], rtol=2e-5, atol=2e-5
    )


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
def test_engine_shared_prefix_spmd_parity(tmp_path):
    """End-to-end under a dp=2 x tp=2 mesh: grouped two-phase decode
    engages (stats counter) and greedy tokens match the mesh-less XLA
    run."""
    from minivllm_tpu.parallel.sharding import make_mesh  # noqa: F401

    ckpt = make_tiny_checkpoint(
        "qwen3", tmp_path / "m",
        num_attention_heads=4, num_key_value_heads=2, head_dim=128,
        hidden_size=64,
    )
    rng = np.random.default_rng(6)
    shared = [int(t) for t in rng.integers(1, 190, 32)]
    prompts = [shared + [int(t) for t in rng.integers(1, 190, n)]
               for n in (3, 7, 5, 9, 4, 8, 6, 10)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    def run(mesh_kw, impl):
        llm = LLM(Config(
            model=str(ckpt), dtype="float32", attention_impl=impl,
            max_num_seqs=8, max_model_len=128, max_num_batched_tokens=512,
            kvcache_block_size=16, num_kvcache_blocks=64, **mesh_kw,
        ))
        llm.model_runner.SHARED_PREFIX_MIN_SAVED_TOKENS = 1
        outs = llm.generate(prompts, sp, use_tqdm=False)
        stats = llm.get_stats()
        return [o["token_ids"] for o in outs], stats["shared_prefix_steps"]

    ref, _ = run({}, "xla")
    got, steps = run(
        {"tensor_parallel_size": 2, "data_parallel_size": 2},
        "pallas_interpret",
    )
    assert steps > 0, "grouping never engaged under the mesh"
    assert got == ref


def test_engine_shared_prefix_greedy_parity(tmp_path):
    """End-to-end: four requests sharing a 32-token cached prefix decode
    through the grouped two-phase path with exact HF greedy parity."""
    import torch
    from transformers import AutoModelForCausalLM

    ckpt = make_tiny_checkpoint(
        "qwen3", tmp_path / "m",
        num_attention_heads=4, num_key_value_heads=2, head_dim=128,
        hidden_size=64,
    )
    llm = LLM(Config(
        model=str(ckpt), dtype="float32", attention_impl="pallas_interpret",
        max_num_seqs=8, max_model_len=128, max_num_batched_tokens=512,
        kvcache_block_size=16, num_kvcache_blocks=64,
    ))
    # make tiny sharing worthwhile for the test
    llm.model_runner.SHARED_PREFIX_MIN_SAVED_TOKENS = 1
    rng = np.random.default_rng(4)
    shared = [int(t) for t in rng.integers(1, 190, 32)]  # two full blocks
    prompts = [shared + [int(t) for t in rng.integers(1, 190, n)]
               for n in (3, 7, 5, 9)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    assert llm.get_stats()["shared_prefix_steps"] > 0, "grouping never engaged"

    model = AutoModelForCausalLM.from_pretrained(str(ckpt)).eval()
    for p, o in zip(prompts, outs):
        toks = list(p)
        with torch.no_grad():
            for _ in range(6):
                toks.append(int(model(torch.tensor([toks])).logits[0, -1].argmax()))
        assert o["token_ids"] == toks[len(p):], "greedy divergence"

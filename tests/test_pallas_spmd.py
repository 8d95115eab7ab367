"""shard_map SPMD wrappers for the Pallas kernels vs the XLA oracle.

Runs the kernels in interpret mode inside shard_map on the 8-virtual-
device CPU mesh — real multi-device partitioning of the real kernel
code paths, the coverage the reference only mocked (SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from minivllm_tpu.ops.attention import (
    DecodeBatch,
    PrefillBatch,
    decode_attention_xla,
    prefill_attention_xla,
    store_kv,
)
from minivllm_tpu.ops.pallas.spmd import (
    decode_attention_spmd,
    prefill_attention_spmd,
)
from minivllm_tpu.parallel.sharding import make_mesh
from tests.test_pallas_decode import BS, build_case

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.mark.parametrize(
    "dp,tp,kvh,h",
    [
        (2, 2, 2, 4),   # dp x tp
        (4, 1, 2, 8),   # pure dp
        (1, 4, 4, 8),   # pure tp (kv heads shard)
    ],
)
def test_decode_spmd_matches_oracle(dp, tp, kvh, h):
    rng = np.random.default_rng(0)
    ctx_lens = [17, 33, 5, 40, 0, 23, 7, 16]  # 8 rows: divisible by dp
    q, kc, vc, meta = build_case(rng, ctx_lens, kvh, h, 128)
    mesh = make_mesh(tp, dp_size=dp)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS)
    out = decode_attention_spmd(
        mesh, q, kc, vc, meta, 0.125, BS, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_decode_spmd_quantized():
    rng = np.random.default_rng(3)
    q, kc, vc, meta = build_case(
        rng, [17, 33, 5, 0], 2, 4, 128, quantized=True
    )
    mesh = make_mesh(2, dp_size=2)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS)
    out = decode_attention_spmd(
        mesh, q, kc, vc, meta, 0.125, BS, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_decode_spmd_window():
    rng = np.random.default_rng(5)
    q, kc, vc, meta = build_case(rng, [40, 7, 33, 12], 2, 4, 128)
    mesh = make_mesh(1, dp_size=2)
    ref = decode_attention_xla(q, kc, vc, meta, 0.125, BS, window=16)
    out = decode_attention_spmd(
        mesh, q, kc, vc, meta, 0.125, BS, window=jnp.int32(16),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


# -- prefill ---------------------------------------------------------------

Q_TILE = 64


def build_prefill_case(rng, q_lens, ctx_lens, kvh, h, d, sp):
    """Packed Q_TILE-aligned prefill batch over a paged cache; the packed
    token axis rounds up to a multiple of sp * Q_TILE."""
    S = len(q_lens)
    W = max(1, -(-max(ctx_lens) // BS))
    num_blocks = 64
    slots_total = (num_blocks + 1) * BS
    kc = jnp.zeros((slots_total, kvh, d), jnp.float32)
    vc = jnp.zeros_like(kc)
    tables = np.full((S, W), num_blocks, np.int32)
    nxt = 0
    for s, L in enumerate(ctx_lens):
        if L == 0:
            continue
        nb = -(-L // BS)
        tables[s, :nb] = range(nxt, nxt + nb)
        slots = np.array(
            [tables[s, i // BS] * BS + i % BS for i in range(L)], np.int32
        )
        k = rng.standard_normal((L, kvh, d)).astype(np.float32)
        v = rng.standard_normal((L, kvh, d)).astype(np.float32)
        kc, vc = store_kv(
            kc, vc, jnp.asarray(k), jnp.asarray(v), jnp.asarray(slots)
        )
        nxt += nb
    q_start = []
    ofs = 0
    for ql in q_lens:
        q_start.append(ofs)
        ofs += -(-ql // Q_TILE) * Q_TILE
    mult = Q_TILE * sp
    T = -(-max(ofs, 1) // mult) * mult
    trash_slot = num_blocks * BS
    q = np.zeros((T, h, d), np.float32)
    q_seg = np.full(T, -1, np.int32)
    positions = np.zeros(T, np.int32)
    for s, ql in enumerate(q_lens):
        rows = rng.standard_normal((ql, h, d)).astype(np.float32)
        o = q_start[s]
        q[o : o + ql] = rows
        q_seg[o : o + ql] = s
        positions[o : o + ql] = np.arange(ctx_lens[s] - ql, ctx_lens[s])
    # packed full-context arrays (the XLA oracle gathers keys via these;
    # the Pallas kernel reads the cache through block tables instead)
    ctx_slots, k_seg, k_pos = [], [], []
    for s, L in enumerate(ctx_lens):
        for i in range(L):
            ctx_slots.append(tables[s, i // BS] * BS + i % BS)
            k_seg.append(s)
            k_pos.append(i)
    C = -(-max(len(ctx_slots), 1) // 64) * 64
    pad = C - len(ctx_slots)
    ctx_slots += [trash_slot] * pad
    k_seg += [-2] * pad
    k_pos += [0] * pad
    meta = PrefillBatch(
        input_ids=jnp.zeros(T, jnp.int32),
        positions=jnp.asarray(positions),
        q_seg=jnp.asarray(q_seg),
        slot_mapping=jnp.zeros(T, jnp.int32),
        ctx_slot_mapping=jnp.asarray(np.array(ctx_slots, np.int32)),
        k_seg=jnp.asarray(np.array(k_seg, np.int32)),
        k_pos=jnp.asarray(np.array(k_pos, np.int32)),
        last_token_idx=jnp.zeros(S, jnp.int32),
        ctx_lens=jnp.asarray(np.array(ctx_lens, np.int32)),
        block_tables=jnp.asarray(tables),
        q_start=jnp.asarray(np.array(q_start, np.int32)),
        q_lens=jnp.asarray(np.array(q_lens, np.int32)),
    )
    return jnp.asarray(q), kc, vc, meta


@pytest.mark.parametrize("sp,tp", [(2, 2), (4, 1), (1, 2)])
def test_prefill_spmd_matches_oracle(sp, tp):
    rng = np.random.default_rng(7)
    # 2 sequences spanning several tiles; one sequence's tiles straddle
    # the sp shard boundary (the kernel's per-tile view is position-free)
    q_lens = [100, 70]
    ctx_lens = [130, 70]  # seq 0 has 30 cached prefix tokens
    q, kc, vc, meta = build_prefill_case(rng, q_lens, ctx_lens, 2, 4, 128, sp)
    mesh = make_mesh(tp, sp_size=sp)
    ref = prefill_attention_xla(q, kc, vc, meta, 0.125)
    out = prefill_attention_spmd(
        mesh, q, kc, vc, meta, 0.125, BS, interpret=True
    )
    # padding rows (q_seg == -1) are never read by the engine and the
    # kernel/oracle fill them differently — compare valid rows only
    valid = np.asarray(meta.q_seg) >= 0
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid],
        rtol=2e-4, atol=2e-4,
    )

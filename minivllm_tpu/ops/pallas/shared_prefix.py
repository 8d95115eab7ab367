"""Two-phase shared-prefix decode composition (PAT-style, arXiv
2511.22333).

Phase 1 streams each group's shared-prefix KV blocks ONCE with all
member queries stacked into the head axis (per-KV-head matmul M grows
from g to Gmax*g — better MXU shapes AND KV traffic divided by the
group size). Phase 2 runs the ordinary per-sequence kernel over the
tails only (seq_start bounds it), continuing phase 1's online-softmax
state; the composition is exactly one full softmax. The runner
guarantees every grouped sequence has a non-empty tail, and for
sliding-window models never groups (the window bound and the
shared/tail split do not compose).

This is a free function so it runs both mesh-less (the backend calls it
directly) and INSIDE the shard_map SPMD wrapper (ops/pallas/spmd.py):
under a dp mesh the runner detects groups per dp row-chunk with
chunk-LOCAL member indices, the group arrays shard over "dp", and every
operation here (query stacking, the two kernel calls, the carry
scatter) acts on purely shard-local data. Under tp the head axis
arrives pre-sharded; the per-KV-head stacking is head-local, so it
composes unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp

from minivllm_tpu.ops import attention as A

__all__ = ["decode_shared_prefix"]


def decode_shared_prefix(
    q, k_cache, v_cache, meta: A.DecodeBatch, scale, block_size, base,
    softcap=None, interpret=False,
):
    """Grouped two-phase decode; requires meta.group_member etc. set.

    q: (S, h, d) — S and h may be the dp/tp-local shard sizes, with
    meta's group arrays holding shard-local member indices.
    """
    from minivllm_tpu.ops.pallas.decode_attention import decode_attention

    S, h, d = q.shape
    G, Gmax = meta.group_member.shape
    k_data = (
        k_cache.data if isinstance(k_cache, A.QuantizedCache) else k_cache
    )
    kvh = k_data.shape[1]
    g = h // kvh
    # Stack member queries kv-major: rows ordered (kv, member, g) so
    # the kernel's per-KV-head slice q[kv*g' : (kv+1)*g'] holds all
    # members' rows for that head (g' = Gmax * g).
    mem = jnp.clip(meta.group_member, 0, S - 1)          # (G, Gmax)
    qg = q[mem]                                          # (G, Gmax, h, d)
    qg = (
        qg.reshape(G, Gmax, kvh, g, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(G, kvh * Gmax * g, d)
    )
    meta1 = A.DecodeBatch(
        input_ids=jnp.zeros((G,), jnp.int32),
        positions=jnp.maximum(meta.group_ctx - 1, 0),
        slot_mapping=jnp.zeros((G,), jnp.int32),
        block_tables=meta.group_tables,
        ctx_lens=meta.group_ctx,
    )
    _, acc1, ml1 = decode_attention(
        qg, k_cache, v_cache, meta1, scale, block_size, base,
        softcap=softcap, interpret=interpret, return_state=True,
    )
    # Un-permute the stacked state back to (group, member, h, ...).
    acc1 = (
        acc1.reshape(G, kvh, Gmax, g, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(G * Gmax, h, d)
    )
    ml1 = (
        ml1.reshape(G, 2, kvh, Gmax, g, 128)
        .transpose(0, 3, 1, 2, 4, 5)
        .reshape(G * Gmax, 2, h, 128)
    )
    # Scatter to per-sequence carries; ungrouped rows keep the
    # online-softmax identity (0, -inf, 0). Padding members dump
    # into row S.
    idx = jnp.where(
        meta.group_member.reshape(-1) >= 0,
        meta.group_member.reshape(-1),
        S,
    )
    acc0 = (
        jnp.zeros((S + 1, h, d), jnp.float32).at[idx].set(acc1)[:S]
    )
    ml_default = jnp.stack(
        [
            jnp.full((h, 128), float(jnp.finfo(jnp.float32).min)),
            jnp.zeros((h, 128), jnp.float32),
        ]
    )
    ml0 = (
        jnp.broadcast_to(ml_default, (S + 1, 2, h, 128))
        .at[idx]
        .set(ml1)[:S]
    )
    return decode_attention(
        q, k_cache, v_cache, meta, scale, block_size, base,
        softcap=softcap, interpret=interpret,
        start=meta.seq_start, init_state=(acc0, ml0),
    )

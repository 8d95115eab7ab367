"""shard_map SPMD wrappers for the Pallas attention kernels.

A `pallas_call` has no GSPMD partitioning rule: under a multi-device
mesh, XLA's partitioner would fall back to fully replicating its
operands — for the paged KV cache that means an all-gather of the
entire cache per layer. These wrappers make the partitioning explicit
with `shard_map`, so every shard runs the kernel on purely local data:

- decode: batch rows shard over "dp", heads over "tp" (q/output heads
  and the cache's kv-head axis — GQA groups stay with their KV head,
  exactly the layout GSPMD uses for the XLA oracle), block tables and
  context lengths follow their rows; the cache's slot axis, scale
  slabs' block axis, and everything else replicate.
- prefill: packed Q_TILE-aligned token tiles shard over "sp" (each tile
  belongs to one sequence, and the kernel reads only per-TILE metadata
  — tile_seq/tile_pos0/tile_rows — so tiles of one sequence may land on
  different shards), heads over "tp"; per-sequence arrays replicate.

The "pp" and "ep" axes are never mentioned: attention operands are
replicated across them. Under pipeline parallelism (pp > 1) these
wrappers are invoked INSIDE the pipeline's shard_map, which is manual
over "pp" only (parallel/pipeline.py): the nested shard_map here must
then be built on the abstract CONTEXT mesh (whose "pp" axis is already
Manual) rather than the concrete mesh — `_resolve_mesh` does that — and
all operands it sees are already pp-local, so the specs below partition
exactly the remaining auto axes.

This is the roadmap's "SPMD partitioning for the Pallas kernels" item:
dp/sp/pp meshes previously had to fall back to the XLA gather oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from minivllm_tpu.ops.attention import DecodeBatch, QuantizedCache

__all__ = ["decode_attention_spmd", "prefill_attention_spmd"]


def _resolve_mesh(mesh):
    """The mesh to build the shard_map on: inside a manual region (the
    pp pipeline body) the context AbstractMesh — whose manual axes are
    marked — is required; outside one, the concrete mesh."""
    ctx = jax.sharding.get_abstract_mesh()
    if not ctx.empty and ctx._any_axis_manual:
        return ctx
    return mesh


def _cache_spec(cache):
    """Pytree of PartitionSpecs matching a plain array or QuantizedCache:
    kv heads shard over tp, slot/block axes replicate."""
    spec = P(None, "tp", None)
    if isinstance(cache, QuantizedCache):
        return QuantizedCache(data=spec, scale=spec)
    return spec


def _win_arr(window):
    return jnp.asarray(window if window is not None else 1 << 30, jnp.int32)


def decode_attention_spmd(
    mesh, q, k_cache, v_cache, meta, scale, block_size,
    base=0, window=None, softcap=None, interpret=False, qrows=1,
):
    """Paged flash-decode under a ("pp","dp","sp","ep","tp") mesh.

    Shared-prefix decode groups compose: the runner detects groups per
    dp row-chunk with chunk-LOCAL member indices and pads the group
    count to a dp multiple (engine/model_runner._detect_groups), so the
    group arrays shard over "dp" alongside their rows and the two-phase
    composition (ops/pallas/shared_prefix.py) runs on purely local data
    inside each shard. `qrows > 1` (speculative multi-row verify items)
    composes with "dp" row sharding: a sequence's qrows rows are
    contiguous and the per-shard row count is a qrows multiple (the
    runner pads the SEQUENCE count to a dp multiple), so every shard
    strides its local rows down to whole local sequences."""
    from minivllm_tpu.ops.pallas.decode_attention import decode_attention
    from minivllm_tpu.ops.pallas.shared_prefix import decode_shared_prefix

    grouped = meta.group_member is not None

    def body(q, kc, vc, m, base, win):
        if grouped:
            return decode_shared_prefix(
                q, kc, vc, m, scale, block_size, base[0],
                softcap=softcap, interpret=interpret,
            )
        return decode_attention(
            q, kc, vc, m, scale, block_size, base[0], win[0],
            softcap=softcap, interpret=interpret, qrows=qrows,
        )

    meta_specs = DecodeBatch(
        input_ids=P("dp"),
        positions=P("dp"),
        slot_mapping=P("dp"),
        block_tables=P("dp", None),
        ctx_lens=P("dp"),
        seq_start=P("dp") if grouped else None,
        group_member=P("dp", None) if grouped else None,
        group_tables=P("dp", None) if grouped else None,
        group_ctx=P("dp") if grouped else None,
    )
    fn = shard_map(
        body,
        mesh=_resolve_mesh(mesh),
        in_specs=(
            P("dp", "tp", None),
            _cache_spec(k_cache),
            _cache_spec(v_cache),
            meta_specs,
            P(None),
            P(None),
        ),
        out_specs=P("dp", "tp", None),
        check_vma=False,
    )
    return fn(
        q, k_cache, v_cache, meta,
        jnp.asarray(base, jnp.int32).reshape(1),
        _win_arr(window).reshape(1),
    )


def prefill_attention_spmd(
    mesh, q, k_cache, v_cache, meta, scale, block_size,
    base=0, window=None, softcap=None, interpret=False,
):
    """Varlen prefill flash under a ("pp","dp","sp","ep","tp") mesh.

    Tile metadata is computed at the GLOBAL packed layout, then shards
    along tiles with q — the kernel's per-tile view is position-free.
    Requires the packed token count divisible by sp * Q_TILE (the
    runner rounds its prefill buckets up accordingly).
    """
    from minivllm_tpu.ops.pallas.prefill_attention import (
        Q_TILE,
        prefill_attention_tiles,
        tile_metadata,
    )

    nt = q.shape[0] // Q_TILE
    tile_seq, tile_pos0, tile_rows = tile_metadata(meta, nt)

    def body(q, kc, vc, ts, tp0, tr, tables, ctx, base, win):
        return prefill_attention_tiles(
            q, kc, vc, ts, tp0, tr, tables, ctx, scale, block_size,
            base[0], win[0], softcap=softcap, interpret=interpret,
        )

    fn = shard_map(
        body,
        mesh=_resolve_mesh(mesh),
        in_specs=(
            P("sp", "tp", None),
            _cache_spec(k_cache),
            _cache_spec(v_cache),
            P("sp"),
            P("sp"),
            P("sp"),
            P(None, None),
            P(None),
            P(None),
            P(None),
        ),
        out_specs=P("sp", "tp", None),
        check_vma=False,
    )
    return fn(
        q, k_cache, v_cache, tile_seq, tile_pos0, tile_rows,
        meta.block_tables, meta.ctx_lens,
        jnp.asarray(base, jnp.int32).reshape(1),
        _win_arr(window).reshape(1),
    )

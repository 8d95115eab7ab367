"""SPMD tensor-parallel sharding.

This is the TPU-native replacement for the reference's entire TP runtime
(/root/reference/minivllm/models/layers/linear.py,
embed_head.py, engine/distributed_manager.py, model_runner worker loop):
instead of spawning one process per rank and hand-writing all_reduce /
gather calls, weights are placed with NamedShardings over a Mesh("tp")
and GSPMD inserts the ICI collectives:

- column-parallel (q/k/v/gate/up: out-dim sharded)  -> no collective
- row-parallel (o_proj/down_proj: in-dim sharded)   -> psum (all-reduce),
  exactly where the reference calls dist.all_reduce (linear.py:314-319)
- vocab-sharded embedding + lm_head                 -> masked gather +
  psum / logits all-gather (embed_head.py:43-231)
- KV cache sharded on the kv-head axis              -> attention is fully
  local per shard (GQA groups stay with their KV head)

The same specs extend to multi-host meshes (DCN axis) unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_params",
    "shard_cache",
    "cache_pspec",
    "shard_batch",
]

TP_AXIS = "tp"
EP_AXIS = "ep"
DP_AXIS = "dp"
SP_AXIS = "sp"
PP_AXIS = "pp"


def make_mesh(
    tp_size: int,
    devices=None,
    ep_size: int = 1,
    dp_size: int = 1,
    sp_size: int = 1,
    pp_size: int = 1,
) -> Mesh:
    """("pp", "dp", "sp", "ep", "tp") mesh.

    Size-1 axes are no-ops for every pspec, so callers that only want
    tensor parallelism get the historical ("tp")-sharded behavior.

    - "tp": tensor parallelism — weight shards, GSPMD psum on row-parallel
      matmuls (the reference's only parallelism, SURVEY.md §2.2).
    - "ep": expert parallelism — MoE expert-stacked weights shard their
      expert axis over it (models/qwen_moe.py).
    - "dp": data parallelism — decode batch rows shard over it (weights and
      KV cache replicated; per-chip FLOPs divided by dp). See shard_batch.
    - "sp": sequence parallelism — packed prefill *token* rows shard over
      it, splitting long-prompt prefill compute across chips.
    - "pp": pipeline parallelism — the stacked layer axis of the weights
      and the layer-major flat KV cache shard over it; microbatches flow
      through the stages via ppermute (parallel/pipeline.py).
    """
    devices = devices if devices is not None else jax.devices()
    n = tp_size * ep_size * dp_size * sp_size * pp_size
    if len(devices) < n:
        raise ValueError(
            f"pp={pp_size} x dp={dp_size} x sp={sp_size} x ep={ep_size} x "
            f"tp={tp_size} needs {n} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(
        pp_size, dp_size, sp_size, ep_size, tp_size
    )
    return Mesh(grid, (PP_AXIS, DP_AXIS, SP_AXIS, EP_AXIS, TP_AXIS))


def _axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape.get(axis, 1)


def shard_batch(meta, mesh: Mesh | None):
    """Apply data/sequence-parallel sharding constraints to a batch pytree.

    DecodeBatch: batch rows shard over "dp" — each dp group runs the full
    model on its slice of the sequences (weights/KV replicated over dp, so
    the KV scatter's updates are all-gathered, a few KiB per step).

    PrefillBatch: the packed new-token axis (T) shards over "sp" — the
    reference has no long-context parallelism at all (SURVEY.md §5); here
    the quadratic prefill attention and all per-token matmuls split across
    the sp group while the packed context (C) stays replicated.
    """
    if mesh is None:
        return meta
    from jax import lax

    from minivllm_tpu.ops.attention import DecodeBatch, PrefillBatch

    def cons(x, spec):
        return lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    if isinstance(meta, DecodeBatch) and _axis_size(mesh, DP_AXIS) > 1:
        grouped = meta.group_member is not None
        return DecodeBatch(
            input_ids=cons(meta.input_ids, P(DP_AXIS)),
            positions=cons(meta.positions, P(DP_AXIS)),
            slot_mapping=cons(meta.slot_mapping, P(DP_AXIS)),
            block_tables=cons(meta.block_tables, P(DP_AXIS, None)),
            ctx_lens=cons(meta.ctx_lens, P(DP_AXIS)),
            # Shared-prefix group arrays ride their dp row-chunks: the
            # runner emits chunk-local member indices and a group count
            # padded to a dp multiple (model_runner._detect_groups).
            seq_start=cons(meta.seq_start, P(DP_AXIS)) if grouped else None,
            group_member=(
                cons(meta.group_member, P(DP_AXIS, None)) if grouped else None
            ),
            group_tables=(
                cons(meta.group_tables, P(DP_AXIS, None)) if grouped else None
            ),
            group_ctx=cons(meta.group_ctx, P(DP_AXIS)) if grouped else None,
        )
    if isinstance(meta, PrefillBatch) and _axis_size(mesh, SP_AXIS) > 1:
        return meta._replace(
            input_ids=cons(meta.input_ids, P(SP_AXIS)),
            positions=cons(meta.positions, P(SP_AXIS)),
            q_seg=cons(meta.q_seg, P(SP_AXIS)),
            slot_mapping=cons(meta.slot_mapping, P(SP_AXIS)),
        )
    return meta


def _tp_divisible(model, tp: int) -> None:
    if model.num_heads % tp:
        raise ValueError(
            f"num_attention_heads={model.num_heads} not divisible by tp={tp}"
        )
    if getattr(model, "num_kv_heads", model.num_heads) % tp:
        raise ValueError(
            f"num_key_value_heads={model.num_kv_heads} not divisible by tp={tp}"
        )


def _pp_divisible(model, pp: int) -> None:
    if model.num_layers % pp:
        raise ValueError(
            f"num_hidden_layers={model.num_layers} not divisible by pp={pp}"
        )


def _scale_spec(w_spec: P, s_shape) -> P:
    """Sharding for per-channel quantization scales: an axis of size 1
    (a reduced contraction axis) is replicated, otherwise it follows the
    kernel's spec."""
    entries = list(w_spec) + [None] * (len(s_shape) - len(w_spec))
    return P(*[None if s_shape[i] == 1 else entries[i] for i in range(len(s_shape))])


def shard_params(model, params: dict, mesh: Mesh) -> dict:
    """Place a parameter pytree onto the mesh per the model's pspecs.

    Quantized kernels ({"w": int8, "s": scales}) shard the int8 tensor by
    the kernel's spec and the scales by the surviving channel axes.
    """
    from minivllm_tpu.ops.quant import is_quantized

    tp = mesh.shape[TP_AXIS]
    if tp > 1:
        _tp_divisible(model, tp)
    pp = mesh.shape.get(PP_AXIS, 1)
    if pp > 1:
        _pp_divisible(model, pp)
    specs = model.param_pspecs()

    def put(x, spec):
        if is_quantized(x):
            return {
                "w": jax.device_put(x["w"], NamedSharding(mesh, spec)),
                "s": jax.device_put(
                    x["s"], NamedSharding(mesh, _scale_spec(spec, x["s"].shape))
                ),
            }
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params, specs, is_leaf=is_quantized)


def cache_pspec() -> P:
    """Flat KV cache (L*num_slots, kv_heads, head_dim): kv heads shard
    over tp; the layer-major slot axis shards over pp (contiguous layer
    ranges land on their pipeline stage; size-1 pp makes it a no-op)."""
    return P(PP_AXIS, TP_AXIS, None)


def shard_cache(cache, mesh: Mesh):
    return jax.device_put(cache, NamedSharding(mesh, cache_pspec()))

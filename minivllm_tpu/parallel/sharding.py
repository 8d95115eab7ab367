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

__all__ = ["make_mesh", "shard_params", "shard_cache", "cache_pspec"]

TP_AXIS = "tp"
EP_AXIS = "ep"


def make_mesh(tp_size: int, devices=None, ep_size: int = 1) -> Mesh:
    """("ep", "tp") mesh. The ep axis (expert parallelism, MoE models)
    defaults to size 1 so dense-model pspecs are unchanged; expert-stacked
    weights shard their expert axis over it (models/qwen_moe.py)."""
    devices = devices if devices is not None else jax.devices()
    n = tp_size * ep_size
    if len(devices) < n:
        raise ValueError(
            f"tp={tp_size} x ep={ep_size} needs {n} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(ep_size, tp_size)
    return Mesh(grid, (EP_AXIS, TP_AXIS))


def _tp_divisible(model, tp: int) -> None:
    if model.num_heads % tp:
        raise ValueError(
            f"num_attention_heads={model.num_heads} not divisible by tp={tp}"
        )
    if getattr(model, "num_kv_heads", model.num_heads) % tp:
        raise ValueError(
            f"num_key_value_heads={model.num_kv_heads} not divisible by tp={tp}"
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
    """Flat KV cache (L*num_slots, kv_heads, head_dim): shard kv heads."""
    return P(None, TP_AXIS, None)


def shard_cache(cache, mesh: Mesh):
    return jax.device_put(cache, NamedSharding(mesh, cache_pspec()))

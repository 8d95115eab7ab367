"""Mixture-of-experts MLP (beyond reference parity — the reference has no
MoE models, SURVEY.md §2.2).

TPU-first dropless design: instead of the GShard capacity/dropping
dispatch einsum, tokens are *sorted by expert id* and each expert's
contiguous run is multiplied through one `lax.ragged_dot` (grouped
matmul) — the MXU sees E back-to-back dense matmuls whose row counts sum
to exactly T*k, so FLOPs equal the routed work with zero token dropping
and zero capacity padding. Routing softmax/top-k runs in fp32.

Expert weights may be weight-only quantized ({"w": int8|fp8, "s": fp32
per-(expert, out-channel)}); dequantization is expressed as a scalar
multiply on the operand so XLA folds it into the grouped-matmul read,
the same pattern `ops/quant.qdot` uses.

HF numerical contract (transformers Qwen3MoeSparseMoeBlock): full-E
softmax -> top-k -> optional renormalize -> weighted sum of expert
outputs. Matches to float tolerance; parity covered by
tests/test_logit_parity.py::test_prefill_parity[qwen3_moe].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from minivllm_tpu.ops.activation import silu_and_mul
from minivllm_tpu.ops.quant import is_quantized

__all__ = ["moe_mlp", "moe_mlp_spmd", "qragged_dot"]


def qragged_dot(
    x: jnp.ndarray,
    w,
    group_sizes: jnp.ndarray,
    impl: str = "xla",
    items: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Grouped matmul x (T, in) @ w (E, in, out) with `group_sizes` rows
    per expert; accepts plain or quantized w.

    impl: "xla" (lax.ragged_dot), "pallas" (Mosaic grouped-matmul kernel
    with fused dequant, ops/pallas/moe_gmm.py), or "pallas_interpret"
    (the kernel as interpreted jax ops — CPU test path). The Pallas
    kernel streams quantized weights directly (the XLA path must
    materialize a dequantized copy through HBM every step, which is why
    it measured ~28% of roofline at decode batch sizes, docs/roadmap.md).
    `items` optionally carries a shared precomputed kernel work list
    (moe_gmm.build_items) when several calls use the same (T, groups).
    """
    quant = is_quantized(w)
    data = w["w"] if quant else w
    # Floor-subtracted v5e measurements (bench_kernels --moe, Qwen3-MoE
    # shapes): the kernel is 2-3x ragged_dot at decode row counts
    # (489-672 GB/s of weights vs ~291) and at parity on compute-bound
    # prefill batches (102 vs 99 TFLOP/s at T=4096, tied at T=8192), so
    # it runs at every supported shape.
    if impl != "xla":
        from minivllm_tpu.ops.pallas import moe_gmm

        if moe_gmm.is_supported(x, data):
            scale = None
            if quant:
                E, _, N = data.shape
                scale = w["s"].astype(jnp.float32).reshape(E, 1, N)
            return moe_gmm.gmm(
                x, data, group_sizes, scale,
                interpret=impl == "pallas_interpret", items=items,
            )
    if not quant:
        return lax.ragged_dot(x, w, group_sizes)
    wd = w["w"].astype(x.dtype) * w["s"].astype(x.dtype)
    return lax.ragged_dot(x, wd, group_sizes)


def moe_mlp(
    x: jnp.ndarray,
    router_w: jnp.ndarray,
    w_gate,
    w_up,
    w_down,
    top_k: int,
    norm_topk_prob: bool,
    impl: str = "xla",
    expert_window=None,
) -> jnp.ndarray:
    """Sparse SwiGLU MoE layer.

    x: (T, D) normed hidden states.
    router_w: (D, E) router projection (kept full precision).
    w_gate/w_up: (E_local, D, I); w_down: (E_local, I, D) — possibly
    quantized. impl selects the grouped-matmul backend (see qragged_dot).
    Returns (T, D) in x.dtype.

    `expert_window=(e_lo, e_count, E_total)` runs the expert-parallel
    shard body (moe_mlp_spmd): routing/sort run over ALL E_total experts
    (replicated, deterministic), but only the window's rows are computed
    against the LOCAL weights; non-window rows come out as exact zeros,
    so the caller's psum over the "ep" axis reconstructs the full
    result. e_lo may be traced; e_count/E_total are static.
    """
    T, D = x.shape
    if expert_window is None:
        e_lo, e_count, E = 0, router_w.shape[-1], router_w.shape[-1]
    else:
        e_lo, e_count, E = expert_window
    # Routing in fp32 (HF: Qwen3MoeSparseMoeBlock.forward).
    logits = jnp.dot(x, router_w, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, top_e = lax.top_k(probs, top_k)  # (T, k)
    if norm_topk_prob:
        top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)

    # Sort the T*k (token, expert) assignments by expert id so each
    # expert's rows are contiguous for the grouped matmul.
    flat_e = top_e.reshape(-1)  # (T*k,)
    order = jnp.argsort(flat_e)  # (T*k,)
    src_tok = order // top_k  # originating token of each sorted row
    xs = jnp.take(x, src_tok, axis=0)  # (T*k, D)
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    # One kernel work list serves gate/up/down (same rows and groups) —
    # built only when the kernel actually engages for all three shapes,
    # otherwise the traced cumsum/compare list would be dead computation
    # in every MoE layer. The expert-parallel path (expert_window set)
    # requires the kernel: its caller gates on is_supported up front.
    items = None
    if impl != "xla":
        from minivllm_tpu.ops.pallas import moe_gmm

        rows = xs.shape[0]
        if moe_supported(xs.shape[0], xs.dtype, w_gate, w_up, w_down):
            items = moe_gmm.build_items(
                group_sizes, rows, moe_gmm._pick_tm(rows), E,
                e_lo=e_lo, e_count=e_count,
            )
    if expert_window is not None and items is None:
        raise ValueError(
            "expert_window requires the Pallas grouped-matmul kernel "
            "(gate on ops.moe.moe_supported before calling)"
        )
    h = silu_and_mul(
        qragged_dot(xs, w_gate, group_sizes, impl, items),
        qragged_dot(xs, w_up, group_sizes, impl, items),
    )
    out = qragged_dot(h, w_down, group_sizes, impl, items)  # (T*k, D)
    out = out * jnp.take(top_p.reshape(-1), order).astype(out.dtype)[:, None]
    # Combine: scatter-add each weighted expert output back to its token.
    return jnp.zeros((T, D), out.dtype).at[src_tok].add(out).astype(x.dtype)


def moe_supported(rows: int, dtype, w_gate, w_up, w_down) -> bool:
    """True when the Pallas grouped-matmul kernel supports all three
    expert matmuls of a MoE layer at `rows` sorted rows (= T * top_k).
    Shapes may be the ep/tp-LOCAL shards."""
    from minivllm_tpu.ops.pallas import moe_gmm

    def _data(w):
        return w["w"] if is_quantized(w) else w

    def _rows_in(data):  # contraction dim of a (E,K,N)/(E,NB,K,TN) w
        return data.shape[2] if data.ndim == 4 else data.shape[1]

    gd, ud, dd = _data(w_gate), _data(w_up), _data(w_down)
    x_shape = jax.ShapeDtypeStruct((rows, _rows_in(gd)), dtype)
    h_shape = jax.ShapeDtypeStruct((rows, _rows_in(dd)), dtype)
    return (
        moe_gmm.is_supported(x_shape, gd)
        and moe_gmm.is_supported(x_shape, ud)
        and moe_gmm.is_supported(h_shape, dd)
    )


def moe_mlp_spmd(
    mesh,
    x: jnp.ndarray,
    router_w: jnp.ndarray,
    w_gate,
    w_up,
    w_down,
    top_k: int,
    norm_topk_prob: bool,
    impl: str,
    row_axis: str = "dp",
) -> jnp.ndarray:
    """Expert/tensor-parallel MoE layer under a ("pp","dp","sp","ep","tp")
    mesh, with the Pallas grouped-matmul kernel engaged per shard.

    A pallas_call has no GSPMD partitioning rule, so under a mesh the
    layer runs inside shard_map: token rows shard over `row_axis` ("dp"
    for decode batches, "sp" for packed prefill — matching the attention
    kernels' row layout so no resharding is inserted), the expert axis
    of the weights over "ep", and the expert hidden dim over "tp"
    (Megatron column/row pattern inside each expert). Each shard routes
    its local tokens over ALL experts, builds an expert-window work list
    (ops/pallas/moe_gmm.build_items e_lo/e_count), computes only its
    local experts' rows (compute proportional to actually-routed work —
    dropless, no capacity factor), and one psum over ("ep","tp")
    combines: ep shards contribute disjoint row sets, tp shards partial
    sums of the down-projection contraction.

    Caller must gate on ops.moe.moe_supported with the LOCAL shapes.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    E = router_w.shape[-1]
    ep = mesh.shape.get("ep", 1)
    e_count = E // ep

    def _wspec(w, spec):
        if is_quantized(w):
            sspec = P(*[
                None if w["s"].shape[i] == 1 else spec[i]
                for i in range(len(w["s"].shape))
            ])
            return {"w": spec, "s": sspec}
        return spec

    col = P("ep", None, "tp")  # (E, D, I): shard experts + expert hidden
    row = P("ep", "tp", None)  # (E, I, D)

    def body(x, rw, wg, wu, wd):
        e_lo = lax.axis_index("ep") * e_count
        out = moe_mlp(
            x, rw, wg, wu, wd, top_k, norm_topk_prob, impl,
            expert_window=(e_lo, e_count, E),
        )
        return lax.psum(out, ("ep", "tp"))

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(row_axis, None),
            P(None, None),
            _wspec(w_gate, col),
            _wspec(w_up, col),
            _wspec(w_down, row),
        ),
        out_specs=P(row_axis, None),
        check_vma=False,
    )
    return fn(x, router_w, w_gate, w_up, w_down)

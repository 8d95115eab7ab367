"""Attention backend selection.

Replaces the reference's runtime kernel dispatch
(/root/reference/minivllm/models/layers/attention.py:157-173: NPU-FA /
flash-attn / SDPA fallback) with a static choice made at engine build time:
"xla" (pure-jnp oracle, runs anywhere, correctness reference) or "pallas"
(Mosaic TPU kernels). The choice is baked into the compiled step function —
there is no per-call branching.
"""

from __future__ import annotations

import jax.numpy as jnp

from minivllm_tpu.ops import attention as A

__all__ = ["XlaAttentionBackend", "PallasAttentionBackend", "make_backend"]


class XlaAttentionBackend:
    """Gather + masked-softmax oracle (reference analog:
    page_attention.py gather fallback)."""

    name = "xla"

    def __init__(self, block_size: int) -> None:
        self.block_size = block_size

    def prefill(self, q, k_cache, v_cache, meta: A.PrefillBatch, scale,
                base=0, window=None, softcap=None):
        return A.prefill_attention_xla(
            q, k_cache, v_cache, meta, scale, base, window, softcap
        )

    def decode(self, q, k_cache, v_cache, meta: A.DecodeBatch, scale,
               base=0, window=None, softcap=None):
        return A.decode_attention_xla(
            q, k_cache, v_cache, meta, scale, self.block_size, base,
            window, softcap,
        )


class PallasAttentionBackend:
    """Mosaic TPU flash kernels (paged decode / varlen prefill), both with
    in-kernel sliding-window and score-softcap support (Gemma2, Mistral).

    Falls back to the XLA oracle per-phase when a kernel does not support
    the configuration; selection happens at trace time (static).

    On a multi-device mesh the kernels run inside `shard_map`
    (ops/pallas/spmd.py) — batch rows over "dp", packed prefill tiles
    over "sp", heads over "tp" — because a pallas_call has no GSPMD
    partitioning rule (XLA would replicate the whole KV cache).
    `interpret=True` runs the kernels as interpreted jax ops (CPU test
    path for the SPMD wrappers).
    """

    name = "pallas"

    def __init__(self, block_size: int, mesh=None,
                 interpret: bool = False) -> None:
        self.block_size = block_size
        self._oracle = XlaAttentionBackend(block_size)
        self.interpret = interpret
        # Trace-time engagement counters (how many times each KERNEL
        # path — direct or spmd-wrapped — was compiled in, vs oracle
        # fallbacks): tests assert the fast path actually engaged.
        self.kernel_traces = {"prefill": 0, "decode": 0}
        self.mesh = None
        if mesh is not None and any(
            mesh.shape.get(a, 1) > 1 for a in ("dp", "sp", "ep", "tp")
        ):
            self.mesh = mesh

    def _rows_shardable(self, n: int, axis: str) -> bool:
        """Whether a row count splits evenly over a mesh axis — under the
        pp pipeline the per-microbatch row slice may not, in which case
        that phase falls back to the XLA oracle (which GSPMD partitions
        however it likes)."""
        return n % self.mesh.shape.get(axis, 1) == 0

    def prefill(self, q, k_cache, v_cache, meta: A.PrefillBatch, scale,
                base=0, window=None, softcap=None):
        from minivllm_tpu.ops.pallas import prefill_attention as kernel

        softcap = float(softcap) if softcap is not None else None
        # Row count must be a whole number of Q_TILE tiles: always true
        # for the runner's packed buckets, but pipeline microbatches can
        # slice thinner — those fall back to the oracle.
        aligned = q.shape[0] >= kernel.Q_TILE and q.shape[0] % kernel.Q_TILE == 0
        if aligned and kernel.is_supported(q, k_cache, self.block_size):
            if self.mesh is not None:
                if self._rows_shardable(q.shape[0] // kernel.Q_TILE, "sp"):
                    from minivllm_tpu.ops.pallas.spmd import (
                        prefill_attention_spmd,
                    )

                    self.kernel_traces["prefill"] += 1
                    return prefill_attention_spmd(
                        self.mesh, q, k_cache, v_cache, meta, scale,
                        self.block_size, base, window=window,
                        softcap=softcap, interpret=self.interpret,
                    )
                return self._oracle.prefill(
                    q, k_cache, v_cache, meta, scale, base, window, softcap
                )
            self.kernel_traces["prefill"] += 1
            return kernel.prefill_attention(
                q, k_cache, v_cache, meta, scale, self.block_size, base,
                window=window, softcap=softcap, interpret=self.interpret,
            )
        return self._oracle.prefill(
            q, k_cache, v_cache, meta, scale, base, window, softcap
        )

    def decode(self, q, k_cache, v_cache, meta: A.DecodeBatch, scale,
               base=0, window=None, softcap=None):
        from minivllm_tpu.ops.pallas import decode_attention as kernel

        softcap = float(softcap) if softcap is not None else None
        # Multi-row verify items (speculative decoding): the runner sets
        # spec_qrows = k+1 around tracing the fused-spec step function —
        # read at trace time only, so each compiled program bakes in its
        # own value (plain steps trace with 1).
        qrows = getattr(self, "spec_qrows", 1)
        if kernel.is_supported(q, k_cache, self.block_size):
            # window/softcap are in-kernel (sliding-window blocks are
            # never fetched); softcap must be a static float.
            if self.mesh is not None:
                if self._rows_shardable(q.shape[0], "dp"):
                    from minivllm_tpu.ops.pallas.spmd import (
                        decode_attention_spmd,
                    )

                    self.kernel_traces["decode"] += 1
                    return decode_attention_spmd(
                        self.mesh, q, k_cache, v_cache, meta, scale,
                        self.block_size, base, window=window,
                        softcap=softcap, interpret=self.interpret,
                        qrows=qrows,
                    )
                return self._oracle.decode(
                    q, k_cache, v_cache, meta, scale, base, window, softcap
                )
            self.kernel_traces["decode"] += 1
            if meta.group_member is not None:
                from minivllm_tpu.ops.pallas.shared_prefix import (
                    decode_shared_prefix,
                )

                return decode_shared_prefix(
                    q, k_cache, v_cache, meta, scale, self.block_size,
                    base, softcap=softcap, interpret=self.interpret,
                )
            return kernel.decode_attention(
                q, k_cache, v_cache, meta, scale, self.block_size, base,
                window=window, softcap=softcap, interpret=self.interpret,
                qrows=qrows,
            )
        return self._oracle.decode(
            q, k_cache, v_cache, meta, scale, base, window, softcap
        )


def make_backend(name: str, block_size: int, mesh=None,
                 interpret: bool = False):
    if name == "xla":
        return XlaAttentionBackend(block_size)
    if name == "pallas":
        return PallasAttentionBackend(block_size, mesh, interpret)
    raise ValueError(f"unknown attention backend {name!r}")

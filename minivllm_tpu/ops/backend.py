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
        self.mesh = None
        if mesh is not None and any(
            mesh.shape.get(a, 1) > 1 for a in ("dp", "sp", "ep", "tp")
        ):
            self.mesh = mesh

    def prefill(self, q, k_cache, v_cache, meta: A.PrefillBatch, scale,
                base=0, window=None, softcap=None):
        from minivllm_tpu.ops.pallas import prefill_attention as kernel

        softcap = float(softcap) if softcap is not None else None
        if kernel.is_supported(q, k_cache, self.block_size):
            if self.mesh is not None:
                from minivllm_tpu.ops.pallas.spmd import (
                    prefill_attention_spmd,
                )

                return prefill_attention_spmd(
                    self.mesh, q, k_cache, v_cache, meta, scale,
                    self.block_size, base, window=window, softcap=softcap,
                    interpret=self.interpret,
                )
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
        if kernel.is_supported(q, k_cache, self.block_size):
            # window/softcap are in-kernel (sliding-window blocks are
            # never fetched); softcap must be a static float.
            if self.mesh is not None:
                from minivllm_tpu.ops.pallas.spmd import (
                    decode_attention_spmd,
                )

                return decode_attention_spmd(
                    self.mesh, q, k_cache, v_cache, meta, scale,
                    self.block_size, base, window=window, softcap=softcap,
                    interpret=self.interpret,
                )
            if meta.group_member is not None:
                return self._decode_shared_prefix(
                    q, k_cache, v_cache, meta, scale, base, softcap
                )
            return kernel.decode_attention(
                q, k_cache, v_cache, meta, scale, self.block_size, base,
                window=window, softcap=softcap, interpret=self.interpret,
            )
        return self._oracle.decode(
            q, k_cache, v_cache, meta, scale, base, window, softcap
        )

    def _decode_shared_prefix(
        self, q, k_cache, v_cache, meta: A.DecodeBatch, scale, base,
        softcap,
    ):
        """Two-phase shared-prefix decode (PAT-style, arXiv 2511.22333).

        Phase 1 streams each group's shared-prefix KV blocks ONCE with
        all member queries stacked into the head axis (per-KV-head
        matmul M grows from g to Gmax*g — better MXU shapes AND KV
        traffic divided by the group size). Phase 2 runs the ordinary
        per-sequence kernel over the tails only (seq_start bounds it),
        continuing phase 1's online-softmax state; the composition is
        exactly one full softmax. The runner guarantees every grouped
        sequence has a non-empty tail. Sliding-window models never
        group (the runner gates on config.sliding_window)."""
        import jax.numpy as jnp

        from minivllm_tpu.ops.pallas.decode_attention import (
            decode_attention,
        )

        S, h, d = q.shape
        G, Gmax = meta.group_member.shape
        k_data = (
            k_cache.data if isinstance(k_cache, A.QuantizedCache) else k_cache
        )
        kvh = k_data.shape[1]
        g = h // kvh
        # Stack member queries kv-major: rows ordered (kv, member, g) so
        # the kernel's per-KV-head slice q[kv*g' : (kv+1)*g'] holds all
        # members' rows for that head (g' = Gmax * g).
        mem = jnp.clip(meta.group_member, 0, S - 1)          # (G, Gmax)
        qg = q[mem]                                          # (G, Gmax, h, d)
        qg = (
            qg.reshape(G, Gmax, kvh, g, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(G, kvh * Gmax * g, d)
        )
        meta1 = A.DecodeBatch(
            input_ids=jnp.zeros((G,), jnp.int32),
            positions=jnp.maximum(meta.group_ctx - 1, 0),
            slot_mapping=jnp.zeros((G,), jnp.int32),
            block_tables=meta.group_tables,
            ctx_lens=meta.group_ctx,
        )
        _, acc1, ml1 = decode_attention(
            qg, k_cache, v_cache, meta1, scale, self.block_size, base,
            softcap=softcap, interpret=self.interpret, return_state=True,
        )
        # Un-permute the stacked state back to (group, member, h, ...).
        acc1 = (
            acc1.reshape(G, kvh, Gmax, g, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(G * Gmax, h, d)
        )
        ml1 = (
            ml1.reshape(G, 2, kvh, Gmax, g, 128)
            .transpose(0, 3, 1, 2, 4, 5)
            .reshape(G * Gmax, 2, h, 128)
        )
        # Scatter to per-sequence carries; ungrouped rows keep the
        # online-softmax identity (0, -inf, 0). Padding members dump
        # into row S.
        idx = jnp.where(
            meta.group_member.reshape(-1) >= 0,
            meta.group_member.reshape(-1),
            S,
        )
        acc0 = (
            jnp.zeros((S + 1, h, d), jnp.float32).at[idx].set(acc1)[:S]
        )
        ml_default = jnp.stack(
            [
                jnp.full((h, 128), float(jnp.finfo(jnp.float32).min)),
                jnp.zeros((h, 128), jnp.float32),
            ]
        )
        ml0 = (
            jnp.broadcast_to(ml_default, (S + 1, 2, h, 128))
            .at[idx]
            .set(ml1)[:S]
        )
        return decode_attention(
            q, k_cache, v_cache, meta, scale, self.block_size, base,
            softcap=softcap, interpret=self.interpret,
            start=meta.seq_start, init_state=(acc0, ml0),
        )


def make_backend(name: str, block_size: int, mesh=None,
                 interpret: bool = False):
    if name == "xla":
        return XlaAttentionBackend(block_size)
    if name == "pallas":
        return PallasAttentionBackend(block_size, mesh, interpret)
    raise ValueError(f"unknown attention backend {name!r}")

"""Pipeline parallelism: layer stages over a "pp" mesh axis.

Beyond the reference (tensor parallelism only, SURVEY.md §2.2). The
natural TPU use is serving models whose weights exceed one tp group's
HBM: stage hand-offs are a single (tokens, hidden) ppermute — point-to-
point ICI/DCN traffic — instead of tp's per-layer all-reduces, so pp
composes with tp across hosts (parallel/multihost.make_pod_mesh).

Design (validated against single-device execution in tests/test_pp.py):

- Stacked layer weights shard their leading layer axis over "pp"
  (models expose that in param_pspecs()); the layer-major flat KV cache
  shards its slot axis the same way, so each stage owns exactly its
  layers' cache rows and the in-place scatter stays local.
- The batch is cut into M microbatches along the token axis (prefill)
  or sequence axis (decode). A `jax.shard_map` manual over "pp" (tp/ep
  stay auto — GSPMD keeps inserting their collectives inside the stage)
  runs the classic M + P - 1 tick schedule: at tick t, stage i runs
  microbatch t - i through its local layers, then ppermutes the
  activations to stage i + 1.
- Bubble ticks (t - i outside [0, M)) run on clamped inputs for shape
  stability; their KV writes are redirected to the trash slot so the
  cache is untouched.
- Embedding / final norm / logits run outside the shard_map in ordinary
  GSPMD land (they are replicated over pp, sharded over tp).

Prefill correctness under token-axis microbatching: packed tokens are in
nondecreasing position order per sequence, and a q row only attends to
keys with k_pos <= q_pos of its own sequence — keys from later
microbatches are masked out, keys from earlier ones were already
scattered when their microbatch passed this stage. Splitting mid-sequence
is therefore safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from minivllm_tpu.ops.attention import DecodeBatch, PrefillBatch

__all__ = ["pipeline_forward"]

# PrefillBatch fields packed along the token axis (split per microbatch);
# the remaining fields (packed context, per-sequence info) are replicated
# to every microbatch.
_PREFILL_TOKEN_FIELDS = ("input_ids", "positions", "q_seg", "slot_mapping")


def _split_meta(meta, M: int):
    """-> (split pytree with leading M axis per split leaf, replicated meta)."""
    if isinstance(meta, DecodeBatch):
        # Optional (None) fields — shared-prefix groups — are never set
        # on pp meshes (group arrays do not split along microbatches;
        # the runner's _detect_groups gates on pp == 1).
        split = {
            f: getattr(meta, f).reshape(M, -1, *getattr(meta, f).shape[1:])
            for f in meta._fields
            if getattr(meta, f) is not None
        }
        return split, None
    split = {
        f: getattr(meta, f).reshape(M, -1) for f in _PREFILL_TOKEN_FIELDS
    }
    # The Pallas prefill kernel's tile metadata derives from the
    # per-sequence packing arrays (q_start / q_lens, with the first q
    # position = ctx_lens - q_lens); those are expressed in GLOBAL
    # packed rows, so each microbatch needs its slice's view: the
    # intersection of [q_start, q_start + q_lens) with the microbatch's
    # row range, re-based to microbatch-local rows, and ctx_lens shrunk
    # to the slice's last position + 1 (also tightening the KV stream
    # bound — later keys are causally masked anyway and not yet
    # written). The XLA oracle ignores all three (it masks per token
    # via q_seg/k_seg/k_pos).
    rows = meta.input_ids.shape[0] // M
    mb0 = jnp.arange(M, dtype=jnp.int32)[:, None] * rows          # (M, 1)
    qs, ql = meta.q_start[None, :], meta.q_lens[None, :]          # (1, S)
    start = jnp.clip(qs - mb0, 0, rows)
    end = jnp.clip(qs + ql - mb0, 0, rows)
    len_mb = jnp.maximum(end - start, 0)
    before = jnp.clip(mb0 - qs, 0, ql)   # q rows consumed by earlier mbs
    qpos0 = (meta.ctx_lens[None, :] - ql) + before
    split["q_start"] = start
    split["q_lens"] = len_mb
    split["ctx_lens"] = jnp.where(len_mb > 0, qpos0 + len_mb, 0)
    return split, meta


def _index_meta(meta_proto, split, mb):
    fields = {f: a[mb] for f, a in split.items()}
    if isinstance(meta_proto, DecodeBatch):
        return DecodeBatch(**fields)
    return meta_proto._replace(**fields)


def pipeline_forward(
    model,
    params: dict,
    batch,
    k_cache,
    v_cache,
    mesh,
    *,
    is_prefill: bool,
    trash_slot: int,
    num_microbatches: int | None = None,
):
    """Drop-in replacement for model.forward on a mesh with pp > 1."""
    ppn = mesh.shape["pp"]
    n_local = model.num_layers // ppn
    x, aux = model.pre_layers(params, batch)
    N = x.shape[0]
    M = num_microbatches
    if M is None:
        # Adaptive microbatch count: the bubble fraction is
        # (P-1)/(M+P-1), so more microbatches help — but each one must
        # still keep the MXU fed (>= min_rows rows) and too many just
        # multiply per-tick overhead; cap the schedule at 4 ticks of
        # work per stage. Prefill microbatches must additionally stay
        # Q_TILE(=64)-multiples — the Pallas prefill kernel's tile unit
        # (the runner packs N as a Q_TILE multiple) — so the split is
        # chosen in tile units; a short prefill may pipeline as a
        # single microbatch (full bubble, but tiny anyway).
        unit = 64 if is_prefill else 1
        min_rows = 64 if is_prefill else 8
        NU = N // unit
        M = ppn
        while M > 1 and NU % M:
            M //= 2
        while (
            M * 2 <= 4 * ppn
            and NU % (M * 2) == 0
            and N // (M * 2) >= min_rows
        ):
            M *= 2
    if N % M:
        raise ValueError(f"batch axis {N} not divisible by {M} microbatches")
    xs = x.reshape(M, N // M, *x.shape[1:])
    aux_mb = jax.tree.map(lambda a: a.reshape(M, N // M, *a.shape[1:]), aux)
    split, meta_rep = _split_meta(batch, M)
    meta_proto = batch

    def stages(layers, k_loc, v_loc, xs, aux_mb, split):
        idx = lax.axis_index("pp")
        shift = [(k, (k + 1) % ppn) for k in range(ppn)]
        recv = lax.pcast(jnp.zeros_like(xs[0]), ("pp",), to="varying")
        out0 = lax.pcast(jnp.zeros_like(xs), ("pp",), to="varying")

        def tick(carry, t):
            recv, out, k_loc, v_loc = carry
            mb = t - idx
            valid = (mb >= 0) & (mb < M)
            mbc = jnp.clip(mb, 0, M - 1)
            meta = _index_meta(meta_proto, split, mbc)
            # Bubble ticks write into the stage's trash block.
            meta = meta._replace(
                slot_mapping=jnp.where(valid, meta.slot_mapping, trash_slot)
            )
            inp = jnp.where(idx == 0, xs[mbc], recv)
            aux_t = jax.tree.map(lambda a: a[mbc], aux_mb)
            y, k_loc, v_loc = model.run_layers(
                layers, inp, meta, k_loc, v_loc, aux_t,
                is_prefill=is_prefill,
                # global index of this stage's first layer, for hooks keyed
                # on the global layer (Gemma2 sliding/full alternation)
                layer_offset=idx * n_local,
            )
            store = valid & (idx == ppn - 1)
            out = out.at[mbc].set(jnp.where(store, y, out[mbc]))
            recv = lax.ppermute(y, "pp", shift)
            return (recv, out, k_loc, v_loc), None

        (_, out, k_loc, v_loc), _ = lax.scan(
            tick, (recv, out0, k_loc, v_loc), jnp.arange(M + ppn - 1)
        )
        hidden = lax.psum(jnp.where(idx == ppn - 1, out, 0), "pp")
        return hidden, k_loc, v_loc

    hidden, k_cache, v_cache = jax.shard_map(
        stages,
        mesh=mesh,
        in_specs=(P("pp"), P("pp"), P("pp"), P(), P(), P()),
        out_specs=(P(), P("pp"), P("pp")),
        axis_names={"pp"},
        # pallas_call (the attention kernels run inside the stage body)
        # has no vma annotations; functional checking stays off exactly
        # like the kernels' own SPMD wrappers (ops/pallas/spmd.py).
        check_vma=False,
    )(params["layers"], k_cache, v_cache, xs, aux_mb, split)

    hidden = hidden.reshape(N, *hidden.shape[2:]).astype(x.dtype)
    return model.post_layers(params, hidden), k_cache, v_cache

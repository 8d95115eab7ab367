"""TPU model runner: bucketed jit step functions over a donated paged KV cache.

This is the TPU-native replacement for the reference's per-rank execution
stack (/root/reference/minivllm/engine/model_runner.py,
inference_executor.py:40-943, models/manager.py):

- Device-graph capture per batch size (inference_executor.py:823-920)
  becomes **bucketed jit compilation**: every (phase, padded-shape) bucket
  is one compiled XLA program, cached; at runtime inputs are padded to the
  smallest fitting bucket.
- The thread-local Context side-channel (utils/context.py) becomes the
  explicit PrefillBatch/DecodeBatch pytree built here each step.
- The KV cache is allocated once as two arrays (L, num_slots, kvh, hd)
  and **donated** through every step so scatters lower in place.
- Sampling runs inside the step function (one device->host transfer per
  step: the sampled token ids).
- No worker processes: under SPMD the same program runs on every chip of
  the mesh; GSPMD inserts collectives (multi-chip wiring lands with the
  parallel milestone).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from minivllm_tpu.config import Config
from minivllm_tpu.engine.sequence import Sequence
from minivllm_tpu.models.registry import create_model
from minivllm_tpu.ops.attention import DecodeBatch, PrefillBatch
from minivllm_tpu.ops.backend import make_backend
from minivllm_tpu.sampling.ops import (
    SamplingState,
    candidate_pool,
    make_mirostat_rows,
    make_state,
    mirostat_tokens,
    sample_tokens,
    token_logprobs,
)
from minivllm_tpu.utils.loader import load_model_params, resolve_model_dir

logger = logging.getLogger(__name__)

__all__ = ["ModelRunner"]

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def _next_pow2(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _pick_bucket(n: int, buckets: list[int]) -> int:
    for b in buckets:
        if b >= n:
            return b
    return _next_pow2(n, buckets[-1] if buckets else 8)


def is_device_oom(e: BaseException) -> bool:
    """Device/compile OOM detection across backends. Direct backends
    raise RESOURCE_EXHAUSTED; the TPU compile RELAY wraps a compile-time
    HBM OOM as `INTERNAL: ...remote_compile: HTTP 500` with the OOM text
    only in the relay's own logs — so a remote-compile 500 is treated as
    possibly-OOM by the bounded shrink-retry paths (a genuine compile
    bug re-raises after the attempts are exhausted)."""
    s = str(e)
    return (
        "RESOURCE_EXHAUSTED" in s
        or "Ran out of memory" in s
        or "Exceeded hbm capacity" in s
        or ("remote_compile" in s and "HTTP 500" in s)
    )


def lax_scan_steps(body, init, num_steps: int):
    """lax.scan over a static iteration count with the index as xs."""
    from jax import lax

    return lax.scan(body, init, jnp.arange(num_steps, dtype=jnp.int32))


class ModelRunner:
    """Owns the model, its parameters, the paged KV cache, and the compiled
    step functions."""

    # Logprob top-k computed ON DEVICE whenever any request wants
    # logprobs. SamplingParams caps logprobs/prompt_logprobs at 20
    # (OpenAI limit), so computing a FIXED top-20 and trimming per
    # sequence host-side keeps the jit program count at logprobs
    # on/off instead of one program per distinct requested k — a
    # first-compile through the relay is a 10-60 s mid-traffic stall
    # (the reference never compiles at runtime,
    # inference_executor.py:823-920; this is the bucketed-jit analog).
    LOGPROB_TOPK = 20

    # HBM held back for activations / compiled-program workspace when
    # auto-sizing the KV cache (reference analog: the 10% utilization
    # margin + empty-cache dance, inference_executor.py:245-318).
    _WORKSPACE_BYTES = 512 * 1024 * 1024

    def __init__(
        self,
        config: Config,
        *,
        init_random: bool = False,
        mesh=None,
    ) -> None:
        import os

        if config.multihost:
            # MUST run before anything initializes the XLA backend
            # (jax.default_backend() below does) — jax.distributed wires
            # the processes only pre-initialization. Idempotent.
            from minivllm_tpu.parallel.multihost import initialize_multihost

            initialize_multihost(
                config.coordinator_address,
                config.num_processes,
                config.process_id,
            )
        # Persistent compile cache: bucket programs survive process
        # restarts (the TPU-side analog of reusing captured device graphs;
        # first-compile latency is the dominant cold-start cost).
        cache_dir = os.environ.get(
            "MINIVLLM_TPU_COMPILE_CACHE",
            os.path.expanduser("~/.cache/minivllm_tpu/xla"),
        )
        if (
            cache_dir
            and jax.config.jax_compilation_cache_dir is None
            and jax.default_backend() != "cpu"
        ):
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        self.config = config
        self.dtype = _DTYPES[config.model_dtype]
        self.kv_quantized = config.kv_dtype == "int8"
        self.kv_dtype = (
            jnp.int8 if self.kv_quantized
            else _DTYPES.get(config.kv_dtype, jnp.bfloat16)
        )
        self.block_size = config.kvcache_block_size
        if mesh is None and config.multihost:
            from minivllm_tpu.parallel.multihost import make_pod_mesh

            mesh = make_pod_mesh(
                # None -> per-host device count (tp all-reduces on ICI).
                tp_size=(
                    config.tensor_parallel_size
                    if config.tensor_parallel_size > 1
                    else None
                ),
                pp_size=config.pipeline_parallel_size,
                dp_size=config.data_parallel_size,
                sp_size=config.sequence_parallel_size,
            )
            logger.info(
                "multihost: process %d/%d, pod mesh %s",
                jax.process_index(), jax.process_count(), dict(mesh.shape),
            )
        elif mesh is None and (
            config.tensor_parallel_size > 1
            or config.data_parallel_size > 1
            or config.sequence_parallel_size > 1
            or config.pipeline_parallel_size > 1
        ):
            from minivllm_tpu.parallel.sharding import make_mesh

            mesh = make_mesh(
                config.tensor_parallel_size,
                dp_size=config.data_parallel_size,
                sp_size=config.sequence_parallel_size,
                pp_size=config.pipeline_parallel_size,
            )
        self.mesh = mesh

        backend_name = "pallas" if config.use_pallas_attention else "xla"
        # pp meshes compose: the pipeline's shard_map is manual over
        # "pp" only, and the attention SPMD wrappers rebuild their
        # nested shard_map on the abstract context mesh inside it
        # (ops/pallas/spmd._resolve_mesh); pure-pp meshes (tp=1) call
        # the kernels directly on pp-local data.
        self.attn_backend = make_backend(
            backend_name, self.block_size, mesh,
            interpret=config.attention_interpret,
        )
        self.model = create_model(config.hf_config, self.dtype, self.attn_backend)
        if config.quantization == "w8a8":
            # Layer matmuls take the int8 x int8 MXU path (ops/quant.qdot
            # a8=True); weights are stored exactly like "int8". The fused
            # quantize-matmul Pallas kernel (ops/pallas/qmatmul.py) is
            # OFF by default: kernel-level it measures parity with the
            # XLA a8 path (+-8% by shape) but the serving A/B/A at the
            # 7B w8a8/256 north-star measured decode 4040/4033 vs 5864
            # tok/s — 31% WORSE — because 196 per-matmul pallas calls
            # per iteration serialize (x reload + in-kernel quantize
            # block the first tile) where XLA fuses the quantize chains
            # into neighbors and overlaps them (docs/performance.md
            # "Fused W8A8 quantize-matmul kernel"). MINIVLLM_W8A8_KERNEL=1
            # re-enables it for re-measurement on future toolchains.
            self.model.a8 = True
            if (
                mesh is None
                and self.attn_backend is not None
                and self.attn_backend.name == "pallas"
                and os.environ.get("MINIVLLM_W8A8_KERNEL", "0") == "1"
            ):
                self.model.a8 = (
                    "pallas_interpret"
                    if getattr(self.attn_backend, "interpret", False)
                    else "pallas"
                )

        t0 = time.perf_counter()
        if config.quantization is not None and not hasattr(
            self.model, "quantize_params"
        ):
            raise ValueError(
                f"model {type(self.model).__name__} has no "
                f"{config.quantization} support"
            )
        if init_random:
            if config.quantization is not None:
                # Build random quantized params directly on device — a full-
                # precision intermediate of a many-billion-param model
                # would not fit HBM (weights are random anyway: bench path).
                self.params = self._init_random_quantized(config.quantization)
            else:
                self.params = self.model.init_params(jax.random.PRNGKey(0))
        else:
            model_dir = resolve_model_dir(config.model)
            self.params = load_model_params(self.model, model_dir)
            if config.quantization is not None:
                self.params = self.model.quantize_params(
                    self.params, config.quantization
                )
        if self.mesh is not None:
            from minivllm_tpu.parallel.sharding import shard_params

            self.params = shard_params(self.model, self.params, self.mesh)
        else:
            self.params = jax.device_put(self.params)
        jax.block_until_ready(jax.tree.leaves(self.params)[0])
        logger.info("weights ready in %.1fs", time.perf_counter() - t0)

        num_blocks = self._resolve_num_blocks()
        # Allocation-time OOM fallback (reference analog: the OOM
        # catch-and-retry in attention_backend.py:596-614): a
        # mis-estimated workspace margin on a new model/chip shrinks the
        # cache 12.5% per attempt instead of failing boot. Compile-time
        # workspace OOMs are handled one level up (engine.warmup).
        for attempt in range(4):
            try:
                self._alloc_cache(num_blocks)
                break
            except Exception as e:  # jaxlib XlaRuntimeError
                if not is_device_oom(e) or num_blocks <= 16:
                    raise
                num_blocks = max(16, num_blocks - num_blocks // 8)
                logger.warning(
                    "KV cache allocation OOM; retrying with %d blocks",
                    num_blocks,
                )

        self._pp = self.mesh.shape.get("pp", 1) if self.mesh is not None else 1
        self._base_key = jax.random.PRNGKey(config.seed if config.seed is not None else 0)
        self._step_counter = 0
        self._compiled: dict = {}
        # Device-resident SamplingState cache: batches usually reuse the
        # same per-seq sampling params, so the 8 small H2D transfers of
        # make_state happen once per distinct batch signature.
        self._state_cache: dict = {}
        self._max_width = (
            config.max_model_len + self.block_size - 1
        ) // self.block_size
        # Metrics (reference: inference_executor.py:143-147, :808-821).
        self.total_prefill_tokens = 0
        self.total_decode_tokens = 0
        self.inference_count = 0
        # Speculative pipeline state (see _maybe_speculate).
        self._spec = None
        # Device-resident n-gram history between fused-spec dispatches
        # (run_spec_multi); None until the first spec dispatch.
        self._spec_hist_cache = None
        self.spec_hits = 0
        self.shared_prefix_steps = 0
        # N-gram speculative decoding counters (engine/spec.py).
        self.ngram_steps = 0
        self.ngram_drafted = 0
        self.ngram_accepted = 0
        # Per-seq (chosen_lp, top_ids, top_lps) of the last run() batch
        # when any sequence requested logprobs, else None.
        self.last_logprobs = None

    def _alloc_cache(self, num_blocks: int) -> None:
        """(Re)allocate the flat donated KV cache at `num_blocks` and
        update the derived trash slot/block and config mirror."""
        self.num_blocks = num_blocks
        self.config.num_kvcache_blocks = num_blocks
        self.trash_slot = num_blocks * self.block_size
        self.trash_block = num_blocks
        L = self.model.num_layers
        kvh = self.model.num_kv_heads
        hd = self.model.head_dim
        num_slots = (num_blocks + 1) * self.block_size
        # Flat multi-layer cache: slot for (layer, block, offset) =
        # layer * num_slots + block * block_size + offset. No per-layer
        # slicing ever materializes a layer copy.
        cache_shape = (L * num_slots, kvh, hd)
        from minivllm_tpu.ops.attention import (
            QuantizedCache,
            make_quantized_cache,
        )

        def make_zeros():
            if self.kv_quantized:
                return make_quantized_cache(
                    L * num_slots, kvh, hd, self.block_size
                )
            return jnp.zeros(cache_shape, self.kv_dtype)

        if self.mesh is not None:
            from jax.sharding import NamedSharding

            from minivllm_tpu.parallel.sharding import cache_pspec

            spec = NamedSharding(self.mesh, cache_pspec())
            if self.kv_quantized:
                # Scale slabs are layer-major on axis 0 like the data, so
                # they shard identically (pp stages own their layers' slabs).
                out_sh = QuantizedCache(data=spec, scale=spec)
            else:
                out_sh = spec
            zeros = jax.jit(make_zeros, out_shardings=out_sh)
            self.k_cache = zeros()
            self.v_cache = zeros()
        else:
            self.k_cache = make_zeros()
            self.v_cache = make_zeros()
        jax.block_until_ready(jax.tree.leaves(self.k_cache)[0])
        cache_bytes = sum(x.nbytes for x in jax.tree.leaves(self.k_cache))
        logger.info(
            "KV cache: %d blocks x %d tokens (%.2f GiB%s)",
            self.num_blocks,
            self.block_size,
            2 * cache_bytes / 2**30,
            ", int8" if self.kv_quantized else "",
        )

    def shrink_kv_cache(self, keep_fraction: float = 0.875) -> int:
        """Free and reallocate the KV cache with fewer blocks — the
        runtime OOM fallback for compile-workspace exhaustion (the cache
        budget's _WORKSPACE_BYTES margin is an estimate; a hungry bucket
        program on a new model/chip can exceed it). Caller must hold NO
        live sequences (block ids shift meaning); engine.warmup drives
        this at boot where that is guaranteed. Returns the new block
        count."""
        new_blocks = int(self.num_blocks * keep_fraction)
        new_blocks = max(min(16, self.num_blocks - 1), new_blocks)
        if not 1 <= new_blocks < self.num_blocks:
            raise RuntimeError(
                f"cannot shrink KV cache below {self.num_blocks} blocks"
            )
        # Drop the old buffers before allocating replacements, then
        # force one tiny dispatch + fetch: buffer deallocation is
        # ASYNCHRONOUS (and through the TPU relay it queues behind
        # dispatches), so an immediate reallocation can still see the
        # device at its OOM high-water mark — measured round 5: a
        # recovery failed 8 compounding shrinks while jax.live_arrays()
        # showed only 1.1 GiB of 15.75 actually referenced. The round
        # trip drains the deletion queue before the new allocation.
        self.k_cache = self.v_cache = None
        import numpy as _np

        _np.asarray(jnp.add(jnp.zeros((8,), jnp.int32), 1))
        self._alloc_cache(new_blocks)
        return new_blocks

    def _init_random_quantized(self, fmt: str = "int8") -> dict:
        """Random parameters with quant-plan kernels generated as int8/fp8 +
        scales directly (no full-precision intermediate)."""
        shapes = jax.eval_shape(self.model.init_params, jax.random.PRNGKey(0))
        plan = self.model.quant_plan()
        key = jax.random.PRNGKey(0)

        def walk(node, path):
            if isinstance(node, dict):
                return {k: walk(v, path + (k,)) for k, v in node.items()}
            nonlocal key
            key, sub = jax.random.split(key)
            if path in plan:
                reduce_axes = plan[path]
                s_shape = tuple(
                    1 if i in reduce_axes else d
                    for i, d in enumerate(node.shape)
                )
                if fmt == "fp8":
                    w = (jax.random.normal(sub, node.shape) * 150.0).astype(
                        jnp.float8_e4m3fn
                    )
                    return {
                        "w": w,
                        "s": jnp.full(s_shape, 0.02 / 150.0, jnp.float32),
                    }
                return {
                    "w": jax.random.randint(
                        sub, node.shape, -127, 128, jnp.int8
                    ),
                    "s": jnp.full(s_shape, 0.02 / 127.0, jnp.float32),
                }
            name = path[-1]
            if "norm" in name or name.startswith("ln") or "_ln" in name:
                # Identity norm scale (0.0 for Gemma's (1 + w) convention).
                return jnp.full(
                    node.shape, getattr(self.model, "norm_init", 1.0),
                    node.dtype,
                )
            if "bias" in name:
                return jnp.zeros(node.shape, node.dtype)
            return jax.random.normal(sub, node.shape, node.dtype) * jnp.asarray(
                0.02, node.dtype
            )

        return walk(shapes, ())

    # -- sizing --------------------------------------------------------------

    def _bytes_per_block(self) -> int:
        m = self.model
        per_block = (
            self.block_size
            * m.num_kv_heads
            * m.head_dim
            * jnp.dtype(self.kv_dtype).itemsize
        )
        if self.kv_quantized:
            from minivllm_tpu.ops.attention import scale_lanes

            per_block += m.num_kv_heads * scale_lanes(self.block_size) * 4
        return 2 * m.num_layers * per_block

    # Physical HBM per chip by device kind: the budget fallback when the
    # runtime reports no memory_stats (the TPU relay in this environment
    # returns None). Without this, the sizer fell through to the
    # CPU-style "enough blocks for the configured load" branch, which at
    # a 2048-token x 64-seq config allocated 15.5 of 15.75 GiB and left
    # no headroom for program temps — the first prefill OOM'd and (this
    # relay holds a failed dispatch's donated buffers) recovery could
    # not free it (measured round 5).
    _HBM_BY_KIND = {
        "tpu v7": 192 * 2**30,
        "tpu v6 lite": 32 * 2**30,
        "tpu v6": 32 * 2**30,
        "tpu v5p": 95 * 2**30,
        "tpu v5 lite": 16 * 2**30,
        "tpu v5": 16 * 2**30,
        "tpu v4": 32 * 2**30,
        "tpu v3": 16 * 2**30,
        "tpu v2": 8 * 2**30,
    }

    def _resolve_num_blocks(self) -> int:
        if self.config.num_kvcache_blocks > 0:
            return self.config.num_kvcache_blocks
        # local_devices: under multi-host, jax.devices()[0] may belong to
        # another process (MemoryStats needs an addressable device).
        dev = jax.local_devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        estimated = False
        if not limit and dev.platform != "cpu":
            kind = (dev.device_kind or "").lower()
            for k, v in self._HBM_BY_KIND.items():
                if kind.startswith(k):
                    limit = v
                    estimated = True
                    break
        need = (
            self.config.max_num_seqs
            * (self.config.max_model_len // self.block_size + 1)
        )
        if not limit:
            # CPU or unknown accelerator: enough blocks for the
            # configured load.
            return min(need, 4096)
        weight_bytes = sum(x.nbytes for x in jax.tree.leaves(self.params))
        budget = (
            int(limit * self.config.device_memory_utilization)
            - weight_bytes
            - self._WORKSPACE_BYTES
        )
        if estimated:
            # The limit is a device-kind guess, not a runtime report, so
            # true free memory is invisible. Keep 30% of the post-weight
            # budget as temp headroom and never exceed the configured
            # load's demand: a 64-seq x 2048-token config measured OOM at
            # 1636 blocks (1.85 GiB headroom) and healthy at 1300 (5 GiB)
            # — the per-step temp appetite scales with the cache itself.
            post_weight = int(limit * self.config.device_memory_utilization
                              ) - weight_bytes
            budget = min(budget, int(post_weight * 0.7))
            num = min(budget // self._bytes_per_block(), need)
            if num >= 16:
                return int(num)
        num = budget // self._bytes_per_block()
        if num < 16:
            raise RuntimeError(
                f"not enough device memory for KV cache: limit={limit}, "
                f"weights={weight_bytes}, budget={budget}"
            )
        return int(num)

    # -- step compilation ----------------------------------------------------

    # Metadata crosses host->device as a couple of packed int32 arrays (one
    # H2D transfer each) and is unpacked into the batch pytree inside the
    # jitted program — per-transfer latency, not bytes, dominates small
    # host->device copies.

    def _forward(self, params, meta, k_cache, v_cache, *, is_prefill):
        """model.forward, routed through the pipeline when pp > 1."""
        if self._pp > 1:
            from minivllm_tpu.parallel.pipeline import pipeline_forward

            return pipeline_forward(
                self.model, params, meta, k_cache, v_cache, self.mesh,
                is_prefill=is_prefill, trash_slot=self.trash_slot,
            )
        return self.model.forward(
            params, meta, k_cache, v_cache, is_prefill=is_prefill
        )

    def _prompt_logprobs(self, params, hidden, targets, plp_k: int):
        """Per-packed-row logprobs of the NEXT prompt token (targets row
        of packed_t; -1 on rows whose successor is not a prompt token).
        Computed in vocab-bounded chunks via lax.map — materializing
        logits for every packed row at once would cost T x vocab floats
        (gigabytes at large prefill buckets)."""
        T = hidden.shape[0]
        CH = 64  # T is always a Q_TILE(=64) multiple (see _prepare_prefill)

        def chunk_fn(xs):
            h, t = xs
            logits = self.model.compute_logits(params, h).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            chosen = jnp.take_along_axis(
                logp, jnp.clip(t, 0, None)[:, None], axis=1
            )[:, 0]
            if plp_k > 0:
                from minivllm_tpu.sampling.ops import chunked_top_k

                top_lp, top_id = chunked_top_k(logp, plp_k)
            else:
                top_id = jnp.zeros((h.shape[0], 0), jnp.int32)
                top_lp = jnp.zeros((h.shape[0], 0), jnp.float32)
            return chosen, top_id.astype(jnp.int32), top_lp

        out = jax.lax.map(
            chunk_fn,
            (
                hidden.reshape(T // CH, CH, hidden.shape[-1]),
                targets.reshape(T // CH, CH),
            ),
        )
        return jax.tree.map(lambda x: x.reshape((T,) + x.shape[2:]), out)

    def _prefill_step(
        self, with_filters, typical, lp_k, plp_k, seeded, m_on, pool,
        params, k_cache, v_cache, packed_t, packed_c, packed_s, tables,
        state, key, hist=None, m=None, bias=None,
    ):
        from minivllm_tpu.parallel.sharding import shard_batch

        meta = shard_batch(
            PrefillBatch(
                input_ids=packed_t[0],
                positions=packed_t[1],
                q_seg=packed_t[2],
                slot_mapping=packed_t[3],
                ctx_slot_mapping=packed_c[0],
                k_seg=packed_c[1],
                k_pos=packed_c[2],
                last_token_idx=packed_s[0],
                ctx_lens=packed_s[1],
                block_tables=tables,
                q_start=packed_s[2],
                q_lens=packed_s[3],
            ),
            self.mesh,
        )
        hidden, k_cache, v_cache = self._forward(
            params, meta, k_cache, v_cache, is_prefill=True
        )
        last = hidden[meta.last_token_idx]
        logits = self.model.compute_logits(params, last)
        positions = packed_s[1]  # sampled-token position = context length
        toks = sample_tokens(
            logits, state, key,
            all_tokens=None if hist is None else hist[0],
            out_tokens=None if hist is None else hist[1],
            with_filters=with_filters,
            typical_active=typical,
            positions=positions, seeded=seeded, pool=pool, bias=bias,
        )
        # Mirostat overrides the token BEFORE logprobs so a request with
        # both reports the logprob of the token actually emitted.
        if m_on:
            toks, mu = mirostat_tokens(
                logits, toks, m, key, state, positions, seeded
            )
        lp = None if lp_k is None else token_logprobs(logits, toks, lp_k)
        plp = (
            None
            if plp_k is None
            else self._prompt_logprobs(params, hidden, packed_t[4], plp_k)
        )
        if m_on:
            return toks, lp, plp, mu, k_cache, v_cache
        return toks, lp, plp, k_cache, v_cache

    def _verify_step(
        self, params, k_cache, v_cache, packed_t, packed_c, packed_s,
        tables, rows,
    ):
        """Speculative verification: a prefill-shaped pass over each
        sequence's [last committed token] + draft tokens, returning the
        greedy argmax at EVERY draft row (rows (S_pad, k+1) packed-row
        indices) — the host accepts the longest matching prefix.
        Greedy-only by design: acceptance == argmax equality keeps the
        emitted stream bit-identical to plain greedy decoding, so no
        rejection-sampling machinery is needed."""
        from minivllm_tpu.parallel.sharding import shard_batch

        meta = shard_batch(
            PrefillBatch(
                input_ids=packed_t[0],
                positions=packed_t[1],
                q_seg=packed_t[2],
                slot_mapping=packed_t[3],
                ctx_slot_mapping=packed_c[0],
                k_seg=packed_c[1],
                k_pos=packed_c[2],
                last_token_idx=packed_s[0],
                ctx_lens=packed_s[1],
                block_tables=tables,
                q_start=packed_s[2],
                q_lens=packed_s[3],
            ),
            self.mesh,
        )
        hidden, k_cache, v_cache = self._forward(
            params, meta, k_cache, v_cache, is_prefill=True
        )
        sel = hidden[rows.reshape(-1)]
        logits = self.model.compute_logits(params, sel)
        from minivllm_tpu.sampling.ops import fast_argmax

        toks = fast_argmax(logits)
        return toks.reshape(rows.shape), k_cache, v_cache

    def _decode_step(
        self, with_filters, typical, lp_k, seeded, m_on, pool, params,
        k_cache, v_cache, packed, tables, state, key, prev_toks=None,
        hist=None, groups=None, m=None, bias=None,
    ):
        from minivllm_tpu.parallel.sharding import shard_batch

        meta = shard_batch(
            DecodeBatch(
                # Speculative steps feed the previous step's sampled tokens
                # straight from the device array — no host round trip.
                input_ids=packed[0] if prev_toks is None else prev_toks,
                positions=packed[1],
                slot_mapping=packed[2],
                ctx_lens=packed[3],
                block_tables=tables,
                **(groups or {}),
            ),
            self.mesh,
        )
        hidden, k_cache, v_cache = self._forward(
            params, meta, k_cache, v_cache, is_prefill=False
        )
        logits = self.model.compute_logits(params, hidden)
        positions = packed[3]  # sampled-token position = context length
        toks = sample_tokens(
            logits, state, key,
            all_tokens=None if hist is None else hist[0],
            out_tokens=None if hist is None else hist[1],
            with_filters=with_filters,
            # typical_active was silently dropped here before — the
            # single-step decode path ignored typical_p entirely.
            typical_active=typical,
            positions=positions, seeded=seeded, pool=pool, bias=bias,
        )
        # Mirostat overrides the token BEFORE logprobs so a request with
        # both reports the logprob of the token actually emitted.
        if m_on:
            toks, mu = mirostat_tokens(
                logits, toks, m, key, state, positions, seeded
            )
        lp = None if lp_k is None else token_logprobs(logits, toks, lp_k)
        if m_on:
            return toks, lp, mu, k_cache, v_cache
        return toks, lp, k_cache, v_cache

    def _decode_multi_step(
        self, with_filters, typical, num_steps, seeded, pool, params,
        k_cache, v_cache, packed, tables, state, key, groups=None,
    ):
        """`num_steps` fused decode iterations: sampled tokens feed the next
        iteration on device; returns (num_steps, S) tokens.

        packed rows: [0]=first input token, [1]=base position, [2]=unused,
        [3]=base context length. Per-iteration slots are derived from the
        block tables in-jit (the scheduler pre-allocated the window).
        """
        bs = self.block_size
        from minivllm_tpu.parallel.sharding import shard_batch

        def body(carry, i):
            k_cache, v_cache, toks = carry
            pos = packed[1] + i
            blk = jnp.take_along_axis(tables, (pos // bs)[:, None], axis=1)[:, 0]
            meta = shard_batch(
                DecodeBatch(
                    input_ids=toks,
                    positions=pos,
                    slot_mapping=blk * bs + pos % bs,
                    ctx_lens=packed[3] + i,
                    block_tables=tables,
                    **(groups or {}),
                ),
                self.mesh,
            )
            hidden, k_cache, v_cache = self._forward(
                params, meta, k_cache, v_cache, is_prefill=False
            )
            logits = self.model.compute_logits(params, hidden)
            toks = sample_tokens(
                logits, state, jax.random.fold_in(key, i),
                with_filters=with_filters,
                typical_active=typical,
                positions=packed[3] + i, seeded=seeded, pool=pool,
            )
            return (k_cache, v_cache, toks), toks

        (k_cache, v_cache, _), all_toks = lax_scan_steps(
            body, (k_cache, v_cache, packed[0]), num_steps
        )
        return all_toks, k_cache, v_cache

    def _spec_multi_step(
        self, num_steps, k, ngram, window, with_filters, greedy_only,
        seeded, pool, params, k_cache, v_cache, packed, tables, temps,
        fparams, seeds, key, hist, lens,
    ):
        """Fused speculative decode: `num_steps` iterations, each of which
        proposes up to `k` n-gram draft tokens ON DEVICE from the carried
        history buffer, verifies them in ONE decode-shaped pass over
        S*(k+1) virtual rows (row i = query for position len+i, ctx
        bound len+i+1 — all rows share the sequence's block table, and
        the in-layer KV store writes every row's KV before attention so
        causality holds within the row block), and emits the accepted
        prefix + one model token (greedy bit-parity at temperature 0;
        exact rejection sampling otherwise — engine/spec.py).

        Rejected rows' KV writes land at positions the sequence has not
        reached; they are rewritten when it does (same slot formula) —
        the same overshoot contract as the plain fused window.

        packed rows: [0]=last committed token, [1]=its position,
        [3]=context length. hist (S, HL) trailing token history in
        LOCAL coordinates with lengths `lens` (host-clipped to the
        proposal window; HL covers window + num_steps*(k+1) headroom).
        temps (S,) fp32 per-seq temperatures; fparams (3, S) per-seq
        (top_k, top_p, min_p) rows, applied to the verify distribution
        before rejection sampling when `with_filters` (static) is set —
        engine/spec.py accept_or_resample. Returns (tokens
        (num_steps, S, k+1), counts (num_steps, S), drafted
        (num_steps, S), caches)."""
        from minivllm_tpu.engine.spec import (
            accept_or_resample,
            propose_ngram_device,
        )
        from minivllm_tpu.parallel.sharding import shard_batch

        bs = self.block_size
        S = packed.shape[1]
        K1 = k + 1
        rep = lambda x: jnp.repeat(x, K1, axis=0)  # noqa: E731
        iota = jnp.arange(K1, dtype=jnp.int32)

        def body(carry, i):
            k_cache, v_cache, hist, lens, last, adv = carry
            drafts = propose_ngram_device(hist, lens, ngram, k, window)
            row_in = jnp.concatenate(
                [last[:, None], jnp.where(drafts >= 0, drafts, 0)], axis=1
            )                                              # (S, K1)
            pos = (packed[1] + adv)[:, None] + iota        # (S, K1)
            flat_pos = pos.reshape(-1)
            tables_rep = rep(tables)                       # (S*K1, W)
            blk = jnp.take_along_axis(
                tables_rep, (flat_pos // bs)[:, None], axis=1
            )[:, 0]
            # The k+1 verify rows of one sequence share its block table
            # and consecutive positions: the Pallas backend processes
            # them as ONE multi-row work item (decode_attention
            # qrows=k+1, set via backend.spec_qrows at trace time), so
            # per-item kernel cost and KV streaming are paid once per
            # SEQUENCE, not once per verify row. The XLA oracle runs
            # the same rows per-row.
            meta = shard_batch(
                DecodeBatch(
                    input_ids=row_in.reshape(-1),
                    positions=flat_pos,
                    slot_mapping=blk * bs + flat_pos % bs,
                    ctx_lens=flat_pos + 1,
                    block_tables=tables_rep,
                ),
                self.mesh,
            )
            hidden, k_cache, v_cache = self._forward(
                params, meta, k_cache, v_cache, is_prefill=False
            )
            logits = self.model.compute_logits(params, hidden)
            logits = logits.reshape(S, K1, -1)
            toks, cnt = accept_or_resample(
                logits, drafts, temps, jax.random.fold_in(key, i),
                filters=fparams if with_filters else None,
                greedy_only=greedy_only,
                # Per-request seeds (static `seeded` selects the per-row
                # key path): draws derive from (seed, first emission
                # position) — reproducible across restarts and batches.
                seeds=seeds if seeded else None,
                positions=packed[1] + adv + 1 if seeded else None,
                pool=pool,
            )
            upd = lens[:, None] + iota
            hist = hist.at[
                jnp.arange(S, dtype=jnp.int32)[:, None], upd
            ].set(toks)
            lens = lens + cnt
            adv = adv + cnt
            last = jnp.take_along_axis(toks, (cnt - 1)[:, None], axis=1)[:, 0]
            drafted = jnp.sum((drafts >= 0).astype(jnp.int32), axis=1)
            return (k_cache, v_cache, hist, lens, last, adv), (
                toks, cnt, drafted
            )

        carry0 = (
            k_cache, v_cache, hist, lens, packed[0],
            jnp.zeros((S,), jnp.int32),
        )
        (k_cache, v_cache, hist, lens, *_), (all_toks, all_cnt, all_drafted) = (
            lax_scan_steps(body, carry0, num_steps)
        )
        return all_toks, all_cnt, all_drafted, k_cache, v_cache, hist, lens

    def run_spec_multi(
        self, seqs: list[Sequence], num_steps: int
    ) -> list[tuple[list[list[int]], list[int]]]:
        """Fused in-jit speculative decode (config.speculative_fused):
        dispatch count identical to run_multi(num_steps), but each
        iteration can emit up to speculative_num_tokens + 1 tokens per
        sequence. Returns per-step (token-columns, counts): step_toks[s]
        holds that sequence's emitted tokens (counts[s] of them valid).
        The scheduler must have reserved num_steps * (k+1) lookahead.
        Greedy rows are bit-identical to plain greedy decoding;
        temperature > 0 rows follow the exact target distribution
        (rejection sampling, engine/spec.py)."""
        from minivllm_tpu.engine.spec import PROPOSE_WINDOW

        k = self.config.speculative_num_tokens
        ngram = self.config.speculative_ngram
        window = PROPOSE_WINDOW
        S = len(seqs)
        self._spec = None
        self.last_logprobs = None
        packed, tables, S_pad, _ = self._prepare_decode(seqs)
        # Trailing history in local coordinates. The buffer carries
        # headroom for SEVERAL windows' appends so consecutive spec
        # dispatches can REUSE the device-resident history the scan
        # returns (one H2D of (S_pad, ~1KB/row) costs a full relay
        # round trip, ~25 ms — as much as half the dispatch itself).
        win_cap = num_steps * (k + 1)
        HL = window + ngram + self.SPEC_HIST_REUSE * win_cap + 1
        temps = np.zeros((S_pad,), np.float32)
        top_k = np.full((S_pad,), -1, np.int32)
        top_p = np.ones((S_pad,), np.float32)
        min_p = np.zeros((S_pad,), np.float32)
        seeds = np.full((S_pad,), -1, np.int32)
        with_filters = False
        greedy_only = True
        seeded = False
        for i, s in enumerate(seqs):
            sp = s.sampling_params
            temps[i] = sp.temperature
            top_k[i], top_p[i], min_p[i] = sp.top_k, sp.top_p, sp.min_p
            if sp.seed is not None:
                seeds[i] = sp.seed
                seeded = True
            if sp.temperature > 0:
                greedy_only = False
                if sp.top_k > 0 or sp.top_p < 1.0 or sp.min_p > 0.0:
                    with_filters = True
        # Device-hist reuse: valid when the same sequences (same order)
        # are exactly where the previous spec dispatch left them and the
        # buffer still has one window of headroom.
        sig = (tuple(s.seq_id for s in seqs), tuple(len(s) for s in seqs))
        cache = self._spec_hist_cache
        if (
            cache is not None
            and cache["sig"] == sig
            and cache["S_pad"] == S_pad
            and cache["HL"] == HL
            and cache["max_len"] + win_cap + 1 <= HL
        ):
            hist_dev, lens_dev = cache["hist"], cache["lens"]
            lens_host = cache["lens_host"]
        else:
            hist = np.zeros((S_pad, HL), np.int32)
            lens_host = np.zeros((S_pad,), np.int32)
            for i, s in enumerate(seqs):
                tail = s.token_ids[-(window + ngram):]
                hist[i, : len(tail)] = tail
                lens_host[i] = len(tail)
            hist_dev, lens_dev = jnp.asarray(hist), jnp.asarray(lens_host)
        pool = candidate_pool([s.sampling_params for s in seqs])
        fkey = (
            "spec_multi", num_steps, k, with_filters, greedy_only, seeded,
            pool,
        )
        fn = self._compiled.get(fkey)
        if fn is None:
            fn = jax.jit(
                partial(
                    self._spec_multi_step, num_steps, k, ngram, window,
                    with_filters, greedy_only, seeded, pool,
                ),
                donate_argnums=(1, 2, 9, 10),  # caches, hist, lens
            )
            self._compiled[fkey] = fn
        key = jax.random.fold_in(self._base_key, self._step_counter)
        self._step_counter += 1
        # Multi-row verify items: the Pallas decode kernel folds each
        # sequence's k+1 verify rows into ONE work item (qrows) — the
        # attribute is read at TRACE time only, so set it around the
        # call (any retrace for a new shape sees it) and clear after.
        try:
            self.attn_backend.spec_qrows = k + 1
            (
                all_toks, all_cnt, all_drafted,
                self.k_cache, self.v_cache, hist_out, lens_out,
            ) = fn(
                self.params, self.k_cache, self.v_cache, packed, tables,
                jnp.asarray(temps),
                (jnp.asarray(top_k), jnp.asarray(top_p), jnp.asarray(min_p)),
                jnp.asarray(seeds), key, hist_dev, lens_dev,
            )
        finally:
            self.attn_backend.spec_qrows = 1
        toks_h = np.asarray(all_toks[:, :S])
        cnt_full = np.asarray(all_cnt)           # (num_steps, S_pad)
        cnt_h = cnt_full[:, :S]
        drafted_h = np.asarray(all_drafted[:, :S])
        # Cache the advanced history for the NEXT spec dispatch: the
        # expected host lengths assume the engine appends every emitted
        # token (true for sequences that stay live; finished/preempted
        # ones change the sig and force a rebuild).
        new_lens_host = lens_host + cnt_full.sum(axis=0)
        self._spec_hist_cache = {
            "sig": (
                sig[0],
                tuple(
                    sig[1][i] + int(cnt_h[:, i].sum()) for i in range(S)
                ),
            ),
            "S_pad": S_pad,
            "HL": HL,
            "hist": hist_out,
            "lens": lens_out,
            "lens_host": new_lens_host,
            "max_len": int(new_lens_host.max()) if S_pad else 0,
        }
        self.inference_count += 1
        self.ngram_steps += num_steps
        self.ngram_drafted += int(drafted_h.sum())
        self.ngram_accepted += int((cnt_h - 1).sum())
        return [
            (toks_h[t].tolist(), cnt_h[t].tolist(), drafted_h[t].tolist())
            for t in range(num_steps)
        ]

    def _get_step_fn(
        self, phase: str, with_filters: bool, num_steps: int = 1,
        typical: bool = False, lp_k: int | None = None,
        plp_k: int | None = None, seeded: bool = False, m_on: bool = False,
        pool: int = 64,
    ):
        cache_key = (
            phase, with_filters, num_steps, typical, lp_k, plp_k, seeded,
            m_on, pool,
        )
        fn = self._compiled.get(cache_key)
        if fn is None:
            if phase == "prefill":
                fn = jax.jit(
                    partial(
                        self._prefill_step, with_filters, typical, lp_k,
                        plp_k, seeded, m_on, pool,
                    ),
                    donate_argnums=(1, 2),
                )
            elif phase == "verify":
                fn = jax.jit(self._verify_step, donate_argnums=(1, 2))
            elif num_steps > 1:
                fn = jax.jit(
                    partial(self._decode_multi_step, with_filters, typical,
                            num_steps, seeded, pool),
                    donate_argnums=(1, 2),
                )
            else:
                fn = jax.jit(
                    partial(self._decode_step, with_filters, typical, lp_k,
                            seeded, m_on, pool),
                    donate_argnums=(1, 2),
                )
            self._compiled[cache_key] = fn
        return fn

    # -- speculative decode pipelining ---------------------------------------
    #
    # After dispatching decode step N, the next step is dispatched
    # immediately with the step-N token array still on device as its input,
    # and only then are step N's tokens fetched — the device->host transfer
    # overlaps step N+1's compute. If the scheduler's next batch differs
    # (a sequence finished, was preempted, or crossed a block boundary),
    # the speculative step is discarded: its sampled tokens are ignored and
    # its KV writes are harmless — for continuing sequences they are
    # exactly the writes the real step would do (same slots, same values),
    # and writes from finished rows land in blocks that any future owner
    # fully rewrites during its own prefill.

    def _build_hist(self, seqs, S_pad):
        """Token histories for penalty application: (all tokens, output
        tokens), padded with -1 (reference passes the same tensors to its
        penalty kernels, functional.py:342-407).

        H is quantized to at most TWO classes (512 and max_model_len) so
        penalty traffic compiles at most two programs per (batch bucket,
        table width) instead of one per pow2 length — a runtime compile
        through the relay stalls serving 10-60 s. The padding cost is
        H2D bytes only (penalty rows already run the single-step path)."""
        cap = _next_pow2(self.config.max_model_len, 32)
        H = min(512, cap) if max(len(s) for s in seqs) <= min(512, cap) \
            else cap
        all_t = np.full((S_pad, H), -1, np.int32)
        out_t = np.full((S_pad, H), -1, np.int32)
        for i, s in enumerate(seqs):
            all_t[i, : len(s)] = s.token_ids
            ct = s.completion_token_ids
            if ct:
                out_t[i, : len(ct)] = ct
        return (jnp.asarray(all_t), jnp.asarray(out_t))

    def _width_class(self, width: int) -> int:
        """Decode block-table width class: THREE classes — 2 (the
        short-context serving headline: 1-2 blocks), 8 (the boundary of
        the kernel's narrow mblk=4 spans), and the model-length cap —
        instead of one per pow2. The Pallas kernel treats every W > 8
        identically (_pick_mblk), padding entries cost H2D bytes and
        work-list padding only (the kernel's fori_loop runs real
        items), and the compiled decode-program count per (batch
        bucket, window, variant) drops from log2(max_blocks) to <= 3 —
        so warmup() can cover EVERY decode program and no table width
        triggers a 10-60 s relay compile mid-serving. Measured
        (docs/performance.md "Width classes"): class-matched shapes are
        throughput-neutral vs per-pow2 widths; a 2-class variant lost
        ~2% at the 0.6b short-context point, which the {2} class
        recovers. `MINIVLLM_DECODE_WCLASSES=pow2` restores per-pow2
        widths for A/B measurement."""
        if os.environ.get("MINIVLLM_DECODE_WCLASSES") == "pow2":
            return _next_pow2(width, 1)
        # The cap must cover the scheduler's lookahead reservation: a
        # table can extend past ceil(max_model_len / bs) by the fused
        # window's reserved blocks (may_append with lookahead).
        cfg = self.config
        lookahead = cfg.decode_multi_step * (
            cfg.speculative_num_tokens + 1
            if cfg.speculative_num_tokens > 0 and cfg.speculative_fused
            else 1
        )
        max_blocks = (cfg.max_model_len - 2 + lookahead) // self.block_size + 1
        cap = _next_pow2(max_blocks, 1)
        cls = 2 if width <= 2 else 8 if width <= 8 else cap
        return min(cls, cap)

    def _build_bias(self, seqs, S_pad):
        """(ids, vals) arrays for per-request logit_bias, padded to a
        pow2 width (-1 id rows are inert in sample_tokens)."""
        B = _next_pow2(
            max(len(s.sampling_params.logit_bias or {}) for s in seqs), 8
        )
        ids = np.full((S_pad, B), -1, np.int32)
        vals = np.zeros((S_pad, B), np.float32)
        for i, s in enumerate(seqs):
            lb = s.sampling_params.logit_bias
            if lb:
                for j, (t, b) in enumerate(lb.items()):
                    ids[i, j] = t
                    vals[i, j] = b
        return (jnp.asarray(ids), jnp.asarray(vals))

    def _decode_signature(self, seqs, S_pad, W):
        return (
            tuple(s.seq_id for s in seqs),
            tuple(len(s) for s in seqs),
            tuple(id(s.sampling_params) for s in seqs),
            S_pad,
            W,
        )

    def _maybe_speculate(
        self, seqs, toks_dev, with_filters, typical, S_pad, W, groups=None
    ):
        bs = self.block_size
        # Only when no sequence needs a new block next step. Mirostat rows
        # never pipeline: the speculative step would sample without the
        # updated mu.
        if any(len(s) % bs == 0 for s in seqs) or any(
            s.sampling_params.mirostat > 0 for s in seqs
        ):
            return
        seeded = any(s.sampling_params.seed is not None for s in seqs)
        S = len(seqs)
        packed = np.zeros((4, S_pad), np.int32)
        packed[2, S:] = self.trash_slot
        tables = np.full((S_pad, W), self.trash_block, np.int32)
        for s, seq in enumerate(seqs):
            pos = len(seq)  # the token postprocess is about to append
            packed[1, s] = pos
            packed[2, s] = seq.block_table[pos // bs] * bs + pos % bs
            packed[3, s] = pos + 1
            tables[s, : len(seq.block_table)] = seq.block_table
        state = self._get_state([s.sampling_params for s in seqs], S_pad)
        key = jax.random.fold_in(self._base_key, self._step_counter)
        self._step_counter += 1
        fn = self._get_step_fn(
            "decode", with_filters, typical=typical, seeded=seeded,
            pool=candidate_pool([s.sampling_params for s in seqs]),
        )
        toks, _, self.k_cache, self.v_cache = fn(
            self.params, self.k_cache, self.v_cache,
            jnp.asarray(packed), jnp.asarray(tables), state, key, toks_dev,
            groups=groups,
        )
        self._spec = {
            "sig": (
                tuple(s.seq_id for s in seqs),
                tuple(len(s) + 1 for s in seqs),
                tuple(id(s.sampling_params) for s in seqs),
                S_pad,
                W,
            ),
            "toks": toks,
        }

    def _get_state(self, params_list, S_pad: int):
        sig = (
            S_pad,
            tuple(
                (
                    sp.temperature, sp.top_k, sp.top_p, sp.min_p,
                    sp.typical_p, sp.repetition_penalty,
                    sp.frequency_penalty, sp.presence_penalty,
                    sp.avoid_top_k, sp.seed,
                )
                for sp in params_list
            ),
        )
        state = self._state_cache.get(sig)
        if state is None:
            if len(self._state_cache) > 256:
                self._state_cache.clear()
            state = make_state(params_list, S_pad)
            self._state_cache[sig] = state
        return state

    # -- batch preparation ---------------------------------------------------

    def _prepare_prefill(self, seqs: list[Sequence]):
        """Pack new tokens at Q_TILE-aligned per-sequence offsets (required
        by the Pallas prefill kernel; the XLA oracle treats the alignment
        holes as ordinary padding rows)."""
        from minivllm_tpu.ops.pallas.prefill_attention import Q_TILE

        bs = self.block_size
        S = len(seqs)
        # Chunked prefill: each sequence computes its scheduler-assigned
        # [start, end) token window; context covers [0, end).
        ranges = [
            seq.chunk_range or (seq.num_cached_tokens, len(seq)) for seq in seqs
        ]
        q_lens = [end - start for start, end in ranges]
        q_start = []
        ofs = 0
        for ql in q_lens:
            q_start.append(ofs)
            ofs += -(-ql // Q_TILE) * Q_TILE
        T = _pick_bucket(max(ofs, 1), self.config.prefill_token_buckets)
        # Q_TILE alignment for the Pallas kernel; under sequence
        # parallelism the tile axis also shards evenly over sp
        # (shard_map needs exact divisibility, unlike GSPMD).
        mult = Q_TILE * (self.mesh.shape.get("sp", 1) if self.mesh else 1)
        if T % mult:
            T = -(-T // mult) * mult

        # Row 4 holds the NEXT token id at each packed position (-1 when
        # there is none): the prompt-logprob target — token i+1's logprob
        # comes from the logits at position i.
        packed_t = np.zeros((5, T), np.int32)
        packed_t[2, :] = -1
        packed_t[3, :] = self.trash_slot
        packed_t[4, :] = -1
        ctx_slots, k_seg, k_pos, last_idx = [], [], [], []
        for s, seq in enumerate(seqs):
            table = seq.block_table
            start, end = ranges[s]
            o = q_start[s]
            for j, i in enumerate(range(start, end)):
                packed_t[0, o + j] = seq.token_ids[i]
                packed_t[1, o + j] = i
                packed_t[2, o + j] = s
                packed_t[3, o + j] = table[i // bs] * bs + i % bs
                if i + 1 < len(seq):
                    packed_t[4, o + j] = seq.token_ids[i + 1]
            last_idx.append(o + q_lens[s] - 1)
            for i in range(end):
                ctx_slots.append(table[i // bs] * bs + i % bs)
                k_seg.append(s)
                k_pos.append(i)

        C = _next_pow2(len(ctx_slots), 64)
        S_pad = _next_pow2(S, 8)
        W = self._max_width
        packed_c = np.zeros((3, C), np.int32)
        m = len(ctx_slots)
        packed_c[0, :m] = ctx_slots
        packed_c[0, m:] = self.trash_slot
        packed_c[1, :m] = k_seg
        packed_c[1, m:] = -2
        packed_c[2, :m] = k_pos
        packed_s = np.zeros((4, S_pad), np.int32)
        packed_s[0, :S] = last_idx
        packed_s[0, S:] = T - 1
        packed_s[1, :S] = [end for _, end in ranges]  # context length
        packed_s[2, :S] = q_start
        packed_s[3, :S] = q_lens
        tables = np.full((S_pad, W), self.trash_block, np.int32)
        for s, seq in enumerate(seqs):
            tables[s, : len(seq.block_table)] = seq.block_table
        return (
            jnp.asarray(packed_t),
            jnp.asarray(packed_c),
            jnp.asarray(packed_s),
            jnp.asarray(tables),
            S_pad,
            (ranges, q_start),
        )

    def _prepare_verify(self, seqs: list[Sequence], drafts: list[list[int]]):
        """Pack speculative-verification rows (engine/spec.py): per seq,
        row 0 re-feeds the last committed token (rewriting its KV slot
        with identical values) and rows 1..dl feed the draft tokens at
        the positions they would occupy. Prefill-shaped packing
        (Q_TILE-aligned offsets) so the ordinary prefill attention path
        verifies the whole batch in one pass. The oracle's flat context
        packing is built only on the XLA backend — it is O(total
        context) host work per step, which the Pallas path never reads."""
        from minivllm_tpu.ops.pallas.prefill_attention import Q_TILE

        bs = self.block_size
        S = len(seqs)
        kmax = max(len(d) for d in drafts) + 1
        q_lens = [len(d) + 1 for d in drafts]
        q_start, ofs = [], 0
        for ql in q_lens:
            q_start.append(ofs)
            ofs += -(-ql // Q_TILE) * Q_TILE
        T = _pick_bucket(max(ofs, 1), self.config.prefill_token_buckets)
        mult = Q_TILE * (self.mesh.shape.get("sp", 1) if self.mesh else 1)
        if T % mult:
            T = -(-T // mult) * mult
        S_pad = _next_pow2(S, 8)
        W = self._max_width

        packed_t = np.zeros((5, T), np.int32)
        packed_t[2, :] = -1
        packed_t[3, :] = self.trash_slot
        packed_t[4, :] = -1
        rows = np.zeros((S_pad, kmax), np.int32)
        last_idx = []
        need_oracle = self.attn_backend.name == "xla"
        ctx_slots, k_seg, k_pos = [], [], []
        for s, seq in enumerate(seqs):
            table = seq.block_table
            L = len(seq)
            toks = [seq.token_ids[-1], *drafts[s]]
            o = q_start[s]
            for j, tok in enumerate(toks):
                i = L - 1 + j
                packed_t[0, o + j] = tok
                packed_t[1, o + j] = i
                packed_t[2, o + j] = s
                # Every row stores its K/V — including row 0: at decode
                # step start the device KV is valid only through
                # len - 2 (the previous step stored the token it
                # CONSUMED, position L-2), so position L-1 is this
                # pass's to write, exactly as a plain decode step
                # would. (A trash-slot redirect for row 0 was tried to
                # shield committed KV from bf16 recomputation noise —
                # it starved position L-1 entirely and diverged
                # streams; caught by test_engine_stress.)
                packed_t[3, o + j] = table[i // bs] * bs + i % bs
            rows[s, :] = [o + min(j, q_lens[s] - 1) for j in range(kmax)]
            last_idx.append(o + q_lens[s] - 1)
            if need_oracle:
                end = L + len(drafts[s])
                for i in range(end):
                    ctx_slots.append(table[i // bs] * bs + i % bs)
                    k_seg.append(s)
                    k_pos.append(i)

        C = _next_pow2(len(ctx_slots), 64)
        packed_c = np.zeros((3, C), np.int32)
        m = len(ctx_slots)
        packed_c[0, :m] = ctx_slots
        packed_c[0, m:] = self.trash_slot
        packed_c[1, :m] = k_seg
        packed_c[1, m:] = -2
        packed_c[2, :m] = k_pos
        packed_s = np.zeros((4, S_pad), np.int32)
        packed_s[0, :S] = last_idx
        packed_s[0, S:] = T - 1
        packed_s[1, :S] = [len(seq) + len(d) for seq, d in zip(seqs, drafts)]
        packed_s[2, :S] = q_start
        packed_s[3, :S] = q_lens
        tables = np.full((S_pad, W), self.trash_block, np.int32)
        for s, seq in enumerate(seqs):
            tables[s, : len(seq.block_table)] = seq.block_table
        return (
            jnp.asarray(packed_t),
            jnp.asarray(packed_c),
            jnp.asarray(packed_s),
            jnp.asarray(tables),
            jnp.asarray(rows),
        )

    def run_verify(
        self, seqs: list[Sequence], drafts: list[list[int]]
    ) -> list[list[int]]:
        """One speculative-verification pass (greedy sequences only).

        Returns the tokens to APPEND per sequence: the longest accepted
        draft prefix plus the model's own token at the first mismatch
        (>= 1 token each — a no-draft sequence degenerates to a normal
        decode row). KV invariants: accepted rows wrote correct KV
        in-pass; the bonus token's slot is rewritten by the next step
        that consumes it (the same len-2 invariant plain decode has,
        and that block-hash registration defers for)."""
        packed_t, packed_c, packed_s, tables, rows = self._prepare_verify(
            seqs, drafts
        )
        self._spec = None  # any pipelined single-step is stale now
        self.last_logprobs = None
        fn = self._get_step_fn("verify", False)
        toks, self.k_cache, self.v_cache = fn(
            self.params, self.k_cache, self.v_cache,
            packed_t, packed_c, packed_s, tables, rows,
        )
        out = np.asarray(toks)
        accepted: list[list[int]] = []
        for i, draft in enumerate(drafts):
            o = out[i]
            a = 0
            while a < len(draft) and int(o[a]) == draft[a]:
                a += 1
            accepted.append([int(t) for t in o[: a + 1]])
        self.inference_count += 1
        self.ngram_steps += 1
        self.ngram_drafted += sum(len(d) for d in drafts)
        self.ngram_accepted += sum(len(a) - 1 for a in accepted)
        # total_decode_tokens: the engine adds what it actually appends
        # (EOS / max_tokens may clip the accepted run).
        return accepted

    # Shared-prefix grouping pays off only when the saved KV streaming
    # ((members - 1) x shared blocks, per layer) outweighs the extra
    # phase-1 kernel launch; ~8K saved tokens (~16 MB of bf16 KV at
    # 7B-class kvh*hd) is the measured break-even ballpark on v5e. The
    # gate is denominated in TOKENS so it is block-size independent
    # (the saved-block count is scaled by block_size at check time).
    SHARED_PREFIX_MIN_SAVED_TOKENS = 128 * 64
    # Phase-1 stacks member queries into the head axis: its accumulator
    # and (m, l) scratch scale with Gmax * h rows, so cap the group size
    # (VMEM is ~16 MB; 32 members x 32 heads x 128 lanes x 3 arrays x
    # 4 B ~ 6 MB). Oversized groups split into chunks that still divide
    # the shared streaming by the cap.
    SHARED_PREFIX_MAX_GROUP = 32
    # Windows of append headroom in the fused-spec device history buffer
    # (run_spec_multi): larger = more consecutive dispatches reuse the
    # device-resident history before a rebuild H2D; cost is
    # S_pad * num_steps * (k+1) * REUSE extra int32 columns.
    SPEC_HIST_REUSE = 8

    def _detect_groups(self, seqs: list[Sequence], S_pad: int):
        """Shared-prefix decode groups (PAT-style two-phase attention).

        Sequences whose block tables share a leading run of block ids
        (prefix-cache hits on a common system prompt) form a group; the
        shared run is capped so every member keeps a non-empty tail
        (the online-softmax continuation needs at least one phase-2
        item). Returns None, or a dict of padded jnp arrays for
        DecodeBatch(seq_start/group_member/group_tables/group_ctx).

        Composes with dp/sp/ep/tp meshes: batch rows shard over "dp" in
        contiguous chunks of S_pad/dp, so groups form only WITHIN a
        chunk, member indices are chunk-LOCAL, and the group rows are
        laid out per chunk (padded to a common per-chunk count) so the
        group arrays shard over "dp" alongside their rows — the
        two-phase composition then runs on purely shard-local data
        inside the SPMD wrapper (ops/pallas/spmd.py). Gated off for
        sliding-window models (the window bound and the shared/tail
        split do not compose)."""
        if (
            not self.config.shared_prefix_decode
            or self.attn_backend.name != "pallas"
            or getattr(self.config.hf_config, "sliding_window", None)
            # The pipeline microbatches the row axis; group arrays do not
            # split along microbatches, so pp meshes never group.
            or self._pp > 1
        ):
            return None
        dp = self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
        chunk_rows = S_pad // dp
        bs = self.block_size
        byfirst: dict[tuple[int, int], list[int]] = {}
        for i, s in enumerate(seqs):
            if s.block_table:
                byfirst.setdefault(
                    (i // chunk_rows, s.block_table[0]), []
                ).append(i)
        found: list[list] = [[] for _ in range(dp)]
        saved = 0
        for (ci, _), idxs in byfirst.items():
            if len(idxs) < 2:
                continue
            tables = [seqs[i].block_table for i in idxs]
            limit = min(
                min(len(t) for t in tables),
                min((len(seqs[i]) - 1) // bs for i in idxs),
            )
            t0 = tables[0]
            depth = 0
            while depth < limit and all(
                t[depth] == t0[depth] for t in tables[1:]
            ):
                depth += 1
            if depth < 1:
                continue
            cap = self.SHARED_PREFIX_MAX_GROUP
            for lo in range(0, len(idxs), cap):
                members = idxs[lo : lo + cap]
                if len(members) < 2:
                    continue
                found[ci].append((members, t0[:depth]))
                saved += (len(members) - 1) * depth
        if (
            not any(found)
            or saved * self.block_size < self.SHARED_PREFIX_MIN_SAVED_TOKENS
        ):
            return None
        all_groups = [f for fc in found for f in fc]
        G_local = _next_pow2(max(len(fc) for fc in found), 1)
        Gmax = _next_pow2(max(len(f[0]) for f in all_groups), 2)
        Wg = _next_pow2(max(len(f[1]) for f in all_groups), 1)
        if os.environ.get("MINIVLLM_GROUP_CLASSES") != "exact":
            # Collapse the three group-shape dims to <= 2 classes each
            # (same move as _width_class) so the grouped-decode program
            # space is finite and warmup() covers it — otherwise a new
            # runtime group shape costs a 10-60 s relay compile
            # mid-serving. Padding is cheap where it matters: padded
            # GROUPS have ctx 0 (the kernel's work list emits no items)
            # and padded Wg blocks are predicated off; padded MEMBERS
            # do add phase-1 matmul rows, but phase 1 is DMA-savings-
            # bound, not MXU-bound, at these (tiny-M) shapes.
            # MINIVLLM_GROUP_CLASSES=exact restores exact pow2s for A/B.
            cap = self.SHARED_PREFIX_MAX_GROUP
            g_cap = max(4, _next_pow2(chunk_rows // 2, 1))
            G_local = 4 if G_local <= 4 else g_cap
            G_local = min(G_local, g_cap)
            Gmax = 4 if Gmax <= 4 else cap
            wg_cap = _next_pow2(
                (self.config.max_model_len - 2) // bs + 1, 1
            )
            Wg = 8 if Wg <= 8 else wg_cap
            Wg = min(Wg, wg_cap)
        G = G_local * dp
        member = np.full((G, Gmax), -1, np.int32)
        gtab = np.full((G, Wg), self.trash_block, np.int32)
        gctx = np.zeros((G,), np.int32)
        seq_start = np.zeros((S_pad,), np.int32)
        for ci, fc in enumerate(found):
            for gi, (idxs, blocks) in enumerate(fc):
                row = ci * G_local + gi
                member[row, : len(idxs)] = [
                    i - ci * chunk_rows for i in idxs
                ]
                gtab[row, : len(blocks)] = blocks
                gctx[row] = len(blocks) * bs
                for i in idxs:
                    seq_start[i] = len(blocks) * bs
        return {
            "seq_start": jnp.asarray(seq_start),
            "group_member": jnp.asarray(member),
            "group_tables": jnp.asarray(gtab),
            "group_ctx": jnp.asarray(gctx),
        }

    def _prepare_decode(self, seqs: list[Sequence]):
        bs = self.block_size
        S = len(seqs)
        S_pad = _pick_bucket(S, self.config.decode_seq_buckets)
        if self.mesh is not None:
            # Batch rows shard over the "dp" axis and split into pp
            # microbatches: keep the bucket divisible by both.
            mult = self.mesh.shape.get("dp", 1) * self._pp
            S_pad = -(-S_pad // mult) * mult
        width = max(len(seq.block_table) for seq in seqs)
        W = self._width_class(width)
        packed = np.zeros((4, S_pad), np.int32)
        packed[2, S:] = self.trash_slot
        tables = np.full((S_pad, W), self.trash_block, np.int32)
        for s, seq in enumerate(seqs):
            pos = len(seq) - 1
            packed[0, s] = seq.token_ids[-1]
            packed[1, s] = pos
            packed[2, s] = seq.block_table[pos // bs] * bs + pos % bs
            packed[3, s] = len(seq)
            tables[s, : len(seq.block_table)] = seq.block_table
        groups = self._detect_groups(seqs, S_pad)
        if groups is not None:
            self.shared_prefix_steps += 1
        return jnp.asarray(packed), jnp.asarray(tables), S_pad, groups

    # -- execution -----------------------------------------------------------

    def _record_prompt_logprobs(self, seqs, plp, layout) -> None:
        """Append this chunk's prompt-logprob entries to requesting
        sequences. The packed row at position p holds the logprob of prompt
        token p+1; the first prompt token (no prefix) gets a None entry.
        Chunked prefill calls this once per chunk, in order."""
        ranges, q_start = layout
        chosen, top_ids, top_lps = (np.asarray(x) for x in plp)
        for s, seq in enumerate(seqs):
            k = seq.sampling_params.prompt_logprobs
            if k is None:
                continue
            start, end = ranges[s]
            if start == 0:
                seq.prompt_logprobs.append(
                    {"token_id": seq.token_ids[0], "logprob": None, "top": None}
                )
            # Prompt positions covered by this chunk's rows; position
            # num_prompt_tokens-1's logits predict the first completion
            # token (handled by completion logprobs, not recorded here).
            hi = min(end, seq.num_prompt_tokens - 1)
            for p in range(start + 1, hi + 1):
                row = q_start[s] + (p - 1 - start)
                seq.prompt_logprobs.append(
                    {
                        "token_id": seq.token_ids[p],
                        "logprob": float(chosen[row]),
                        "top": {
                            int(t): float(l)
                            for t, l in zip(top_ids[row][:k], top_lps[row][:k])
                        },
                    }
                )

    def run(self, seqs: list[Sequence], is_prefill: bool) -> list[int]:
        """Execute one batch; returns one sampled token per sequence."""
        if not seqs:
            return []
        S = len(seqs)
        # Fixed device-side top-k (see LOGPROB_TOPK): one program per
        # on/off, per-sequence k trimming happens host-side.
        lp_top = min(self.LOGPROB_TOPK, self.model.vocab_size)
        plp_k = (
            lp_top
            if any(s.sampling_params.prompt_logprobs is not None for s in seqs)
            else None
        )
        if is_prefill and plp_k is None and all(
            (seq.chunk_range or (seq.num_cached_tokens, len(seq)))
            == (len(seq) - 1, len(seq))
            for seq in seqs
        ):
            # Fully prefix-cached prompts leave exactly one token to
            # compute (block_manager caps hits at len - 1): that is a
            # decode step. The decode program computes S rows instead of
            # the Q_TILE-aligned prefill packing's S * 64 padded rows.
            is_prefill = False
        params_list = [seq.sampling_params for seq in seqs]
        with_penalties = any(sp.has_penalties for sp in params_list)
        with_bias = any(sp.has_logit_bias for sp in params_list)
        typical = any(sp.typical_p < 1.0 for sp in params_list)
        seeded = any(sp.seed is not None for sp in params_list)
        with_mirostat = any(sp.mirostat > 0 for sp in params_list)
        with_filters = with_penalties or typical or any(
            sp.top_k > 0
            or sp.top_p < 1.0
            or sp.min_p > 0.0
            or sp.avoid_top_k > 0
            for sp in params_list
        )
        # Logprobs: computed at the fixed top-k; per-sequence trimming
        # happens at postprocess time.
        lp_k = (
            lp_top
            if any(sp.logprobs is not None for sp in params_list)
            else None
        )
        lp = None
        mu = None
        if is_prefill:
            self._spec = None
            packed_t, packed_c, packed_s, tables, S_pad, layout = (
                self._prepare_prefill(seqs)
            )
            fn = self._get_step_fn(
                "prefill", with_filters, typical=typical, lp_k=lp_k,
                plp_k=plp_k, seeded=seeded, m_on=with_mirostat,
                pool=candidate_pool(params_list),
            )
            state = self._get_state(params_list, S_pad)
            hist = self._build_hist(seqs, S_pad) if with_penalties else None
            bias = self._build_bias(seqs, S_pad) if with_bias else None
            key = jax.random.fold_in(self._base_key, self._step_counter)
            self._step_counter += 1
            if with_mirostat:
                m = make_mirostat_rows(
                    params_list, [s.mirostat_mu for s in seqs], S_pad
                )
                toks, lp, plp, mu, self.k_cache, self.v_cache = fn(
                    self.params, self.k_cache, self.v_cache,
                    packed_t, packed_c, packed_s, tables, state, key,
                    hist=hist, m=m, bias=bias,
                )
            else:
                toks, lp, plp, self.k_cache, self.v_cache = fn(
                    self.params, self.k_cache, self.v_cache,
                    packed_t, packed_c, packed_s, tables, state, key,
                    hist=hist, bias=bias,
                )
            if plp is not None:
                self._record_prompt_logprobs(seqs, plp, layout)
        else:
            packed, tables, S_pad, groups = self._prepare_decode(seqs)
            W = int(tables.shape[1])
            sig = self._decode_signature(seqs, S_pad, W)
            spec = self._spec
            self._spec = None
            if (
                spec is not None
                and spec["sig"] == sig
                and lp_k is None
                and not with_mirostat
            ):
                toks = spec["toks"]
                self.spec_hits += 1
            else:
                fn = self._get_step_fn(
                    "decode", with_filters, typical=typical, lp_k=lp_k,
                    seeded=seeded, m_on=with_mirostat,
                    pool=candidate_pool(params_list),
                )
                state = self._get_state(params_list, S_pad)
                hist = self._build_hist(seqs, S_pad) if with_penalties else None
                bias = self._build_bias(seqs, S_pad) if with_bias else None
                key = jax.random.fold_in(self._base_key, self._step_counter)
                self._step_counter += 1
                if with_mirostat:
                    m = make_mirostat_rows(
                        params_list, [s.mirostat_mu for s in seqs], S_pad
                    )
                    toks, lp, mu, self.k_cache, self.v_cache = fn(
                        self.params, self.k_cache, self.v_cache,
                        packed, tables, state, key, hist=hist, groups=groups,
                        m=m, bias=bias,
                    )
                else:
                    toks, lp, self.k_cache, self.v_cache = fn(
                        self.params, self.k_cache, self.v_cache,
                        packed, tables, state, key, hist=hist, groups=groups,
                        bias=bias,
                    )
            # Dispatch the likely next step before fetching this one's
            # tokens, so the D2H overlaps its compute. Penalty histories
            # grow with the (still unfetched) sampled token, so speculation
            # is disabled when penalties are active; logprob requests skip
            # it too (the speculative step has no logprob outputs).
            if (
                not with_penalties and not with_bias and lp_k is None
                and not with_mirostat
            ):
                self._maybe_speculate(
                    seqs, toks, with_filters, typical, S_pad, W, groups
                )
        if mu is not None:
            mu_host = np.asarray(mu)
            for i, s in enumerate(seqs):
                if s.sampling_params.mirostat > 0:
                    s.mirostat_mu = float(mu_host[i])
        if lp is not None:
            chosen, top_ids, top_lps = (np.asarray(x) for x in lp)
            self.last_logprobs = [
                (
                    float(chosen[i]),
                    top_ids[i].tolist(),
                    top_lps[i].tolist(),
                )
                for i in range(S)
            ]
        else:
            self.last_logprobs = None
        out = np.asarray(toks[:S]).tolist()
        self.inference_count += 1
        if is_prefill:
            self.total_prefill_tokens += sum(
                (s.chunk_range[1] - s.chunk_range[0])
                if s.chunk_range
                else len(s) - s.num_cached_tokens
                for s in seqs
            )
        else:
            self.total_decode_tokens += S
        return out

    def run_multi(self, seqs: list[Sequence], num_steps: int) -> list[list[int]]:
        """Fused multi-step decode: returns `num_steps` token lists (one
        token per sequence per step). The scheduler must have reserved the
        block window (may_append with lookahead=num_steps)."""
        S = len(seqs)
        params_list = [seq.sampling_params for seq in seqs]
        typical = any(sp.typical_p < 1.0 for sp in params_list)
        seeded = any(sp.seed is not None for sp in params_list)
        with_filters = typical or any(
            sp.top_k > 0 or sp.top_p < 1.0 or sp.min_p > 0.0
            or sp.avoid_top_k > 0
            for sp in params_list
        )
        self._spec = None
        self.last_logprobs = None
        packed, tables, S_pad, groups = self._prepare_decode(seqs)
        fn = self._get_step_fn(
            "decode", with_filters, num_steps, typical, seeded=seeded,
            pool=candidate_pool(params_list),
        )
        state = self._get_state(params_list, S_pad)
        key = jax.random.fold_in(self._base_key, self._step_counter)
        self._step_counter += 1
        all_toks, self.k_cache, self.v_cache = fn(
            self.params, self.k_cache, self.v_cache, packed, tables, state,
            key, groups=groups,
        )
        out = np.asarray(all_toks[:, :S])
        self.inference_count += 1
        # The engine adds the tokens it actually appends to
        # total_decode_tokens — the adaptive window may overshoot a
        # sequence's max_tokens, and those surplus iterations are discarded.
        return [row.tolist() for row in out]

    def warmup(self) -> None:
        """Trigger compilation of the common step variants with a dummy
        batch (reference analog: inference_executor.py:373-410)."""
        seq = Sequence([1, 2, 3], block_size=self.block_size)
        seq.block_table = [self.num_blocks - 1]
        self.run([seq], is_prefill=True)
        seq.append_token(4)
        self.run([seq], is_prefill=False)
        # Reset cache contents and counters touched by warmup.
        self.k_cache = jax.tree.map(jnp.zeros_like, self.k_cache)
        self.v_cache = jax.tree.map(jnp.zeros_like, self.v_cache)
        self.total_prefill_tokens = 0
        self.total_decode_tokens = 0
        self.inference_count = 0

    def get_model_info(self) -> dict:
        m = self.model
        return {
            "num_layers": m.num_layers,
            "hidden_size": m.hidden_size,
            "num_heads": m.num_heads,
            "num_kv_heads": m.num_kv_heads,
            "head_dim": m.head_dim,
            "vocab_size": m.vocab_size,
            "dtype": str(self.dtype.dtype if hasattr(self.dtype, "dtype") else self.dtype),
            "kv_blocks": self.num_blocks,
            "block_size": self.block_size,
            "attention_backend": self.attn_backend.name,
        }

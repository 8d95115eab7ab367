"""Engine configuration.

TPU-native counterpart of the reference engine config
(/root/reference/minivllm/config.py:16-287). Field names and validation
ranges are kept API-compatible so users of the reference can switch without
changing call sites; TPU-specific knobs (compile buckets, attention kernel
selection, cache dtype) are additive.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, ClassVar

__all__ = ["Config"]

_VALID_DTYPES = ("auto", "bfloat16", "float32", "float16")
_VALID_ATTN = ("auto", "pallas", "xla", "pallas_interpret")


def _default_decode_buckets(max_num_seqs: int) -> list[int]:
    """Decode batch-size buckets: each bucket is one compiled program.

    Mirrors the role of the reference's device-graph batch-size list
    (/root/reference/minivllm/engine/inference_executor.py:838-841) but for
    XLA bucketed compilation: at runtime the smallest bucket >= batch is
    padded to and executed.
    """
    buckets = [b for b in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512) if b < max_num_seqs]
    buckets.append(max_num_seqs)
    return buckets


def _default_token_buckets(max_num_batched_tokens: int) -> list[int]:
    """Prefill packed-token-count buckets (powers of two up to the budget)."""
    buckets = []
    b = 64
    while b < max_num_batched_tokens:
        buckets.append(b)
        b *= 2
    buckets.append(max_num_batched_tokens)
    return buckets


@dataclass
class Config:
    """Configuration for the TPU serving engine.

    Attributes mirror the reference Config
    (/root/reference/minivllm/config.py:52-77); `device_memory_utilization`
    budgets HBM instead of GPU memory, `tensor_parallel_size` selects the
    size of the SPMD "tp" mesh axis (no worker processes are spawned — GSPMD
    inserts the collectives), and `enforce_eager` disables ahead-of-time
    bucket compilation (buckets then compile lazily on first use).
    """

    MIN_DEVICE_MEMORY_UTIL: ClassVar[float] = 0.1
    MAX_DEVICE_MEMORY_UTIL: ClassVar[float] = 1.0
    MIN_TENSOR_PARALLEL_SIZE: ClassVar[int] = 1
    MAX_TENSOR_PARALLEL_SIZE: ClassVar[int] = 64
    BLOCK_SIZE_DIVISOR: ClassVar[int] = 16
    DEFAULT_MAX_MODEL_LEN: ClassVar[int] = 4096

    model: str
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 512
    max_model_len: int = 4096
    device_memory_utilization: float = 0.9
    tensor_parallel_size: int = 1
    enforce_eager: bool = False
    hf_config: Any | None = None
    eos: int = -1
    # Workload-dependent on v5e (adjacent-run A/Bs): 64 wins
    # short-context serving (256 seqs of 64-96 token contexts: 1858 vs
    # 1770 tok/s against 128), while 128 halves the gather-DMA issue
    # count and wins long contexts (prefill flash 5.25 -> 3.19 ms at
    # 2x2048, int8-KV decode 1.68 -> 1.27 ms at 64x4096). Default stays
    # 64 (finer prefix-cache granularity, better short-context decode);
    # pass 128 for long-prompt / long-generation deployments.
    kvcache_block_size: int = 64
    num_kvcache_blocks: int = -1
    trust_remote_code: bool = False
    dtype: str = "auto"
    seed: int | None = None
    # Accepted for drop-in compatibility with reference callers
    # (config.py:67, the NPU BufferedPageAttention gather-buffer
    # workaround). No-op here: the Pallas kernels stream paged KV
    # directly from HBM without host-managed gather buffers.
    use_buffered_page_attention: bool = False

    # --- TPU-specific (additive) ---
    # Data type of the paged KV cache ("auto" follows `dtype`).
    kvcache_dtype: str = "auto"
    # Attention kernel: "pallas" (Mosaic kernels), "xla" (jnp gather oracle),
    # "auto" picks pallas on TPU and xla elsewhere; "pallas_interpret"
    # runs the Pallas kernels as interpreted jax ops (CPU testing).
    attention_impl: str = "auto"
    # Compile buckets; None -> derived from max_num_seqs / batched tokens.
    decode_seq_buckets: list[int] | None = None
    prefill_token_buckets: list[int] | None = None
    # Enable hash-based prefix caching (reference: block_manager.py:128-152).
    enable_prefix_caching: bool = True
    # Shared-prefix (two-phase) decode attention: sequences whose block
    # tables share a leading run (prefix-cache hits on a common system
    # prompt) stream those KV blocks once per group instead of once per
    # sequence. Pallas backend, mesh-less, non-sliding-window only.
    shared_prefix_decode: bool = True
    # Weight quantization: None | "int8" | "fp8" (weight-only;
    # fp8 = float8_e4m3 with per-channel scales) | "w8a8" (int8 weights
    # AND per-row int8 activations on the layer matmuls — the int8 MXU
    # runs at 2x the bf16 issue rate, halving the compute-bound
    # large-batch decode/prefill matmul cost; the LM head stays
    # weight-only for logit fidelity).
    quantization: str | None = None
    # SPMD mesh axes beyond tensor parallelism (reference has TP only,
    # SURVEY.md §2.2). data_parallel_size shards decode batch rows over a
    # "dp" mesh axis (weights/KV replicated, per-chip FLOPs / dp);
    # sequence_parallel_size shards packed prefill tokens over an "sp"
    # axis (long-prompt prefill splits across chips). Total devices used =
    # dp * sp * ep * tp.
    data_parallel_size: int = 1
    sequence_parallel_size: int = 1
    # Pipeline parallelism: shard the layer stack into pp stages over a
    # "pp" mesh axis and flow microbatches through them (ppermute
    # hand-offs, parallel/pipeline.py). num_hidden_layers must divide by
    # it. Total devices used = pp * dp * sp * ep * tp.
    pipeline_parallel_size: int = 1
    # Decode steps fused into one device dispatch (multi-step decode):
    # sampled tokens feed back on-device and K tokens per sequence are
    # fetched at once, dividing dispatch + device->host overhead by K.
    # Finish checks (EOS/max_tokens) lag up to K-1 steps, whose extra
    # compute is discarded. 1 = classic single-step with speculative
    # pipelining.
    decode_multi_step: int = 4
    # Multi-host (pod-slice) serving: one process per host, SAME config
    # and request feed on every host (the replicated-scheduler contract,
    # parallel/multihost.py). When True the runner initializes
    # jax.distributed and builds the ("dcn","pp","dp","sp","ep","tp")
    # pod mesh (tensor_parallel_size defaults to the per-host device
    # count so tp all-reduces stay on ICI). coordinator_address /
    # num_processes / process_id are auto-detected on Cloud TPU; set
    # them explicitly elsewhere. Beats the reference's hardcoded
    # single-node 127.0.0.1 (llm_engine.py:83-90).
    multihost: bool = False
    coordinator_address: str | None = None
    num_processes: int | None = None
    process_id: int | None = None
    # N-gram (prompt-lookup) speculative decoding: propose up to this
    # many draft tokens per decode step by matching the sequence's
    # trailing n-gram earlier in its own tokens, verify them all in ONE
    # model pass, and append the matched prefix plus the bonus token.
    # 0 disables. Greedy-only (temperature 0, no penalties/logprobs);
    # other requests silently take the normal path. Wins on text with
    # self-repetition (code, extraction, RAG quoting); costs one
    # prefill-shaped pass per engaged step elsewhere.
    speculative_num_tokens: int = 0
    # Trailing-token match length for the n-gram proposer.
    speculative_ngram: int = 2
    # Fused speculation (default): proposal + verification + acceptance
    # run INSIDE the fused multi-step scan from a device-side history
    # buffer — dispatch count identical to the plain window, each
    # iteration emitting up to speculative_num_tokens + 1 tokens, and
    # temperature > 0 supported via exact rejection sampling
    # (engine/spec.py). False selects the host-proposal + separate
    # verify-dispatch path (greedy-only; loses behind high dispatch
    # latency, docs/roadmap.md).
    speculative_fused: bool = True

    # Backward-compat alias used by reference callers
    # (/root/reference/minivllm/config.py:80-88).
    @property
    def gpu_memory_utilization(self) -> float:
        return self.device_memory_utilization

    @gpu_memory_utilization.setter
    def gpu_memory_utilization(self, value: float) -> None:
        self.device_memory_utilization = value

    def __post_init__(self) -> None:
        self._validate_model_path()
        self._validate_simple_fields()
        self._validate_ranges()
        if self.hf_config is None:
            self._load_hf_config()
        self._adjust_max_model_len()
        # Note: the reference requires max_num_batched_tokens >= max_model_len
        # (config.py:257-264); chunked prefill removes that constraint here —
        # prompts longer than the batch budget prefill in chunks.
        if self.decode_seq_buckets is None:
            self.decode_seq_buckets = _default_decode_buckets(self.max_num_seqs)
        if self.prefill_token_buckets is None:
            self.prefill_token_buckets = _default_token_buckets(
                self.max_num_batched_tokens
            )
        self.decode_seq_buckets = sorted(set(self.decode_seq_buckets))
        self.prefill_token_buckets = sorted(set(self.prefill_token_buckets))

    # -- validation ---------------------------------------------------------

    def _validate_model_path(self) -> None:
        if Path(self.model).is_dir():
            return
        # Allow model IDs resolved later by the loader (e.g. "facebook/opt-125m").
        if not self.model.startswith(("/", "./", "../", "~")):
            return
        raise ValueError(f"Model path '{self.model}' is not a valid directory.")

    def _validate_simple_fields(self) -> None:
        if self.dtype not in _VALID_DTYPES:
            raise ValueError(f"dtype must be one of {_VALID_DTYPES}, got {self.dtype!r}")
        if self.kvcache_dtype not in _VALID_DTYPES + ("int8",):
            raise ValueError(f"invalid kvcache_dtype {self.kvcache_dtype!r}")
        if self.attention_impl not in _VALID_ATTN:
            raise ValueError(f"attention_impl must be one of {_VALID_ATTN}")
        if not isinstance(self.eos, int):
            raise ValueError(f"eos must be an int, got {type(self.eos)}")
        if self.num_kvcache_blocks != -1 and self.num_kvcache_blocks < 1:
            raise ValueError(
                f"num_kvcache_blocks must be -1 (auto) or >= 1, got "
                f"{self.num_kvcache_blocks}"
            )
        if self.quantization not in (None, "int8", "fp8", "w8a8"):
            raise ValueError(f"unsupported quantization {self.quantization!r}")
        if not 1 <= self.decode_multi_step <= 64:
            raise ValueError(
                f"decode_multi_step must be in [1, 64], got {self.decode_multi_step}"
            )
        if not 0 <= self.speculative_num_tokens <= 16:
            raise ValueError(
                "speculative_num_tokens must be in [0, 16], got "
                f"{self.speculative_num_tokens}"
            )
        if self.speculative_ngram < 1:
            raise ValueError(
                f"speculative_ngram must be >= 1, got {self.speculative_ngram}"
            )
        for name in (
            "data_parallel_size",
            "sequence_parallel_size",
            "pipeline_parallel_size",
        ):
            v = getattr(self, name)
            if not (1 <= v <= 64) or (v & (v - 1)):
                raise ValueError(f"{name} must be a power of two in [1, 64], got {v}")

    def _validate_ranges(self) -> None:
        if not (
            self.MIN_DEVICE_MEMORY_UTIL
            <= self.device_memory_utilization
            <= self.MAX_DEVICE_MEMORY_UTIL
        ):
            raise ValueError(
                "device_memory_utilization must be in "
                f"[{self.MIN_DEVICE_MEMORY_UTIL}, {self.MAX_DEVICE_MEMORY_UTIL}], "
                f"got {self.device_memory_utilization}"
            )
        if self.kvcache_block_size % self.BLOCK_SIZE_DIVISOR != 0:
            raise ValueError(
                f"kvcache_block_size must be divisible by {self.BLOCK_SIZE_DIVISOR}, "
                f"got {self.kvcache_block_size}"
            )
        if not (
            self.MIN_TENSOR_PARALLEL_SIZE
            <= self.tensor_parallel_size
            <= self.MAX_TENSOR_PARALLEL_SIZE
        ):
            raise ValueError(
                f"tensor_parallel_size must be in [{self.MIN_TENSOR_PARALLEL_SIZE}, "
                f"{self.MAX_TENSOR_PARALLEL_SIZE}], got {self.tensor_parallel_size}"
            )
        if not 1 <= self.max_num_seqs <= 10000:
            raise ValueError(f"max_num_seqs must be in [1, 10000], got {self.max_num_seqs}")
        if not 1 <= self.max_model_len <= 1_000_000:
            raise ValueError(
                f"max_model_len must be in [1, 1000000], got {self.max_model_len}"
            )
        if not 1 <= self.max_num_batched_tokens <= 1_000_000:
            raise ValueError(
                "max_num_batched_tokens must be in [1, 1000000], got "
                f"{self.max_num_batched_tokens}"
            )

    def _load_hf_config(self) -> None:
        from transformers import AutoConfig

        self.hf_config = AutoConfig.from_pretrained(
            self.model, trust_remote_code=self.trust_remote_code
        )

    def _adjust_max_model_len(self) -> None:
        """Clamp max_model_len to the model's positional capacity
        (reference: config.py:234-255)."""
        hf = self.hf_config
        limit = None
        for attr in ("max_position_embeddings", "n_positions", "seq_length"):
            v = getattr(hf, attr, None)
            if isinstance(v, int) and v > 0:
                limit = v
                break
        if limit is not None and self.max_model_len > limit:
            self.max_model_len = limit

    # -- derived ------------------------------------------------------------

    @property
    def model_dtype(self) -> str:
        if self.dtype != "auto":
            return self.dtype
        return "bfloat16"

    @property
    def kv_dtype(self) -> str:
        if self.kvcache_dtype != "auto":
            return self.kvcache_dtype
        return self.model_dtype

    @property
    def attention_interpret(self) -> bool:
        """Run the Pallas kernels in interpret mode (CPU test path for
        the real kernel code, incl. the shard_map SPMD wrappers)."""
        return self.attention_impl == "pallas_interpret"

    @property
    def use_pallas_attention(self) -> bool:
        if self.attention_impl in ("pallas", "pallas_interpret"):
            return True
        if self.attention_impl == "xla":
            return False
        if os.environ.get("MINIVLLM_TPU_FORCE_XLA_ATTN"):
            return False
        import jax

        return jax.default_backend() in ("tpu", "axon")

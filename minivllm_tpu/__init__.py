"""minivllm_tpu — a TPU-native LLM serving engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
jianzhnie/mini-vllm (continuous batching, paged KV cache with prefix
caching, per-sequence sampling, HF safetensors loading for
Qwen2/Qwen3/OPT/GPT2, tensor parallelism), re-architected for TPU:
bucketed jit compilation instead of device-graph capture, Pallas paged
attention instead of Triton/vendor kernels, and GSPMD sharding over a
device mesh instead of a multiprocess torch.distributed runtime.

Public API mirrors the reference (/root/reference/minivllm/__init__.py:50-63).
"""

from minivllm_tpu.config import Config
from minivllm_tpu.engine.sequence import Sequence, SequenceStatus
from minivllm_tpu.sampling_params import SamplingParams

__version__ = "0.1.0"

__all__ = [
    "Config",
    "SamplingParams",
    "LLM",
    "Sequence",
    "SequenceStatus",
]


def __getattr__(name: str):
    # Lazy import: LLM pulls in jax; keep host-only imports light.
    if name == "LLM":
        from minivllm_tpu.llm import LLM

        return LLM
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

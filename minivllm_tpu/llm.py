"""User-facing LLM interface (reference: /root/reference/minivllm/llm.py:51-106).

Example:
    >>> from minivllm_tpu import LLM, SamplingParams, Config
    >>> llm = LLM(Config(model="Qwen/Qwen3-0.6B"))
    >>> outs = llm.generate(["Hello"], SamplingParams(temperature=0.7))
    >>> outs[0]["text"]
"""

from __future__ import annotations

from minivllm_tpu.config import Config
from minivllm_tpu.engine.llm_engine import LLMEngine

__all__ = ["LLM"]


class LLM(LLMEngine):
    """Thin wrapper over LLMEngine; all serving functionality is inherited."""

    def __init__(self, config: Config, **kwargs) -> None:
        super().__init__(config, **kwargs)

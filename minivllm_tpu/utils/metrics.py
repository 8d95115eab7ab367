"""Serving metrics and profiling.

Beyond the reference's tqdm-postfix throughput counters
(/root/reference/minivllm/engine/llm_engine.py:326-342,
inference_executor.py:143-147): a per-step timing ring buffer with
percentile summaries (p50/p95 decode ms/token, prefill tok/s, TTFT), and
a `jax.profiler` trace helper for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
from collections import deque

import numpy as np

__all__ = ["StepTimer", "profile_trace"]


class StepTimer:
    """Ring buffer of (phase, num_tokens, seconds) per engine step."""

    def __init__(self, capacity: int = 4096) -> None:
        self._buf: deque[tuple[str, int, float]] = deque(maxlen=capacity)
        self.ttfts: deque[float] = deque(maxlen=capacity)

    def record(self, phase: str, num_tokens: int, seconds: float) -> None:
        self._buf.append((phase, num_tokens, seconds))

    def record_ttft(self, seconds: float) -> None:
        self.ttfts.append(seconds)

    def reset(self) -> None:
        """Drop recorded samples (e.g. to exclude warmup from a report)."""
        self._buf.clear()
        self.ttfts.clear()

    def summary(self) -> dict:
        prefill = [(n, s) for p, n, s in self._buf if p == "prefill"]
        decode = [(n, s) for p, n, s in self._buf if p == "decode"]
        out: dict = {"num_prefill_steps": len(prefill), "num_decode_steps": len(decode)}
        if prefill:
            toks = sum(n for n, _ in prefill)
            secs = sum(s for _, s in prefill)
            out["prefill_tokens_per_s"] = toks / secs if secs else 0.0
        if decode:
            ms_per_tok = [s / max(n, 1) * 1000 for n, s in decode]
            step_ms = [s * 1000 for _, s in decode]
            toks = sum(n for n, _ in decode)
            secs = sum(s for _, s in decode)
            out["decode_tokens_per_s"] = toks / secs if secs else 0.0
            out["decode_step_ms_p50"] = float(np.percentile(step_ms, 50))
            out["decode_step_ms_p95"] = float(np.percentile(step_ms, 95))
            out["decode_ms_per_token_p50"] = float(np.percentile(ms_per_tok, 50))
        if self.ttfts:
            out["ttft_s_p50"] = float(np.percentile(list(self.ttfts), 50))
            out["ttft_s_p95"] = float(np.percentile(list(self.ttfts), 95))
        return out


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

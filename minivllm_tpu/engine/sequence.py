"""Per-request sequence state.

Counterpart of the reference Sequence
(/root/reference/minivllm/engine/sequence.py:17-365). Under SPMD there is no
process boundary, so the reference's pickle-shrinking machinery
(sequence.py:239-365) has no equivalent here — sequences never leave the
host engine; only flat int32 batch arrays reach the device.
"""

from __future__ import annotations

import itertools
from enum import Enum, auto

from minivllm_tpu.sampling_params import SamplingParams

__all__ = ["Sequence", "SequenceStatus"]


class SequenceStatus(Enum):
    WAITING = auto()
    RUNNING = auto()
    FINISHED = auto()


class Sequence:
    """One generation request: prompt + generated tokens + paged-block state."""

    _counter = itertools.count()

    def __init__(
        self,
        token_ids: list[int],
        sampling_params: SamplingParams | None = None,
        block_size: int = 64,
    ) -> None:
        if not token_ids:
            raise ValueError("token_ids must be non-empty")
        if block_size <= 0:
            raise ValueError(f"block_size must be positive, got {block_size}")
        self.seq_id: int = next(Sequence._counter)
        self.status = SequenceStatus.WAITING
        self.token_ids: list[int] = list(token_ids)
        self.num_prompt_tokens: int = len(token_ids)
        self.sampling_params = sampling_params or SamplingParams()
        self.block_size = block_size
        # Tokens whose KV is already present via prefix-cache hits; prefill
        # starts computing at this offset.
        self.num_cached_tokens: int = 0
        # Prompt tokens whose KV exists (cached or computed) — advances in
        # chunks during chunked prefill; the scheduler sets chunk_range to
        # the [start, end) token window of the current prefill step.
        self.num_computed_tokens: int = 0
        self.chunk_range: tuple[int, int] | None = None
        # Physical block ids, in order (block i covers tokens
        # [i*block_size, (i+1)*block_size)).
        self.block_table: list[int] = []
        # Steps this sequence was preempted (for observability).
        self.num_preemptions: int = 0
        # Per-completion-token logprob entries (only when
        # sampling_params.logprobs is set): {"token_id", "logprob", "top"}.
        self.logprobs: list[dict] = []
        # Per-prompt-token entries (sampling_params.prompt_logprobs), same
        # shape; the first prompt token's entry has logprob/top None.
        self.prompt_logprobs: list[dict] = []
        # Set by the engine at add_request time; used for TTFT metrics.
        self.arrival_time: float | None = None
        # Mirostat running surprise bound (sampling_params.mirostat > 0);
        # None until the first sampled token initializes it to 2 * tau.
        self.mirostat_mu: float | None = None
        # Why generation ended: "stop" (EOS / stop token / stop string)
        # or "length" (max_tokens / model length); None while live.
        self.finish_reason: str | None = None
        # The stop trigger when finish_reason == "stop": the matched
        # stop STRING, the stop token id, or None for plain EOS.
        self.stop_reason: int | str | None = None
        # Completion text truncated at a stop-string match, set by the
        # engine's stop checker; callers prefer it over re-decoding
        # (token ids may extend past the match within the same window).
        self.output_text: str | None = None
        # Lazy per-request StopStringMatcher (engine-owned; host state
        # only, survives preemption because completion tokens do).
        self.stop_matcher = None
        # n>1 sibling forking: the sequence whose full prompt blocks
        # this one shares at allocation (copy-on-write via refcounts).
        # Cleared opportunistically once the parent finishes; a fork
        # falls back to plain allocation whenever the parent's table is
        # gone (preempted/finished).
        self.fork_from: Sequence | None = None

    # -- token/block math ----------------------------------------------------

    def __len__(self) -> int:
        return len(self.token_ids)

    @property
    def num_tokens(self) -> int:
        return len(self.token_ids)

    @property
    def num_completion_tokens(self) -> int:
        return len(self.token_ids) - self.num_prompt_tokens

    @property
    def completion_token_ids(self) -> list[int]:
        return self.token_ids[self.num_prompt_tokens :]

    @property
    def prompt_token_ids(self) -> list[int]:
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def last_token(self) -> int:
        return self.token_ids[-1]

    @property
    def num_blocks(self) -> int:
        """Blocks needed to hold all current tokens."""
        return (len(self.token_ids) + self.block_size - 1) // self.block_size

    @property
    def last_block_num_tokens(self) -> int:
        return len(self.token_ids) - (self.num_blocks - 1) * self.block_size

    @property
    def num_cached_blocks(self) -> int:
        return self.num_cached_tokens // self.block_size

    def block(self, i: int) -> list[int]:
        """Token ids covered by logical block i."""
        if not 0 <= i < self.num_blocks:
            raise IndexError(f"block {i} out of range [0, {self.num_blocks})")
        return self.token_ids[i * self.block_size : (i + 1) * self.block_size]

    # -- state transitions ---------------------------------------------------

    def append_token(self, token_id: int) -> None:
        self.token_ids.append(token_id)

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    @property
    def is_running(self) -> bool:
        return self.status == SequenceStatus.RUNNING

    def reset_for_recompute(self) -> None:
        """Preemption: drop cache state; tokens are kept and recomputed
        (reference: scheduler.py:250-266)."""
        self.status = SequenceStatus.WAITING
        self.block_table = []
        self.num_cached_tokens = 0
        self.num_computed_tokens = 0
        self.chunk_range = None
        self.num_preemptions += 1
        # Prompt logprobs are re-recorded by the recompute prefill.
        self.prompt_logprobs = []

    def __repr__(self) -> str:
        return (
            f"Sequence(id={self.seq_id}, status={self.status.name}, "
            f"tokens={len(self.token_ids)}, prompt={self.num_prompt_tokens}, "
            f"blocks={len(self.block_table)})"
        )

"""User-facing sampling parameters.

API-compatible with the reference SamplingParams
(/root/reference/minivllm/sampling_params.py:12-67), extended with the
reference's internal SamplingConfig knobs (sampling/config.py:6-54) so the
full sampler pipeline is reachable from the public API.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["SamplingParams"]


@dataclass
class SamplingParams:
    """Controls token sampling during generation.

    temperature == 0 selects greedy decoding. top_k == -1 disables top-k.
    Filters are applied in the reference's order: penalties -> temperature ->
    typical -> top-k -> top-p -> min-p -> sample
    (/root/reference/minivllm/sampling/sampler.py:27-110).
    """

    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    max_tokens: int = 64
    ignore_eos: bool = False
    # Number of completions per prompt (OpenAI `n`). The engine forks
    # the prompt's KV blocks copy-on-write (refcounted full prompt
    # blocks are shared; each sibling recomputes only the partial tail
    # block), so n > 1 costs far less than n independent requests, and
    # siblings are ideal shared-prefix decode groups. A seeded request's
    # sibling i draws with seed + i (deterministic, distinct streams).
    n: int = 1
    # OpenAI `best_of`: generate best_of completions (forked like n) and
    # return only the n highest-scoring by cumulative logprob. Forces
    # per-token logprob tracking on the siblings, which routes them
    # down the single-step decode path — use for quality-critical
    # requests, not bulk serving. None means best_of = n.
    best_of: int | None = None
    # Extended knobs (reference internal SamplingConfig):
    typical_p: float = 1.0
    repetition_penalty: float = 1.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    avoid_top_k: int = 0
    # Per-request reproducibility: draws for a seeded request derive from
    # (seed, token position) only, so identical seeded requests reproduce
    # across engine restarts and batch compositions.
    seed: int | None = None
    # Mirostat perplexity-controlled sampling: 0 off, 1 or 2 selects the
    # algorithm version. Routed through the single-step decode path (the
    # running surprise bound mu is inherently sequential per sequence).
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    # Return per-completion-token logprobs (of the unfiltered
    # distribution, OpenAI semantics): None = off, N >= 0 additionally
    # returns the top-N alternative tokens' logprobs. Beyond the
    # reference, which returns token ids only.
    logprobs: int | None = None
    # Return per-PROMPT-token logprobs (each prompt token's probability
    # given its prefix; the first token has no prefix and reports None).
    # Backs the OpenAI completions `echo` + `logprobs` combination.
    # Disables prefix-cache reuse for the request: every prompt position
    # must actually be computed to have logits.
    prompt_logprobs: int | None = None
    # Stop strings: generation TERMINATES (KV blocks freed, no further
    # decode capacity burned) within one decode window of the first
    # occurrence of any of these in the generated text; the returned
    # text is truncated at the match (OpenAI `stop`). Requires a
    # tokenizer. A bare string is normalized to a one-element list.
    stop: str | list[str] | None = None
    # Token ids that end generation like EOS (checked token-level in the
    # scheduler; independent of ignore_eos, which only gates the model
    # EOS id). The matched id IS included in the returned token ids and
    # reported as the request's stop_reason.
    stop_token_ids: list[int] | None = None
    # Keep the matched stop string in the output text (off = OpenAI
    # default truncation BEFORE the stop string).
    include_stop_str_in_output: bool = False
    # OpenAI logit_bias: token id -> additive bias in [-100, 100],
    # applied to the logits before every filter and the greedy argmax
    # (so -100 effectively bans a token and +100 forces it). Routed
    # down the single-step decode path like penalties.
    logit_bias: dict[int, float] | None = None

    def __post_init__(self) -> None:
        if self.temperature < 0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError(f"top_k must be -1 (disable) or > 0, got {self.top_k}")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if self.max_tokens <= 0:
            raise ValueError(f"max_tokens must be > 0, got {self.max_tokens}")
        if not 1 <= self.n <= 64:
            raise ValueError(f"n must be in [1, 64], got {self.n}")
        if self.best_of is not None and not self.n <= self.best_of <= 64:
            raise ValueError(
                f"best_of must be in [n, 64], got {self.best_of} (n={self.n})"
            )
        if not 0.0 < self.typical_p <= 1.0:
            raise ValueError(f"typical_p must be in (0, 1], got {self.typical_p}")
        if self.repetition_penalty <= 0:
            raise ValueError(
                f"repetition_penalty must be > 0, got {self.repetition_penalty}"
            )
        if self.avoid_top_k < 0:
            raise ValueError(
                f"avoid_top_k must be non-negative, got {self.avoid_top_k}"
            )
        if self.seed is not None and not 0 <= self.seed < 2**31:
            raise ValueError(f"seed must be in [0, 2**31), got {self.seed}")
        if self.mirostat not in (0, 1, 2):
            raise ValueError(f"mirostat must be 0, 1 or 2, got {self.mirostat}")
        if self.mirostat_tau <= 0:
            raise ValueError(f"mirostat_tau must be > 0, got {self.mirostat_tau}")
        if not 0.0 < self.mirostat_eta <= 1.0:
            raise ValueError(
                f"mirostat_eta must be in (0, 1], got {self.mirostat_eta}"
            )
        if self.logprobs is not None and not 0 <= self.logprobs <= 20:
            raise ValueError(
                f"logprobs must be None or in [0, 20], got {self.logprobs}"
            )
        if self.prompt_logprobs is not None and not 0 <= self.prompt_logprobs <= 20:
            raise ValueError(
                f"prompt_logprobs must be None or in [0, 20], "
                f"got {self.prompt_logprobs}"
            )
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        if self.stop is not None:
            if not all(isinstance(s, str) and s for s in self.stop):
                raise ValueError(
                    f"stop must be a non-empty string or list of "
                    f"non-empty strings, got {self.stop!r}"
                )
            self.stop = list(self.stop)
        if self.stop_token_ids is not None:
            if not all(
                isinstance(t, int) and t >= 0 for t in self.stop_token_ids
            ):
                raise ValueError(
                    f"stop_token_ids must be non-negative ints, "
                    f"got {self.stop_token_ids!r}"
                )
            self.stop_token_ids = list(self.stop_token_ids)
        if self.logit_bias is not None:
            norm: dict[int, float] = {}
            for t, b in self.logit_bias.items():
                t = int(t)  # OpenAI clients send string keys
                b = float(b)
                if t < 0 or not -100.0 <= b <= 100.0:
                    raise ValueError(
                        f"logit_bias needs token ids >= 0 and biases in "
                        f"[-100, 100], got {t}: {b}"
                    )
                norm[t] = b
            self.logit_bias = norm

    @property
    def has_logit_bias(self) -> bool:
        return bool(self.logit_bias)

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0

    @property
    def has_penalties(self) -> bool:
        return (
            self.repetition_penalty != 1.0
            or self.frequency_penalty != 0.0
            or self.presence_penalty != 0.0
        )

"""Incremental detokenization and stop-string matching.

Backs `SamplingParams.stop`: the engine must SEE the generated text to
know when a stop string appears, but re-decoding the whole completion
every step is O(n^2). This is the standard streaming-detokenizer
algorithm (as used by TGI/vLLM's public detokenize_incrementally):
convert only the NEW token ids to token strings, re-render a small
trailing window through `convert_tokens_to_string` (byte-level BPE and
SentencePiece token strings are context-dependent at the boundary), and
emit the stable delta — holding back trailing U+FFFD replacement chars
from tokens that split a UTF-8 codepoint.

The reference has no stop-string support at all (its scheduler finishes
on the single EOS id, /root/reference/minivllm/engine/scheduler.py);
this is a beyond-parity serving feature, engine-level so the library
path and every server route share one implementation and multi-host
replicas make identical decisions (the tokenizer is deterministic).
"""

from __future__ import annotations

__all__ = ["IncrementalDetokenizer", "StopStringMatcher"]


class IncrementalDetokenizer:
    """Streams text from a growing completion-token-id list.

    `update(token_ids)` takes the FULL completion id list (its prefix
    must be what was passed before) and appends newly-stable text to
    `self.text`, returning the delta. Cost per call is O(new tokens),
    independent of the completion length.
    """

    def __init__(self, tokenizer, skip_special_tokens: bool = True) -> None:
        self.tokenizer = tokenizer
        self.skip_special = skip_special_tokens
        self.text = ""
        self._tokens: list[str] = []
        self._n_ids = 0
        # Render window: tokens in [prefix_offset, len) re-render each
        # update; text before read_offset is already emitted.
        self._prefix_offset = 0
        self._read_offset = 0

    def update(self, token_ids: list[int]) -> str:
        new_ids = token_ids[self._n_ids :]
        if not new_ids:
            return ""
        self._n_ids = len(token_ids)
        toks = self.tokenizer.convert_ids_to_tokens(
            new_ids, skip_special_tokens=self.skip_special
        )
        self._tokens.extend(t for t in toks if t is not None)
        prev = self.tokenizer.convert_tokens_to_string(
            self._tokens[self._prefix_offset : self._read_offset]
        )
        full = self.tokenizer.convert_tokens_to_string(
            self._tokens[self._prefix_offset :]
        )
        if len(full) <= len(prev) or full.endswith("�"):
            # Un-renderable tail (mid-codepoint byte token): hold back
            # until a later token completes it.
            return ""
        delta = full[len(prev) :]
        self._prefix_offset = self._read_offset
        self._read_offset = len(self._tokens)
        self.text += delta
        return delta


class StopStringMatcher:
    """Per-request stop-string state: incremental text + scan position.

    `check(completion_ids)` returns None while no stop string has
    appeared; on the first match it returns (final_text, stop_string)
    where final_text is the completion text truncated at the match
    (through it when include_stop_str=True). The earliest match in the
    text wins; ties prefer the longest stop string at that position.
    """

    def __init__(
        self, tokenizer, stops: list[str], include_stop_str: bool = False
    ) -> None:
        self.detok = IncrementalDetokenizer(tokenizer)
        self.stops = sorted(stops, key=len, reverse=True)
        self.include = include_stop_str
        self._max_len = max(len(s) for s in stops)
        self._scan_from = 0

    def check(self, completion_ids: list[int]) -> tuple[str, str] | None:
        self.detok.update(completion_ids)
        text = self.detok.text
        # A match can straddle the last scan's boundary by at most
        # max_len - 1 chars.
        start = max(0, self._scan_from - (self._max_len - 1))
        best: tuple[int, str] | None = None
        for s in self.stops:
            i = text.find(s, start)
            if i >= 0 and (best is None or i < best[0]):
                best = (i, s)
        self._scan_from = len(text)
        if best is None:
            return None
        i, s = best
        return text[: i + (len(s) if self.include else 0)], s

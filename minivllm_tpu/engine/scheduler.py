"""Two-phase continuous-batching scheduler.

Counterpart of the reference Scheduler
(/root/reference/minivllm/engine/scheduler.py:55-293): prefill-first
admission under a token/block budget, decode of all running sequences with
preempt-youngest on memory pressure, and EOS/max-token finishing in
postprocess. The semantics are identical; the output feeds the TPU model
runner's bucketed jit step instead of a per-rank torch runner.
"""

from __future__ import annotations

from collections import deque

from minivllm_tpu.config import Config
from minivllm_tpu.engine.block_manager import BlockManager
from minivllm_tpu.engine.sequence import Sequence, SequenceStatus

__all__ = ["Scheduler"]


class Scheduler:
    def __init__(self, config: Config) -> None:
        if config.num_kvcache_blocks <= 0:
            raise ValueError(
                "Scheduler requires a resolved num_kvcache_blocks; the engine "
                "sets it from the HBM budget before constructing the scheduler"
            )
        self.config = config
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.eos = config.eos
        self.block_manager = BlockManager(
            config.num_kvcache_blocks,
            config.kvcache_block_size,
            config.enable_prefix_caching,
        )
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()
        # Live requests by id for O(1) abort lookup (the server's
        # disconnect poll aborts per dead client).
        self._by_id: dict[int, Sequence] = {}
        self.num_preemptions = 0

    def add(self, seq: Sequence) -> None:
        self.waiting.append(seq)
        self._by_id[seq.seq_id] = seq

    def get(self, seq_id: int) -> Sequence | None:
        """The live (unfinished) sequence with this id, or None."""
        return self._by_id.get(seq_id)

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def unfinished(self) -> list[Sequence]:
        """All live requests, waiting first (checkpoint/resume support)."""
        return list(self.waiting) + list(self.running)

    @property
    def num_waiting(self) -> int:
        return len(self.waiting)

    @property
    def num_running(self) -> int:
        return len(self.running)

    # -- scheduling ----------------------------------------------------------

    def schedule(self) -> tuple[list[Sequence], bool]:
        """Pick the next batch. Returns (sequences, is_prefill).

        Phase 1 (prefill): admit waiting sequences FIFO while the packed
        uncached-token count fits max_num_batched_tokens, the running set
        fits max_num_seqs, and blocks are available.
        Phase 2 (decode): all running sequences; on block exhaustion preempt
        the most recently scheduled sequence (recompute-from-scratch).
        """
        scheduled: list[Sequence] = []
        budget = self.max_num_batched_tokens
        # Completed admissions move into self.running inside the loop, so
        # the running count alone is the concurrency gauge (a partial chunk
        # ends the loop before it could be miscounted).
        while (
            self.waiting
            and budget > 0
            and len(self.running) < self.max_num_seqs
        ):
            seq = self.waiting[0]
            if not seq.block_table:
                bm = self.block_manager
                parent = seq.fork_from
                if parent is not None and parent.is_finished:
                    seq.fork_from = parent = None  # table gone; plain path
                if (
                    parent is not None
                    and bm.shared_fork_blocks(parent, seq) > 0
                ):
                    # n>1 sibling: share the parent's full prompt blocks
                    # copy-on-write instead of recomputing the prompt.
                    if not bm.can_fork(parent, seq):
                        break
                    bm.fork(parent, seq)
                else:
                    if not bm.can_allocate(seq):
                        break
                    bm.allocate(seq)
                seq.num_computed_tokens = seq.num_cached_tokens
            start = seq.num_computed_tokens
            remaining = len(seq) - start
            chunk = min(remaining, budget)
            if chunk <= 0:
                break
            # Chunked prefill: a prompt larger than the remaining budget
            # computes [start, start+chunk) now and continues next round
            # (beyond-reference capability; the reference requires the whole
            # prompt to fit max_num_batched_tokens, config.py:257-264).
            seq.chunk_range = (start, start + chunk)
            seq.num_computed_tokens = start + chunk
            budget -= chunk
            scheduled.append(seq)
            if seq.num_computed_tokens >= len(seq):
                self.waiting.popleft()
                seq.status = SequenceStatus.RUNNING
                self.running.append(seq)
            else:
                break  # budget exhausted mid-prompt
        if scheduled:
            return scheduled, True

        if self.waiting and not self.running:
            # Nothing admitted and nothing running: the head request can
            # never fit (needs more blocks than exist).
            seq = self.waiting[0]
            raise RuntimeError(
                f"request seq_id={seq.seq_id} with {len(seq)} tokens cannot be "
                f"scheduled (total blocks={self.block_manager.num_blocks}, "
                f"block_size={self.block_manager.block_size})"
            )

        # Decode phase. Blocks are reserved for the full multi-step window
        # so every fused decode iteration has its KV slot.
        lookahead = self.config.decode_multi_step
        if (
            self.config.speculative_num_tokens > 0
            and self.config.speculative_fused
        ):
            # Each fused-speculative iteration writes up to k+1 positions.
            lookahead *= self.config.speculative_num_tokens + 1
        decode: list[Sequence] = []
        temp = deque(self.running)
        while temp:
            seq = temp.popleft()
            while not self.block_manager.can_append(seq, lookahead):
                if temp:
                    victim = temp.pop()  # youngest other running seq
                else:
                    victim = seq
                self._preempt(victim)
                if victim is seq:
                    break
            else:
                self.block_manager.may_append(seq, lookahead)
                decode.append(seq)
        self.running = deque(decode)
        return decode, False

    def abort(self, seq: Sequence) -> None:
        """Cancel a live request: free its blocks, drop it from the queues,
        mark it finished (engine abort_request / stream cleanup)."""
        if seq.block_table:
            self.block_manager.deallocate(seq)
        seq.status = SequenceStatus.FINISHED
        self._by_id.pop(seq.seq_id, None)
        if seq in self.running:
            self.running.remove(seq)
        if seq in self.waiting:
            self.waiting.remove(seq)

    def _preempt(self, seq: Sequence) -> None:
        self.num_preemptions += 1
        self.block_manager.deallocate(seq)
        seq.reset_for_recompute()
        self.waiting.appendleft(seq)

    # -- postprocess ---------------------------------------------------------

    def postprocess(
        self,
        seqs: list[Sequence],
        token_ids: list[int],
        logprobs: list | None = None,
    ) -> None:
        """Append sampled tokens; finish on EOS / max_tokens / model length.

        `logprobs`, when given, is the runner's per-seq
        (chosen_lp, top_ids, top_lps) list; entries are recorded on
        sequences that requested them, trimmed to their own top-k.

        Note: `may_append` for decode steps runs in schedule() *before* the
        token exists; the appended token here lands in the slot reserved
        there. For prefill steps the first generated token always fits the
        last allocated block or triggers allocation on the next schedule().
        """
        if len(seqs) != len(token_ids):
            raise ValueError(f"{len(seqs)} seqs vs {len(token_ids)} tokens")
        for i, (seq, token_id) in enumerate(zip(seqs, token_ids)):
            seq.chunk_range = None
            if seq.num_computed_tokens < len(seq):
                continue  # mid-prompt chunk: its sampled token is discarded
            seq.append_token(token_id)
            if logprobs is not None and seq.sampling_params.logprobs is not None:
                chosen, top_ids, top_lps = logprobs[i]
                k = seq.sampling_params.logprobs
                seq.logprobs.append(
                    {
                        "token_id": token_id,
                        "logprob": chosen,
                        "top": {
                            int(t): float(l)
                            for t, l in zip(top_ids[:k], top_lps[:k])
                        },
                    }
                )
            seq.num_computed_tokens = len(seq)
            self.block_manager.on_token_appended(seq)
            sp = seq.sampling_params
            is_eos = not sp.ignore_eos and token_id == self.eos
            is_stop_tok = (
                sp.stop_token_ids is not None
                and token_id in sp.stop_token_ids
            )
            if is_eos or is_stop_tok:
                seq.finish_reason = "stop"
                seq.stop_reason = token_id if is_stop_tok else None
            elif (
                seq.num_completion_tokens >= sp.max_tokens
                or len(seq) >= self.config.max_model_len
            ):
                seq.finish_reason = "length"
            else:
                continue
            seq.status = SequenceStatus.FINISHED
            self._by_id.pop(seq.seq_id, None)
            self.block_manager.deallocate(seq)
            self.running.remove(seq)

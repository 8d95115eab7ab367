"""Engine orchestration: request intake, scheduling loop, detokenization.

API-compatible counterpart of the reference LLMEngine
(/root/reference/minivllm/engine/llm_engine.py:55-367): add_request /
step / generate / is_finished / exit. Differences are all TPU-architectural:
no worker processes are spawned (SPMD replaces the rank-RPC machinery,
SURVEY.md §2.3) and the model runner is the bucketed-jit TPU runner.
"""

from __future__ import annotations

import atexit
import logging
from time import perf_counter
from typing import Any

from minivllm_tpu.config import Config
from minivllm_tpu.engine.model_runner import ModelRunner
from minivllm_tpu.engine.scheduler import Scheduler
from minivllm_tpu.engine.sequence import Sequence
from minivllm_tpu.sampling_params import SamplingParams

logger = logging.getLogger(__name__)

__all__ = ["LLMEngine"]


class LLMEngine:
    def __init__(self, config: Config, *, init_random: bool = False) -> None:
        if not isinstance(config, Config):
            raise TypeError(f"config must be a Config, got {type(config)}")
        self.config = config
        self.model_runner = ModelRunner(config, init_random=init_random)
        self.tokenizer = self._load_tokenizer()
        self._resolve_eos()
        if not config.enforce_eager:
            self.model_runner.warmup()
        self.scheduler = Scheduler(config)
        from minivllm_tpu.utils.metrics import StepTimer

        self.metrics = StepTimer()
        self._exited = False
        self.num_oom_recoveries = 0  # mid-serving OOM recoveries (step())
        # Adaptive speculative-decoding gate state (_spec_gate_open).
        self._spec_window = (0, 0)  # (opportunities, extra) in the window
        self._spec_cooldown = 0
        self._spec_backoff = self.SPEC_GATE_COOLDOWN
        # Measured decode rates (EMA tokens/s) of fused-spec dispatches
        # vs plain fused windows — the self-calibrating gate signal.
        self._spec_rate = None
        self._plain_rate = None
        self._spec_dispatch_i = 0
        # n>1 sibling bookkeeping: primary seq_id -> all sibling ids;
        # best_of entries additionally record (keep_n, logprobs_forced).
        self._families: dict[int, list[int]] = {}
        self._family_keep: dict[int, tuple[int, bool]] = {}
        atexit.register(self.exit)

    # -- setup ---------------------------------------------------------------

    # Adaptive gate for n-gram speculation. A fused-spec ITERATION runs
    # a (k+1)-row verify pass costing ~2-3x a plain decode iteration
    # (measured, docs/roadmap.md) whether or not any draft exists — so
    # the gate must charge every OPPORTUNITY (a live sequence in a spec
    # iteration), not just drafted tokens: a workload that never drafts
    # (fresh prose) would otherwise never fill a drafted-token window
    # and speculation would burn 5x rows forever. Track EXTRA tokens
    # (beyond the one-per-iteration floor) per opportunity; below the
    # break-even threshold, stop for a cooldown, then probe again.
    SPEC_GATE_WINDOW = 64      # opportunities per decision window
    # Extra tokens per live sequence-iteration speculation must deliver.
    # Break-even is ~1.5-2 at the measured verify/plain cost ratio; 1.0
    # keeps the probe generous while bounding pathological loss.
    SPEC_GATE_MIN_EXTRA = 1.0
    # Dispatches to sit out after a miss. One fused dispatch covers a
    # whole K-iteration window (4-8 decode steps), so this is ~50-100
    # generated tokens per sequence — long enough to skip a
    # non-accepting stretch, short enough to re-probe within a typical
    # completion (a workload can turn repetitive mid-generation).
    # CONSECUTIVE misses back off exponentially up to the cap (each
    # probe is a full (k+1)-row dispatch; a never-accepting workload
    # measured -18.5% e2e at a fixed 12-dispatch cooldown, and backoff
    # bounds that to the first few probes); any hit resets the backoff.
    SPEC_GATE_COOLDOWN = 12
    SPEC_GATE_COOLDOWN_MAX = 192
    # Every Nth spec-eligible dispatch runs the PLAIN window instead,
    # keeping the plain-rate EMA live for the throughput comparison.
    SPEC_CALIBRATE_EVERY = 16

    def _spec_gate_open(self) -> bool:
        if self._spec_cooldown > 0:
            self._spec_cooldown -= 1
            return False
        return True

    @staticmethod
    def _ema_rate(prev, tokens: int, dt: float):
        """EMA tokens/s over dispatches (alpha 0.3 rides out relay
        jitter while tracking the workload)."""
        if tokens <= 0 or dt <= 0:
            return prev
        rate = tokens / dt
        return rate if prev is None else 0.7 * prev + 0.3 * rate

    def _host_drafts_exist(self, seqs) -> bool:
        """Cheap host-side probe qualifier: does ANY sequence's trailing
        n-gram recur in its recent history? Called only while the gate
        is in escalated backoff; a False answer re-arms the cooldown so
        the O(S * window) scan itself runs at backoff cadence."""
        from minivllm_tpu.engine.spec import PROPOSE_WINDOW, propose_ngram

        ngram = self.config.speculative_ngram
        for s in seqs:
            # Same window as the device proposer (run_spec_multi): a
            # narrower host scan would veto probes forever on workloads
            # whose n-grams recur only deeper in the history.
            if propose_ngram(s.token_ids, ngram, 1, window=PROPOSE_WINDOW):
                return True
        self._spec_cooldown = self._spec_backoff
        self._spec_backoff = min(
            self._spec_backoff * 2, self.SPEC_GATE_COOLDOWN_MAX
        )
        return False

    def _spec_gate_update(self, opportunities: int, extra: int) -> None:
        d, a = self._spec_window
        d, a = d + opportunities, a + extra
        if d >= self.SPEC_GATE_WINDOW:
            # Two independent loss signals: (1) the deterministic
            # extra-per-opportunity floor — below it speculation cannot
            # win at ANY cost ratio; (2) the MEASURED throughput of
            # spec dispatches vs plain fused windows (EMA tokens/s,
            # recorded in step()) — self-calibrating for the actual
            # verify/plain cost ratio of this model/batch/hardware,
            # which a fixed threshold cannot capture (break-even extra
            # is ~1.5 at 8 seqs but ~3 at 64 on the measured v5e).
            rate_lose = (
                self._spec_rate is not None
                and self._plain_rate is not None
                and self._spec_rate < self._plain_rate
            )
            if a < d * self.SPEC_GATE_MIN_EXTRA or rate_lose:
                self._spec_cooldown = self._spec_backoff
                self._spec_backoff = min(
                    self._spec_backoff * 2, self.SPEC_GATE_COOLDOWN_MAX
                )
            else:
                self._spec_backoff = self.SPEC_GATE_COOLDOWN
            d, a = 0, 0
        self._spec_window = (d, a)

    def _load_tokenizer(self):
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(
                self.config.model,
                trust_remote_code=self.config.trust_remote_code,
            )
        except Exception as e:  # tokenizer files absent (e.g. test checkpoints)
            logger.warning("no tokenizer available for %s: %s", self.config.model, e)
            return None

    def _resolve_eos(self) -> None:
        if self.config.eos >= 0:
            return
        eos = None
        if self.tokenizer is not None:
            eos = self.tokenizer.eos_token_id
        if eos is None:
            eos = getattr(self.config.hf_config, "eos_token_id", None)
        if isinstance(eos, list):
            eos = eos[0] if eos else None
        self.config.eos = int(eos) if eos is not None else -1

    # -- lifecycle -----------------------------------------------------------

    def exit(self) -> None:
        """Graceful shutdown (reference: llm_engine.py:116-169). No worker
        processes exist; just drop device references."""
        if self._exited:
            return
        self._exited = True
        self.model_runner = None

    # -- serving -------------------------------------------------------------

    def add_request(
        self,
        prompt: str | list[int],
        sampling_params: SamplingParams | None = None,
    ) -> int:
        """Enqueue one request; returns its seq_id. `sampling_params.n > 1`
        enqueues n sibling sequences that FORK the prompt's KV blocks
        copy-on-write (scheduler admission + block_manager.fork): the
        prompt prefills once, siblings share its full blocks by refcount
        and recompute only the partial tail, and the shared-prefix decode
        grouping picks them up. Returns the primary sibling's id;
        `family(primary_id)` lists all n ids (primary first)."""
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise RuntimeError(
                    "string prompts require a tokenizer; pass token ids or "
                    "provide tokenizer files with the model"
                )
            prompt_tokens: list[int] = self.tokenizer.encode(prompt)
        else:
            prompt_tokens = list(prompt)
        n = sampling_params.best_of or sampling_params.n
        if n == 1:
            seq = Sequence(
                prompt_tokens, sampling_params,
                block_size=self.config.kvcache_block_size,
            )
            seq.arrival_time = perf_counter()
            self.scheduler.add(seq)
            return seq.seq_id
        import dataclasses

        # best_of ranking needs each sibling's cumulative logprob:
        # force per-token logprob tracking when the caller didn't ask.
        force_lp = (
            sampling_params.best_of is not None
            and sampling_params.best_of > sampling_params.n
            and sampling_params.logprobs is None
        )
        ids: list[int] = []
        parent: Sequence | None = None
        for i in range(n):
            # Sibling i of a seeded request draws with seed + i:
            # deterministic, distinct streams, and identical to an
            # independent request with that seed (seeded draws depend
            # on (seed, position) only — sampling/ops._row_keys).
            sp_i = dataclasses.replace(
                sampling_params,
                n=1,
                best_of=None,
                logprobs=0 if force_lp else sampling_params.logprobs,
                seed=(
                    None if sampling_params.seed is None
                    else (sampling_params.seed + i) % (2**31)
                ),
            )
            seq = Sequence(
                prompt_tokens, sp_i,
                block_size=self.config.kvcache_block_size,
            )
            seq.arrival_time = perf_counter()
            if parent is None:
                parent = seq
            else:
                seq.fork_from = parent
            self.scheduler.add(seq)
            ids.append(seq.seq_id)
        self._families[ids[0]] = ids
        if sampling_params.best_of is not None:
            # generate()/the server keep only the top-n by cumulative
            # logprob; remember n and whether logprobs were forced.
            self._family_keep[ids[0]] = (sampling_params.n, force_lp)
        return ids[0]

    def family(self, primary_id: int) -> list[int]:
        """All sibling seq_ids of an n>1 request (primary first); a plain
        request maps to itself."""
        return self._families.get(primary_id, [primary_id])

    def pop_family(self, primary_id: int) -> list[int]:
        """family() + drop the bookkeeping entry (call once the caller
        has bound the sibling ids)."""
        return self._families.pop(primary_id, [primary_id])

    def step(self) -> tuple[list[tuple[int, list[int], list | None, list | None]], int]:
        """One engine step. Returns (finished outputs, ±token count):
        finished entries are (seq_id, completion token ids, logprob entries
        or None, prompt-logprob entries or None, (finish_reason,
        stop_reason, stop-truncated text or None)); positive counts are
        prefill tokens, negative decode tokens (reference convention,
        llm_engine.py:203-251).

        Device OOM (RESOURCE_EXHAUSTED) during LIVE serving — a lazily
        compiled bucket (unusual block-table width, penalty variant)
        exhausting compile workspace mid-traffic — recovers in place:
        every live sequence is preempted to the recompute path, the KV
        cache shrinks, and the scheduler's block pool is rebuilt with
        all requests preserved (reference analog: the attention-call
        OOM retry, attention_backend.py:596-614). Each step dispatches
        the device at most once and fetches results before any host
        bookkeeping, so a failed step applies nothing."""
        from minivllm_tpu.engine.model_runner import is_device_oom

        try:
            return self._step_inner()
        except Exception as e:  # jaxlib XlaRuntimeError
            if not is_device_oom(e):
                raise
            if self.config.multihost and self._process_count() > 1:
                # Multi-host replicates the scheduler; a LOCAL
                # preempt-all + shrink + rebuild would diverge
                # host-visible state (block pool size, preemption order)
                # from peers that did not OOM — permanently, silently.
                # Fail fast with an actionable error instead (CLAUDE.md
                # determinism invariant).
                raise RuntimeError(
                    "device OOM during multi-host serving: in-place "
                    "recovery would diverge the replicated scheduler "
                    "state across hosts. Restart the serving job with a "
                    "smaller KV cache (lower gpu_memory_utilization or "
                    "max_num_seqs); engine state can be preserved with "
                    "save_state/load_state."
                ) from e
            self.num_oom_recoveries += 1
            if self.num_oom_recoveries > 16:
                raise
        # Recovery runs OUTSIDE the except block deliberately: inside
        # it, the caught exception's traceback pins _step_inner's frames
        # and their locals — the old KV cache, packed batch, logits —
        # so the device stays at its OOM high-water mark and the
        # recovery's own reallocation fails too (measured round 5: a
        # 2048-len workload failed 8 compounding shrinks in a row, then
        # succeeded immediately once the traceback was released).
        nb = self._recover_from_oom()
        logger.warning(
            "device OOM mid-serving (recovery %d); %d live requests "
            "preempted to recompute, KV cache shrunk to %d blocks",
            self.num_oom_recoveries,
            self.scheduler.num_waiting,
            nb,
        )
        return [], 0  # nothing finished; the caller's loop continues

    @staticmethod
    def _process_count() -> int:
        import jax

        return jax.process_count()

    def _recover_from_oom(self) -> int:
        """Preempt-all + shrink + rebuild the block pool. The failed
        step's donated KV cache buffers are already invalid; every live
        block table is dropped (block ids shift meaning across the
        reallocation) and sequences re-enter the waiting queue for
        chunked, prefix-cache-assisted recompute — the same machinery
        preemption uses, so generated-so-far tokens survive."""
        from minivllm_tpu.engine.scheduler import Scheduler

        live = self.scheduler.unfinished()
        for s in live:
            s.reset_for_recompute()
        self.scheduler.num_preemptions += len(live)
        # Stale cross-step state computed against the old cache/block ids.
        # _spec_hist_cache too: its hist/lens arrays were DONATED into
        # the failed dispatch (invalidated), but the (seq_id, length)
        # signature still matches after recovery (the failed step
        # applied nothing) — reuse would crash on deleted arrays.
        self.model_runner._spec = None
        self.model_runner._spec_hist_cache = None
        # The reallocation itself can hit RESOURCE_EXHAUSTED: right
        # after a runtime OOM the device is at its high-water mark and
        # one 12.5% shrink may not clear it (measured round 5: a
        # 64-seq/2048-len workload OOM'd inside shrink_kv_cache's
        # make_zeros and escaped recovery entirely). Keep shrinking —
        # each attempt compounds 0.875x from the CURRENT block count,
        # and shrink_kv_cache drops the old buffers before allocating,
        # so every retry has strictly more headroom.
        from minivllm_tpu.engine.model_runner import is_device_oom

        nb = None
        for _ in range(8):
            try:
                nb = self.model_runner.shrink_kv_cache()
                break
            except Exception as e:  # jaxlib XlaRuntimeError
                if not is_device_oom(e):
                    raise
        if nb is None:
            raise RuntimeError(
                "KV cache reallocation still out of memory after 8 "
                "compounding shrinks; the device has no serving headroom"
            )
        preemptions = self.scheduler.num_preemptions
        self.scheduler = Scheduler(self.config)  # new pool at nb blocks
        self.scheduler.num_preemptions = preemptions
        for s in live:
            self.scheduler.add(s)
        return nb

    def _check_stop_strings(self, seqs) -> None:
        """Finish sequences whose generated text now contains one of
        their stop strings (SamplingParams.stop). Called after every
        postprocess batch, so a match terminates within ONE decode
        window: remaining fused iterations skip the finished sequence
        and its KV blocks free here, not at max_tokens. Host-replica
        deterministic (same tokenizer everywhere)."""
        if self.tokenizer is None:
            return
        from minivllm_tpu.utils.detok import StopStringMatcher

        for s in seqs:
            sp = s.sampling_params
            if s.is_finished or not sp.stop:
                continue
            if s.stop_matcher is None:
                s.stop_matcher = StopStringMatcher(
                    self.tokenizer, sp.stop, sp.include_stop_str_in_output
                )
            hit = s.stop_matcher.check(s.completion_token_ids)
            if hit is None:
                continue
            s.output_text, s.stop_reason = hit
            s.finish_reason = "stop"
            self.scheduler.abort(s)  # frees blocks, marks FINISHED

    def _step_inner(self) -> tuple[list[tuple[int, list[int], list | None, list | None]], int]:
        t0 = perf_counter()
        seqs, is_prefill = self.scheduler.schedule()

        def pick_window() -> int:
            """Adaptive fused-decode window: pow2 ceiling of the fewest
            remaining tokens, clamped by the model length and K_max."""
            rem = max(
                1,
                min(
                    s.sampling_params.max_tokens - s.num_completion_tokens
                    for s in seqs
                ),
            )
            hard = min(self.config.max_model_len - len(s) for s in seqs)
            k = min(
                self.config.decode_multi_step,
                1 << (rem - 1).bit_length(),  # ceil pow2: overshoot < 2x
                max(hard, 1),
            )
            return 1 << (k.bit_length() - 1)  # floor to a power of two

        K = 1
        fused_cached = False
        if is_prefill:
            chunk_tokens = sum(
                (s.chunk_range[1] - s.chunk_range[0]) if s.chunk_range else 0
                for s in seqs
            )
            completing = [
                s for s in seqs if s.num_computed_tokens >= len(s)
            ]
            # Fused cached prefill: when every scheduled prompt has exactly
            # ONE uncached token left (all blocks prefix-cache hits, or a
            # final 1-token chunk), the step is shape-wise a decode — so
            # instead of dispatching it alone and the first decode window
            # separately, reserve the window's blocks now and run prompt
            # token + first K-1 completion tokens as ONE fused dispatch.
            # Halves dispatches (and per-dispatch host/relay latency) for
            # cache-hot serving. Skipped when other running sequences
            # would sit out the window, or for penalty/logprob requests
            # (those need the single-step path).
            bm = self.scheduler.block_manager
            if (
                self.config.decode_multi_step > 1
                and seqs
                and len(completing) == len(seqs)
                and all(s.chunk_range == (len(s) - 1, len(s)) for s in seqs)
                and len(self.scheduler.running) == len(seqs)
                and not any(
                    s.sampling_params.has_penalties
                    or s.sampling_params.has_logit_bias
                    or s.sampling_params.mirostat > 0
                    or s.sampling_params.logprobs is not None
                    or s.sampling_params.prompt_logprobs is not None
                    for s in seqs
                )
            ):
                K = pick_window()
                if K > 1 and all(bm.can_append(s, K) for s in seqs):
                    for s in seqs:
                        bm.may_append(s, K)
                    fused_cached = True
                else:
                    K = 1
        # Adaptive multi-step decode: fuse a power-of-two window sized to
        # the batch, so R remaining tokens decode in O(log R) dispatches
        # (often one) instead of R. Power-of-two windows bound the number
        # of distinct compiled programs to log2(K_max). The window may
        # overshoot a sequence's max_tokens by < 2x its remainder: the
        # surplus iterations' tokens are discarded and their KV writes land
        # in the scheduler-reserved lookahead blocks (freed on finish and
        # fully rewritten by any future owner's prefill). Only the model
        # length is a hard clamp — positions must stay inside the block
        # table.
        if not is_prefill and seqs and not any(
            s.sampling_params.has_penalties
            or s.sampling_params.has_logit_bias
            or s.sampling_params.mirostat > 0
            or s.sampling_params.logprobs is not None
            for s in seqs
        ):
            K = pick_window()
        appended = 0
        # N-gram speculative decoding (config.speculative_num_tokens,
        # engine/spec.py): when every sequence is greedy and any trailing
        # n-gram recurs in its own history, verify the looked-up draft
        # in ONE pass and append the matched prefix + bonus token —
        # several tokens per model pass, greedy-equivalent up to
        # batch-shape-invariant numerics (verify runs prefill-shaped;
        # under bf16 a near-tie argmax can flip vs the decode-shaped
        # pass — exact bit-parity is proven in fp32, tests/test_spec.py).
        # Takes precedence over the fused window for this dispatch (the
        # window saves dispatches; speculation saves model passes).
        spec_k = self.config.speculative_num_tokens
        spec_common = (
            spec_k > 0
            and not is_prefill
            and seqs
            and self._spec_gate_open()
            and all(
                not s.sampling_params.has_penalties
                and not s.sampling_params.has_logit_bias
                and s.sampling_params.mirostat == 0
                and s.sampling_params.logprobs is None
                for s in seqs
            )
        )
        # While in escalated backoff (at least one gate miss), a fused
        # probe dispatch is only paid if the HOST proposer finds any
        # draft at all on the current tails — a workload that never
        # drafts (fresh prose) then never pays another (k+1)-row device
        # probe; the failed host check itself re-arms the cooldown so
        # it reruns at backoff cadence, not per dispatch.
        if spec_common and self.config.speculative_fused and all(
            # Greedy rows accept by argmax equality; top-k/top-p/min-p
            # are INERT under argmax (rank 0 always survives). Sampled
            # rows use exact rejection sampling with those filters
            # applied to the verify distribution (engine/spec.py
            # accept_or_resample(filters=...)), so the standard serving
            # point (temp 0.7, top_p 0.95) speculates too, and so do
            # per-request seeds (accept_or_resample derives per-row
            # (seed, position) key chains). typical_p and avoid_top_k
            # can exclude the argmax and reorder the kept set — those
            # still disable speculation.
            s.sampling_params.typical_p >= 1.0
            and s.sampling_params.avoid_top_k == 0
            for s in seqs
        ) and (
            self._spec_backoff <= self.SPEC_GATE_COOLDOWN
            or self._host_drafts_exist(seqs)
        ):
            # FIXED iteration count (the plain window's pow2 cap), NOT
            # scaled to the remaining tokens: speculation advances
            # sequences by VARYING amounts, so a remaining-token-derived
            # Ks changes dispatch to dispatch and each (Ks, batch
            # bucket, table width) combination is a fresh compile of the
            # whole fused scan — measured ~1 s each through the compile
            # cache, which collapsed serving throughput 12x. Overshoot
            # iterations past a sequence's max_tokens waste a few
            # verify rows instead (their KV writes land in the
            # scheduler's (k+1)-scaled reservation); only the model
            # length hard-clamps.
            Ks = 1 << (max(1, self.config.decode_multi_step).bit_length() - 1)
            hard = min(self.config.max_model_len - len(s) for s in seqs)
            while Ks > 1 and Ks * (spec_k + 1) > max(hard, 1):
                Ks //= 2
            # Periodic CALIBRATION dispatch: every Nth spec-eligible
            # window runs the plain path instead, so the plain-rate EMA
            # the throughput gate compares against stays live even when
            # speculation engages continuously.
            self._spec_dispatch_i += 1
            calibrate = self._spec_dispatch_i % self.SPEC_CALIBRATE_EVERY == 0
            if not calibrate and (spec_k + 1) * Ks <= max(hard, 1):
                mr = self.model_runner
                opportunities = extra_eff = 0
                t_spec = perf_counter()
                for cols, cnts, drafted in mr.run_spec_multi(seqs, Ks):
                    live = [0] * len(seqs)
                    for j in range(max(cnts)):
                        active, toks = [], []
                        for i, (s, c, n) in enumerate(
                            zip(seqs, cols, cnts)
                        ):
                            if not s.is_finished and j < n:
                                active.append(s)
                                toks.append(c[j])
                                live[i] += 1
                        if not active:
                            break
                        self.scheduler.postprocess(active, toks)
                        self._check_stop_strings(active)
                        appended += len(active)
                    # Gate accounting: every live sequence in this
                    # iteration is one OPPORTUNITY (it paid the
                    # (k+1)-row verify cost regardless of drafting);
                    # tokens beyond its 1-per-iteration floor are the
                    # return. Overshoot iterations past finished
                    # sequences count neither.
                    for n_app in live:
                        if n_app > 0:
                            opportunities += 1
                            extra_eff += n_app - 1
                self.model_runner.total_decode_tokens += appended
                self._spec_rate = self._ema_rate(
                    self._spec_rate, appended, perf_counter() - t_spec
                )
                self._spec_gate_update(opportunities, extra_eff)
                K = 0  # handled
        elif (
            spec_common
            and not self.config.speculative_fused
            and all(
                # plain greedy only: verification compares against the
                # UNfiltered argmax. top-k/top-p/min-p are inert under
                # argmax; typical_p and avoid_top_k change the greedy
                # token and must not speculate.
                s.sampling_params.temperature == 0.0
                and s.sampling_params.typical_p >= 1.0
                and s.sampling_params.avoid_top_k == 0
                for s in seqs
            )
        ):
            from minivllm_tpu.engine.spec import propose_ngram

            # Drafted positions must stay inside the scheduler-reserved
            # lookahead window AND the model length (block tables cover
            # max_model_len; the verify rows write KV at L-1 .. L-1+dl).
            lim = self.config.decode_multi_step - 1
            drafts = [
                propose_ngram(
                    s.token_ids,
                    self.config.speculative_ngram,
                    min(
                        spec_k, lim,
                        self.config.max_model_len - len(s),
                        s.sampling_params.max_tokens
                        - s.num_completion_tokens,
                    ),
                )
                for s in seqs
            ]
            if any(drafts):
                cols = self.model_runner.run_verify(seqs, drafts)
                # Opportunity = a sequence that was verified this pass
                # (same semantics as the fused gate: extra tokens per
                # sequence-verify).
                self._spec_gate_update(
                    sum(1 for d in drafts if d),
                    sum(len(c) - 1 for c in cols),
                )
                for j in range(max(len(c) for c in cols)):
                    active = [
                        s
                        for s, c in zip(seqs, cols)
                        if not s.is_finished and j < len(c)
                    ]
                    toks = [
                        c[j]
                        for s, c in zip(seqs, cols)
                        if not s.is_finished and j < len(c)
                    ]
                    if not active:
                        break
                    self.scheduler.postprocess(active, toks)
                    self._check_stop_strings(active)
                    appended += len(active)
                self.model_runner.total_decode_tokens += appended
                K = 0  # handled; skip the window and single-step paths
        if K > 1:
            t_plain = perf_counter()
            for step_toks in self.model_runner.run_multi(seqs, K):
                active, toks = [], []
                for s, t in zip(seqs, step_toks):
                    if not s.is_finished:
                        active.append(s)
                        toks.append(t)
                if not active:
                    break
                self.scheduler.postprocess(active, toks)
                self._check_stop_strings(active)
                appended += len(active)
            self.model_runner.total_decode_tokens += appended
            if self.config.speculative_num_tokens > 0:
                self._plain_rate = self._ema_rate(
                    self._plain_rate, appended, perf_counter() - t_plain
                )
        elif K == 1:  # K == 0: the speculative branch already appended
            token_ids = self.model_runner.run(seqs, is_prefill)
            self.scheduler.postprocess(
                seqs, token_ids, self.model_runner.last_logprobs
            )
            self._check_stop_strings(seqs)
            appended = len(seqs)
        now = perf_counter()
        if is_prefill:
            n = chunk_tokens
            for seq in completing:
                if seq.arrival_time is not None:
                    self.metrics.record_ttft(now - seq.arrival_time)
                    seq.arrival_time = None  # only the first token counts
        else:
            n = appended
        # A fused cached-prefill window is decode-shaped work: every
        # appended token (prompt's last + K-1 completions) is decode-rate.
        self.metrics.record(
            "decode" if (fused_cached or not is_prefill) else "prefill",
            appended if fused_cached else n,
            now - t0,
        )
        outputs = [
            (
                seq.seq_id,
                seq.completion_token_ids,
                seq.logprobs if seq.sampling_params.logprobs is not None else None,
                seq.prompt_logprobs
                if seq.sampling_params.prompt_logprobs is not None
                else None,
                # Finish info: (finish_reason, stop_reason, stop-truncated
                # text or None). token_ids may extend past a stop-string
                # match within the same fused window; callers rendering
                # text prefer the truncated form.
                (seq.finish_reason, seq.stop_reason, seq.output_text),
            )
            for seq in seqs
            if seq.is_finished
        ]
        num_tokens = -appended if (fused_cached or not is_prefill) else chunk_tokens
        return outputs, num_tokens

    def is_finished(self) -> bool:
        return self.scheduler.is_finished()

    # -- checkpoint / resume ---------------------------------------------------
    #
    # Beyond the reference, which has no engine-state persistence
    # (SURVEY.md §5 "Checkpoint / resume: none"). Only host-side request
    # state is saved: prompts, generated-so-far tokens, sampling params.
    # On load the sequences re-enter the waiting queue and their KV is
    # rebuilt by ordinary (chunked, prefix-cache-assisted) prefill — the
    # same recompute path preemption uses, so no device state crosses the
    # checkpoint. Greedy requests resume bit-identically; sampled requests
    # resume as fresh valid draws (the PRNG step counter restarts).

    def save_state(self, path: str) -> int:
        """Snapshot all unfinished requests to `path` (atomic JSON write).
        Returns the number of requests saved."""
        import dataclasses
        import json
        import os
        import tempfile

        requests = [
            {
                "prompt_token_ids": seq.prompt_token_ids,
                "completion_token_ids": seq.completion_token_ids,
                "sampling_params": dataclasses.asdict(seq.sampling_params),
                "logprobs": seq.logprobs,
                "prompt_logprobs": seq.prompt_logprobs,
                "mirostat_mu": seq.mirostat_mu,
            }
            for seq in self.scheduler.unfinished()
        ]
        state = {"version": 1, "model": self.config.model, "requests": requests}
        out_dir = os.path.dirname(os.path.abspath(path)) or "."
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f)
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
        return len(requests)

    def load_state(self, path: str) -> list[int]:
        """Re-enqueue requests saved by save_state. Generated-so-far tokens
        keep their completion accounting (max_tokens / penalties / EOS), so
        generation continues where the checkpoint left off. Returns the new
        seq ids in saved order."""
        import json

        with open(path) as f:
            state = json.load(f)
        if state.get("version") != 1:
            raise ValueError(f"unsupported engine state version {state.get('version')}")
        if state.get("model") != self.config.model:
            raise ValueError(
                f"engine state was saved for model {state.get('model')!r}, "
                f"this engine serves {self.config.model!r}"
            )
        seq_ids = []
        for req in state["requests"]:
            sp = SamplingParams(**req["sampling_params"])
            seq = Sequence(
                req["prompt_token_ids"], sp,
                block_size=self.config.kvcache_block_size,
            )
            for tok in req["completion_token_ids"]:
                seq.append_token(tok)
            # Restore pre-checkpoint logprob entries (JSON round-trips the
            # int token keys of "top" as strings).
            seq.logprobs = [
                {
                    "token_id": e["token_id"],
                    "logprob": e["logprob"],
                    "top": {int(t): lp for t, lp in e["top"].items()},
                }
                for e in req.get("logprobs", [])
            ]
            # Saved prompt entries are NOT restored onto the sequence: the
            # resume prefill recomputes every prompt position (the prefix
            # cache is disabled for prompt-logprob requests) and would
            # otherwise append duplicates.
            seq.mirostat_mu = req.get("mirostat_mu")
            seq.arrival_time = perf_counter()
            self.scheduler.add(seq)
            seq_ids.append(seq.seq_id)
        return seq_ids

    def warmup(
        self,
        prompt_len: int | None = None,
        batch_sizes: list[int] | None = None,
        max_tokens: list[int] | None = None,
        sampled: bool = True,
        prefill_buckets: bool = True,
        aux_variants: bool = True,
    ) -> int:
        """Precompile the serving working set at boot (reference analog:
        device-graph capture for EVERY decode batch size at init,
        inference_executor.py:823-920 — no runtime capture ever).

        Coverage (a first compile through the relay is a 10-60 s
        mid-traffic stall; the persistent compile cache makes warmup a
        once-per-binary cost):
        - every decode batch bucket x BOTH block-table width classes
          (model_runner._width_class collapses widths to two) x every
          power-of-two fused window + single-step, greedy and filtered;
        - (prefill_buckets) every prefill token bucket boundary and the
          chunked-prefill chain via a prompt-length sweep;
        - (aux_variants) the logprob / penalty / prompt-logprob program
          variants, incl. combinations (logprobs ride a FIXED top-20
          program; penalty histories quantize to two length classes),
          plus typical_p / seeded / mirostat at the single-step and
          dominant-window paths.

        Prefix caching is suspended for the dummy prompts, so warmup
        neither pollutes the block hash table nor short-circuits its own
        prefill shapes. typical_p / seeded variants warm at EVERY fused
        window (any window can occur — it follows a request's remaining
        tokens), and shared-prefix grouped-decode programs warm via
        n-forked generations covering the collapsed group-shape classes
        (model_runner._detect_groups quantizes G/Gmax/Wg to <= 2 classes
        each, making that space finite). Returns the number of
        generations."""
        import dataclasses

        import numpy as np

        if not self.is_finished():
            raise RuntimeError("warmup requires an idle engine")
        cfg = self.config
        if batch_sizes is None:
            batch_sizes = [
                b for b in cfg.decode_seq_buckets if b <= cfg.max_num_seqs
            ]
        if max_tokens is None:
            # mt = w+1: after the prefill's first token, w remain -> the
            # fused window is exactly w; cover every power-of-two window
            # up to decode_multi_step (a request's window follows its
            # REMAINING tokens, so any of them can occur). mt=2 warms
            # single-step decode.
            max_tokens = {2}
            w = 2
            while w <= cfg.decode_multi_step:
                max_tokens.add(w + 1)
                w *= 2
            max_tokens = sorted(max_tokens)
        mt_max = max(max_tokens)
        bs = cfg.kvcache_block_size
        if prompt_len is None:
            prompt_len = max(16, min(cfg.max_model_len // 4, 256))
        prompt_len = min(prompt_len, cfg.max_model_len - mt_max - 1)
        # One representative prompt length per decode table-width class
        # (model_runner._width_class: {2, 8, cap}); entries exist only
        # where the model length reaches the class.
        width_lens = [max(1, min(prompt_len, 2 * bs - mt_max - 1))]
        for L in (4 * bs, 8 * bs + 1):
            if L + mt_max + 1 <= cfg.max_model_len and L not in width_lens:
                width_lens.append(L)
        variants = [SamplingParams(temperature=0.0, ignore_eos=True)]
        if sampled:
            variants.append(
                SamplingParams(temperature=0.8, top_p=0.95, ignore_eos=True)
            )
        # Aux program variants (single-step path; lp/pen/mirostat gate
        # the fused window off). FLAG combinations are distinct
        # programs: (with_filters, logprobs, penalties-hist, typical,
        # seeded, mirostat) — warm the reachable pairings users hit.
        aux: list[SamplingParams] = []
        aux_win: list[SamplingParams] = []
        if aux_variants:
            aux = [
                SamplingParams(temperature=0.0, ignore_eos=True, logprobs=0),
                SamplingParams(
                    temperature=0.8, top_p=0.95, ignore_eos=True, logprobs=0
                ),
                SamplingParams(
                    temperature=0.8, top_p=0.95, ignore_eos=True,
                    repetition_penalty=1.05,
                ),
                SamplingParams(
                    temperature=0.8, top_p=0.95, ignore_eos=True,
                    repetition_penalty=1.05, logprobs=0,
                ),
                SamplingParams(
                    temperature=0.0, ignore_eos=True, prompt_logprobs=0
                ),
                SamplingParams(
                    temperature=0.8, top_p=0.95, ignore_eos=True,
                    logprobs=0, prompt_logprobs=0,
                ),
                SamplingParams(
                    temperature=0.8, ignore_eos=True, mirostat=2
                ),
                # top_k > 64 selects the WIDE candidate pool programs
                # (sampling/ops.candidate_pool).
                SamplingParams(
                    temperature=0.8, top_k=128, ignore_eos=True
                ),
                SamplingParams(
                    temperature=0.8, ignore_eos=True, logit_bias={1: -5.0}
                ),
            ]
            # typical_p / seeded DO use fused windows: warm their
            # single-step and dominant-window programs (other windows
            # occur only near completion and stay lazy).
            aux_win = [
                SamplingParams(
                    temperature=0.8, typical_p=0.9, ignore_eos=True
                ),
                SamplingParams(temperature=0.8, seed=7, ignore_eos=True),
                # typical AND seeded combine into a third program.
                SamplingParams(
                    temperature=0.8, typical_p=0.9, seed=7, ignore_eos=True
                ),
            ]
        vocab = int(getattr(cfg.hf_config, "vocab_size", 1000))
        rng = np.random.default_rng(0)
        saved = self.scheduler.block_manager.enable_prefix_caching
        self.scheduler.block_manager.enable_prefix_caching = False
        runs = 0

        def fits(S: int, L: int, mt: int) -> bool:
            need = S * (-(-(L + mt + 1) // bs))
            return need <= int(0.9 * cfg.num_kvcache_blocks)

        def gen(S: int, L: int, sp: SamplingParams, mt: int) -> None:
            nonlocal runs
            if L + mt + 1 > cfg.max_model_len or not fits(S, L, mt):
                return
            prompts = [
                [int(t) for t in rng.integers(1, vocab, L)]
                for _ in range(S)
            ]
            self._warmup_generate(
                prompts, dataclasses.replace(sp, max_tokens=mt)
            )
            runs += 1

        mr = self.model_runner
        groups_on = (
            cfg.shared_prefix_decode
            and mr.attn_backend is not None
            and mr.attn_backend.name == "pallas"
            and getattr(cfg.hf_config, "sliding_window", None) is None
            and getattr(mr, "_pp", 1) == 1
        )

        def gen_forked(
            n_groups: int, members: int, L: int, sp: SamplingParams, mt: int
        ) -> None:
            """One n-forked generation that forms real shared-prefix
            decode groups (COW block sharing), warming a grouped-decode
            program class. Skipped when the savings gate would reject
            the grouping (the generation would warm nothing new)."""
            nonlocal runs
            depth = L // bs  # full shared prompt blocks per group
            saved = n_groups * (members - 1) * depth * bs
            if (
                depth < 1
                or saved < mr.SHARED_PREFIX_MIN_SAVED_TOKENS
                or L + mt + 1 > cfg.max_model_len
                or not fits(n_groups * members, L, mt)
            ):
                return
            prompts = [
                [int(t) for t in rng.integers(1, vocab, L)]
                for _ in range(n_groups)
            ]
            self._warmup_generate(
                prompts, dataclasses.replace(sp, max_tokens=mt, n=members)
            )
            runs += 1

        try:
            for S in batch_sizes:
                for L in width_lens:
                    for mt in max_tokens:
                        # typical/seeded ride fused windows like the
                        # plain variants: warm them at EVERY window (a
                        # request near completion shrinks its window, so
                        # all of them occur in a mixed session).
                        for sp in variants + aux_win:
                            gen(S, L, sp, mt)
                    for sp in aux:
                        gen(S, L, sp, 2)
                if groups_on:
                    # Grouped-decode programs at this batch bucket: the
                    # collapsed shape classes (_detect_groups) are
                    # (Gmax {4, cap}) x (G {4, cap}) x (Wg {8, cap}),
                    # reached via many-small-groups (n=2) and
                    # one-max-group forks at each width-class length
                    # (Wg tracks the shared depth, so the width sweep
                    # covers Wg 8; the >8-block length reaches Wg cap).
                    glens = [
                        max(L, bs + 1) for L in width_lens
                    ]
                    wg_cap_len = 10 * bs + 1
                    if wg_cap_len + mt_max + 1 <= cfg.max_model_len:
                        glens.append(wg_cap_len)
                    cap_members = min(mr.SHARED_PREFIX_MAX_GROUP, S)
                    for L in dict.fromkeys(glens):
                        for n_groups, members in (
                            (max(1, S // 2), 2),
                            (1, cap_members),
                        ):
                            if members < 2:
                                continue
                            for sp in variants:
                                gen_forked(n_groups, members, L, sp, 2)
                                if mt_max > 2:
                                    gen_forked(
                                        n_groups, members, L, sp, mt_max
                                    )
            if prefill_buckets:
                # Prefill programs key on the packed TOKEN bucket (and
                # chunk structure) CROSSED with every variant flag
                # (logprobs/penalties/prompt-logprobs/typical/seeded/
                # mirostat each select a distinct prefill program), so
                # the length sweep covers all of them. Decode
                # (window x width) programs are fully covered by the
                # batch loop above, so mt stays at the smallest window.
                for L in self._warmup_prefill_lens():
                    for sp in variants + aux + aux_win:
                        gen(1, L, sp, 2)
        finally:
            self.scheduler.block_manager.enable_prefix_caching = saved
        logger.info(
            "warmup: %d generations over %d batch buckets", runs,
            len(batch_sizes),
        )
        return runs

    def _warmup_generate(self, prompts, params) -> None:
        """One warmup generation with device-OOM resilience (reference
        analog: the OOM catch-and-retry in attention_backend.py:596-614).
        The KV-cache budget holds back a workspace margin that is an
        ESTIMATE; if a bucket program's compile workspace exceeds it on
        a new model/chip, shrink the cache 12.5% and retry — warmup is
        the safe point (every program compiles here, and the dummy
        sequences can be aborted so no live block table survives the
        reallocation)."""
        from minivllm_tpu.engine.scheduler import Scheduler

        for attempt in range(4):
            try:
                self.generate(prompts, params, use_tqdm=False)
                return
            except Exception as e:  # jaxlib XlaRuntimeError
                from minivllm_tpu.engine.model_runner import is_device_oom

                if not is_device_oom(e) or attempt == 3:
                    raise
                for s in list(self.scheduler.unfinished()):
                    self.scheduler.abort(s)
                nb = self.model_runner.shrink_kv_cache()
                # Fresh scheduler/block manager over the new block count
                # (block ids shifted meaning; prefix cache drops — the
                # engine is idle at warmup, nothing references blocks).
                self.scheduler = Scheduler(self.config)
                self.scheduler.block_manager.enable_prefix_caching = False
                logger.warning(
                    "warmup OOM (attempt %d); KV cache shrunk to %d blocks",
                    attempt + 1, nb,
                )

    def _warmup_prefill_lens(self) -> list[int]:
        """Prompt lengths whose programs cover every (prefill token
        bucket, block-table-width class) a fresh request can hit: each
        bucket's shortest and longest prompt, a length on each side of
        every power-of-two BLOCK count (the decode step pads the block
        table to W = next_pow2(blocks), so W classes — not buckets —
        set the decode shapes), plus one max-length prompt to warm the
        chunked-prefill chain for prompts beyond the batch budget."""
        cfg = self.config
        bs = cfg.kvcache_block_size
        limit = cfg.max_model_len - 3
        # 1 also warms the fused-cached prefill shortcut (single-token
        # prompts take it, skipping the plain decode path); 2 is the
        # shortest prompt that exercises plain prefill + decode.
        lens: set[int] = {1, 2, limit}
        prev = 0
        for T in cfg.prefill_token_buckets:
            if prev + 1 > limit:
                break
            lens.add(prev + 1)
            lens.add(min(T, limit))
            prev = T
        c = 1
        while (c - 1) * bs + 1 <= limit:
            lens.add((c - 1) * bs + 1)   # last length of the W=c class
            if c * bs + 1 <= limit:
                lens.add(c * bs + 1)     # first length of the next class
            c *= 2
        # Prompts beyond the batch budget prefill in budget-sized chunks
        # plus a tail chunk: the tail's token bucket and the (larger)
        # packed-context bucket form shapes no single-chunk length hits,
        # so repeat the tail representatives at every chunk base (for a
        # power-of-two budget each base spans one context class).
        budget = cfg.max_num_batched_tokens
        tails = {1, 2}
        prev = 0
        for T in cfg.prefill_token_buckets:
            if T > budget:
                break
            tails.update((prev + 1, T))
            prev = T
        base = budget
        while base < limit:
            lens.update(base + t for t in tails if base + t <= limit)
            base += budget
        return sorted(L for L in lens if L >= 1)

    def get_stats(self) -> dict:
        """Serving statistics: timing percentiles, throughput, prefix-cache
        hit rate, speculative-pipeline hits, preemptions."""
        bm = self.scheduler.block_manager
        stats = {
            **self.metrics.summary(),
            "prefix_cache_hit_rate": bm.prefix_cache_hit_rate,
            "prefix_cache_hits": bm.stats["prefix_cache_hits"],
            "num_free_blocks": bm.num_free_blocks,
            "num_preemptions": self.scheduler.num_preemptions,
            "num_oom_recoveries": self.num_oom_recoveries,
            "total_prefill_tokens": self.model_runner.total_prefill_tokens,
            "total_decode_tokens": self.model_runner.total_decode_tokens,
            "spec_pipeline_hits": self.model_runner.spec_hits,
            "shared_prefix_steps": self.model_runner.shared_prefix_steps,
            "ngram_spec_steps": self.model_runner.ngram_steps,
            "ngram_spec_drafted": self.model_runner.ngram_drafted,
            "ngram_spec_accepted": self.model_runner.ngram_accepted,
        }
        return stats

    def abort_request(self, seq_id: int) -> bool:
        """Cancel an in-flight request: frees its KV blocks and removes it
        from the scheduler. Returns False if the id is unknown/finished.
        O(1) lookup via the scheduler's live-id map (the disconnect poll
        calls this once per dead client)."""
        seq = self.scheduler.get(seq_id)
        if seq is None:
            return False
        self.scheduler.abort(seq)
        return True

    def stream(
        self,
        prompt: str | list[int],
        sampling_params: SamplingParams | None = None,
    ):
        """Yield completion token-id chunks for one request as engine steps
        produce them (library-level streaming; beyond the reference, which
        only returns finished completions). Drives the engine loop itself —
        for concurrent streaming across requests use the HTTP server's
        AsyncEngine, which owns the loop in a thread. Closing the generator
        early aborts the request (its blocks are freed).

        n == 1 yields plain token-id chunks (lists). n > 1 yields
        (sibling_index, chunk) pairs multiplexed across the n KV-forked
        siblings, with a terminal (sibling_index, None) as each sibling
        finishes — the same surface the HTTP server's stream_many
        exposes, so library and server callers see one n>1 shape.
        best_of > n cannot stream (ranking needs completed outputs)."""
        sp = sampling_params if sampling_params is not None else SamplingParams()
        if (sp.best_of or sp.n) > sp.n:
            raise ValueError(
                "best_of > n cannot stream (ranking needs completed outputs)"
            )
        primary_id = self.add_request(prompt, sampling_params)
        ids = self.pop_family(primary_id)
        self._family_keep.pop(primary_id, None)
        wanted = set(ids)
        by_id = {
            s.seq_id: s for s in self.scheduler.waiting if s.seq_id in wanted
        }
        seqs = [by_id[i] for i in ids]
        multiplexed = len(seqs) > 1
        emitted = [0] * len(seqs)
        done = [False] * len(seqs)
        try:
            while not all(done):
                self.step()
                for i, seq in enumerate(seqs):
                    if done[i]:
                        continue
                    new = seq.completion_token_ids[emitted[i]:]
                    if new:
                        emitted[i] += len(new)
                        yield (i, new) if multiplexed else new
                    if seq.is_finished:
                        done[i] = True
                        if multiplexed:
                            yield i, None
        finally:
            for seq in seqs:
                if not seq.is_finished:
                    self.abort_request(seq.seq_id)

    def generate(
        self,
        prompts: list[str] | list[list[int]],
        sampling_params: SamplingParams | list[SamplingParams] | None = None,
        use_tqdm: bool = True,
    ) -> list[dict[str, Any]]:
        """Generate completions. Returns [{"text": ..., "token_ids": [...]}]
        in prompt order (reference: llm_engine.py:261-367). For n > 1 the
        per-prompt dict additionally carries "completions": a list of n
        {"text", "token_ids", "finish_reason", ...} dicts (the top-level
        text/token_ids mirror the first sibling)."""
        pbar = None
        if use_tqdm:
            from tqdm.auto import tqdm

            pbar = tqdm(total=len(prompts), desc="Generating", dynamic_ncols=True)
        if sampling_params is None:
            sp_list = [SamplingParams() for _ in prompts]
        elif not isinstance(sampling_params, list):
            sp_list = [sampling_params] * len(prompts)
        else:
            if len(sampling_params) != len(prompts):
                raise ValueError("sampling_params list must match prompts length")
            sp_list = sampling_params

        id_order: list[int] = []
        fam_map: dict[int, list[int]] = {}
        keep_map: dict[int, tuple[int, bool]] = {}
        for prompt, sp in zip(prompts, sp_list):
            pid = self.add_request(prompt, sp)
            id_order.append(pid)
            fam_map[pid] = self.pop_family(pid)
            if pid in self._family_keep:
                keep_map[pid] = self._family_keep.pop(pid)
        if pbar is not None:
            pbar.total = sum(len(f) for f in fam_map.values())
            pbar.refresh()

        outputs: dict[int, list[int]] = {}
        logprob_map: dict[int, list | None] = {}
        plp_map: dict[int, list | None] = {}
        fin_map: dict[int, tuple] = {}
        prefill_tp = decode_tp = 0.0
        while not self.is_finished():
            t = perf_counter()
            finished, num_tokens = self.step()
            if pbar is not None:
                el = perf_counter() - t
                if num_tokens > 0:
                    prefill_tp = num_tokens / el
                else:
                    decode_tp = -num_tokens / el
                pbar.set_postfix(
                    {
                        "Prefill": f"{int(prefill_tp)} tok/s",
                        "Decode": f"{int(decode_tp)} tok/s",
                    }
                )
            for seq_id, token_ids, logprobs, prompt_logprobs, fin in finished:
                outputs[seq_id] = token_ids
                logprob_map[seq_id] = logprobs
                plp_map[seq_id] = prompt_logprobs
                fin_map[seq_id] = fin
                if pbar is not None:
                    pbar.update(1)
        if pbar is not None:
            pbar.close()

        all_ids = [sid for pid in id_order for sid in fam_map[pid]]
        if self.tokenizer is not None:
            texts = self.tokenizer.batch_decode(
                [outputs[sid] for sid in all_ids],
                skip_special_tokens=True, clean_up_tokenization_spaces=True,
            )
            text_map = dict(zip(all_ids, texts))
        else:
            text_map = {sid: "" for sid in all_ids}

        def completion(sid: int) -> dict[str, Any]:
            reason, stop_reason, stop_text = fin_map.get(
                sid, (None, None, None)
            )
            out: dict[str, Any] = {
                # A stop-string finish carries the exactly-truncated text
                # (token ids may extend past the match within the window).
                "text": stop_text if stop_text is not None else text_map[sid],
                "token_ids": outputs[sid],
                "finish_reason": reason,
            }
            if stop_reason is not None:
                out["stop_reason"] = stop_reason
            lp = logprob_map.get(sid)
            if lp is not None:
                out["logprobs"] = lp
            plp = plp_map.get(sid)
            if plp is not None:
                out["prompt_logprobs"] = plp
            return out

        results = []
        for pid in id_order:
            sibs = fam_map[pid]
            if pid in keep_map:
                # best_of: rank ALL siblings by cumulative logprob and
                # keep the top n (best first, OpenAI semantics).
                keep_n, forced = keep_map[pid]
                ranked = sorted(
                    sibs,
                    key=lambda sid: sum(
                        e["logprob"] for e in (logprob_map.get(sid) or [])
                    ),
                    reverse=True,
                )
                sibs = ranked[:keep_n]
                if forced:  # caller never asked for logprobs
                    for sid in sibs:
                        logprob_map[sid] = None
            out = completion(sibs[0])
            if len(sibs) > 1 or pid in keep_map:
                out["completions"] = [completion(sid) for sid in sibs]
            results.append(out)
        return results

"""Measured decode STEP-TIME budget at serving scale.

Splits the end-to-end decode step (the product number) into measured
components so the per-step cost is attributed, not estimated — the
round-3 gap: kernels were benchmarked to the GB/s but ~10 ms/step of
the serving p50 was unexplained (VERDICT r3 #1).

Method (all adjacent on-chip runs, median-of-N with per-call fetches —
the relay lies to block_until_ready):
1. K-sweep: time `model_runner.run_multi(seqs, K)` (one fused-window
   dispatch, includes the host fetch) for K in 1..16 at the serving
   batch. A linear fit over K gives
       per-dispatch intercept b (relay + dispatch + H2D + D2H + host)
       per-iteration slope a (model pass + sampler on device)
2. Standalone component measurements at the same shapes:
   - empty-dispatch relay floor (tiny jit, fetch per call)
   - sampler (sample_tokens at (S_pad, V))
   - LM head matmul ((S, H) x (H, V) bf16)
   - metadata H2D (packed + tables transfer, fenced by a tiny fetch)
   - host engine loop (scheduler.schedule + postprocess with a stubbed
     runner — pure host cost per step)
   - weight-stream floor = param bytes / HBM BW (analytic bound)
3. Prints ONE JSON line with the table; components must sum to ~the
   measured step (document residual).

Run: python bench_stepbudget.py [--num-seqs 64] [--model qwen3-0.6b]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

HBM_GBS = 820.0  # v5e HBM roofline


def median_time(fn, iters=9, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="qwen3-0.6b")  # or "tiny" (CPU smoke)
    p.add_argument("--num-seqs", type=int, default=64)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument(
        "--max-model-len", type=int, default=0,
        help="0 = auto: prompt + enough decode budget for the full "
        "K-sweep (warm + iters passes) so no sequence finishes mid-sweep",
    )
    p.add_argument("--quant", choices=["int8", "fp8", "w8a8"], default=None)
    p.add_argument("--kv-dtype", default="auto")
    p.add_argument("--blocks", type=int, default=-1,
                   help="KV blocks (-1 = auto-size; set explicitly to "
                   "leave HBM headroom for the standalone probes)")
    p.add_argument("--iters", type=int, default=7)
    p.add_argument(
        "--max-window", type=int, default=64,
        help="largest fused window in the K-sweep; bigger windows divide "
        "the per-dispatch relay jitter out of the slope (jitter/K per "
        "iteration) — the round-4 sweep capped at 16 and its 0.6b/64 "
        "slope carried a ~2x jitter inflation (docs/performance.md)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench_serving import MODELS
    from transformers import AutoConfig

    from minivllm_tpu import Config, SamplingParams
    from minivllm_tpu.llm import LLM
    from minivllm_tpu.utils.testing import TINY_CONFIGS

    zoo = {**MODELS, "tiny": TINY_CONFIGS["qwen3"]}  # tiny: CPU smoke test
    tmp = Path(tempfile.mkdtemp(prefix="stepbudget-"))
    (tmp / "config.json").write_text(json.dumps(zoo[args.model]))
    sweep_ks = [
        k for k in (2, 4, 8, 16, 32, 64) if k <= max(16, args.max_window)
    ]
    if args.max_model_len == 0:
        # Warm pass + absolute-window pass + iters x pair passes, plus
        # slack — the round-5 regression: a 64-window sweep finished
        # its sequences mid-measurement at the old fixed 768 budget.
        big = max(sweep_ks) // 2
        pair_cost = sum(3 * k for k in (big, big // 2, big // 4) if k >= 2)
        need = 2 * sum(sweep_ks) + args.iters * pair_cost
        # 1.5x margin: engine-side extras (init warmup, scheduling
        # boundaries) consume beyond the modeled sweep, and a sequence
        # finishing mid-sweep aborts the measurement.
        args.max_model_len = args.prompt_len + need + need // 2 + 192
    config = Config(
        model=str(tmp),
        hf_config=AutoConfig.from_pretrained(tmp),
        max_num_seqs=args.num_seqs,
        max_model_len=args.max_model_len,
        max_num_batched_tokens=4096,
        kvcache_block_size=64,
        num_kvcache_blocks=args.blocks,
        dtype="bfloat16",
        kvcache_dtype=args.kv_dtype,
        quantization=args.quant,
        decode_multi_step=max(16, args.max_window),
    )
    t0 = time.perf_counter()
    llm = LLM(config, init_random=True)
    print(f"engine up in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    mr = llm.model_runner

    S = args.num_seqs
    rng = np.random.default_rng(0)
    vocab = mr.model.vocab_size
    prompts = [
        list(rng.integers(1, vocab, size=args.prompt_len)) for _ in range(S)
    ]
    sp = SamplingParams(
        temperature=0.7, top_p=0.95,
        max_tokens=args.max_model_len - args.prompt_len - 32,
        ignore_eos=True,
    )
    # Enqueue + prefill all S sequences, then drive decode manually.
    for pr in prompts:
        llm.add_request(pr, sp)
    while True:
        seqs, is_prefill = llm.scheduler.schedule()
        if not is_prefill:
            break
        toks = mr.run(seqs, True)
        llm.scheduler.postprocess(seqs, toks)
    # `seqs` is now the full decode batch with lookahead reserved.

    def window(seqs, K):
        for cols in mr.run_multi(seqs, K):
            llm.scheduler.postprocess(seqs, cols)

    # Warm every window program first (and advance past initial jitter).
    # K=1 routes to the single-step program (different output shape), so
    # the sweep starts at 2 — the fit extrapolates the intercept.
    KS = tuple(sweep_ks)
    for K in KS:
        window(seqs, K)

    def step_again(K):
        seqs2, is_pf = llm.scheduler.schedule()
        assert not is_pf
        t0 = time.perf_counter()
        window(seqs2, K)
        return time.perf_counter() - t0

    ksweep = {K: step_again(K) for K in KS}  # absolute-window table

    # Slope protocol (round 5): measure (K, 2K) BACK-TO-BACK and take
    # (t(2K) - t(K)) / K, repeated, median over everything. Rationale:
    # a sequential K-sweep confounds the slope twice — the relay drifts
    # over the minutes the sweep takes, and the batch's CONTEXT grows
    # hundreds of tokens between the small-K and large-K measurements
    # (attention and table widths grow with it; the first 64-window
    # sweep read 7.7 ms/iter at its start and 16.2 at its end). An
    # adjacent pair shares relay conditions and differs by only K
    # tokens of context, and the largest K divides the per-dispatch
    # jitter down the most.
    big = KS[-1] // 2
    pair_ks = [k for k in (big, big // 2, big // 4) if k >= 2]
    pair_slopes = []
    for _ in range(args.iters):
        for K in pair_ks:
            t1 = step_again(K)
            t2 = step_again(2 * K)
            pair_slopes.append((t2 - t1) / K)
    a_med = float(sorted(pair_slopes)[len(pair_slopes) // 2])
    ks = np.array(sorted(ksweep), dtype=np.float64)
    ys = np.array([ksweep[int(k)] for k in ks])
    a, b = np.polyfit(ks, ys, 1)

    # -- standalone components -------------------------------------------
    dev = jax.devices()[0]

    # Relay floor: trivial dispatch + result fetch.
    tiny = jax.jit(lambda x: x + 1)
    xs = jnp.zeros((8,), jnp.int32)
    np.asarray(tiny(xs))
    relay_floor = median_time(lambda: np.asarray(tiny(xs)), iters=15)

    # Sampler at serving shape.
    from minivllm_tpu.sampling.ops import (
        candidate_pool,
        make_state,
        sample_tokens,
    )

    S_pad = len(np.asarray(mr._prepare_decode(seqs)[0])[0])
    state = make_state([sp] * S, S_pad)
    pool = candidate_pool([sp])
    logits = jnp.asarray(
        rng.standard_normal((S_pad, vocab)).astype(np.float32)
    )
    positions = jnp.full((S_pad,), args.prompt_len + 8, jnp.int32)
    key = jax.random.PRNGKey(0)
    samp = jax.jit(
        lambda lg, st, kk: sample_tokens(
            lg, st, kk, with_filters=True, typical_active=False,
            positions=positions, seeded=False, pool=pool,
        )
    )
    np.asarray(samp(logits, state, key))
    t_sampler = median_time(lambda: np.asarray(samp(logits, state, key)))

    # LM head (logits) matmul — reduce on device so the fetch is a
    # scalar (a (S, V) fetch through the relay would swamp the matmul).
    H = mr.model.hidden_size
    hjit = jax.jit(lambda x, w: (x @ w).astype(jnp.float32).sum())
    xh = jnp.asarray(rng.standard_normal((S_pad, H)).astype(np.float32),
                     jnp.bfloat16)
    wv = jnp.asarray(
        rng.standard_normal((H, vocab)).astype(np.float32), jnp.bfloat16
    )
    np.asarray(hjit(xh, wv))
    t_lmhead = median_time(lambda: np.asarray(hjit(xh, wv)))

    # Metadata H2D: packed (4, S_pad) + tables (S_pad, W), fenced.
    packed, tables, _, _ = mr._prepare_decode(seqs)
    pk, tb = np.asarray(packed), np.asarray(tables)
    fence = jax.jit(lambda a_, b_: a_[0, 0] + b_[0, 0])

    def h2d():
        da = jax.device_put(pk, dev)
        db = jax.device_put(tb, dev)
        np.asarray(fence(da, db))

    h2d()
    t_h2d = median_time(h2d)

    # Host engine loop: schedule + postprocess with a stubbed runner.
    K = 16
    canned = [[int(t) for t in rng.integers(1, vocab, S)] for _ in range(K)]

    def host_step():
        seqs2, is_pf = llm.scheduler.schedule()
        for cols in canned:
            llm.scheduler.postprocess(seqs2, cols[: len(seqs2)])

    t_host = median_time(host_step, iters=9)

    # Weight-stream analytic floor.
    param_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(mr.params)
    )
    t_weights = param_bytes / (HBM_GBS * 1e9)

    ms = lambda t: round(t * 1e3, 3)  # noqa: E731
    out = {
        "metric": f"{args.model}_decode_step_budget",
        "config": {
            "num_seqs": S, "prompt_len": args.prompt_len,
            "quant": args.quant, "kv_dtype": args.kv_dtype,
        },
        "measured_ms_per_window": {int(k): ms(v) for k, v in ksweep.items()},
        "fit_per_iteration_ms": ms(a),
        "median_pair_slope_ms": ms(a_med),
        "fit_per_dispatch_ms": ms(b),
        "sampler_pool": pool,
        "components_per_iteration_ms": {
            "weight_stream_floor": ms(t_weights),
            "sampler": ms(max(0.0, t_sampler - relay_floor)),
            "lm_head": ms(max(0.0, t_lmhead - relay_floor)),
        },
        "components_per_dispatch_ms": {
            "relay_floor": ms(relay_floor),
            "metadata_h2d": ms(max(0.0, t_h2d - relay_floor)),
            "host_schedule_postprocess": ms(t_host),
        },
        "param_bytes": param_bytes,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

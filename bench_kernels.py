"""Kernel microbenchmarks: Pallas paged flash-decode / varlen prefill
attention vs the HBM roofline.

Decode attention is bandwidth-bound: the kernel must stream each
sequence's KV blocks once, so its ceiling is (KV bytes) / (HBM GB/s).
This harness times the raw kernels at serving shapes and reports achieved
bytes/s and the roofline fraction (v5e HBM ~ 819 GB/s).

    python bench_kernels.py                 # decode sweep, bf16 cache
    python bench_kernels.py --kv-dtype int8

Relay note: the `iters` kernel calls are chained inside ONE jitted
program (each output feeds the next query — a true data dependency) and
a single scalar is fetched, so the per-dispatch relay round trip
amortizes away and the measured time is device time.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

V5E_HBM_GBS = 819.0


def _timed_floor_subtracted(run_chained, carry0, consts, iters):
    """Best-of-2 chained-scan time minus the empty-scan floor.

    The single result fetch costs a fixed ~25 ms relay round trip: at
    N iters that is +25ms/N per iteration — up to ~10% of a
    short-context attention kernel at 200 iters (docs/roadmap.md
    "Microbenchmark floors"). An empty-body scan with the same carry,
    iters, and fetch measures exactly that floor; subtracting it makes
    the short-context rows honest (same protocol as bench_gmm)."""
    import jax
    import numpy as np
    import time

    @jax.jit
    def empty(c, *consts):
        out, _ = jax.lax.scan(
            lambda c, _: (c + 1.0, None), c, None, length=iters
        )
        return out.reshape(-1)[:1]

    def best_of(fn, *args):
        np.asarray(fn(*args))  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    floor = best_of(empty, carry0, *consts)
    dt = best_of(run_chained, carry0, *consts)
    return max(dt - floor, 1e-9)


def bench_decode(S, ctx, kvh, h, d, bs, dtype_name, iters=200):
    import jax
    import jax.numpy as jnp

    from minivllm_tpu.ops.attention import (
        DecodeBatch,
        make_quantized_cache,
        store_kv,
    )
    from minivllm_tpu.ops.pallas import decode_attention as pdec

    quantized = dtype_name == "int8"
    dtype = jnp.bfloat16
    W = -(-ctx // bs)
    num_blocks = S * W
    slots_total = (num_blocks + 1) * bs
    if quantized:
        kc = make_quantized_cache(slots_total, kvh, d, bs)
        vc = make_quantized_cache(slots_total, kvh, d, bs)
    else:
        kc = jnp.zeros((slots_total, kvh, d), dtype)
        vc = jnp.zeros_like(kc)
    rng = np.random.default_rng(0)
    tables = np.arange(S * W, dtype=np.int32).reshape(S, W)
    # fill every sequence's context
    for s in range(S):
        slots = (tables[s][:, None] * bs + np.arange(bs)[None, :]).reshape(-1)[:ctx]
        k = jnp.asarray(rng.standard_normal((ctx, kvh, d)), dtype)
        v = jnp.asarray(rng.standard_normal((ctx, kvh, d)), dtype)
        kc, vc = store_kv(kc, vc, k, v, jnp.asarray(slots))
    q = jnp.asarray(rng.standard_normal((S, h, d)), dtype)
    meta = DecodeBatch(
        input_ids=jnp.zeros(S, jnp.int32),
        positions=jnp.full((S,), ctx - 1, jnp.int32),
        slot_mapping=jnp.zeros(S, jnp.int32),
        block_tables=jnp.asarray(tables),
        ctx_lens=jnp.full((S,), ctx, jnp.int32),
    )
    scale = d**-0.5

    # Chain `iters` kernel invocations inside ONE jitted program (each
    # output feeds the next query, a true data dependency) and fetch one
    # scalar — the per-dispatch relay round trip amortizes away and the
    # measured time is device time.
    @jax.jit
    def run_chained(q, kc, vc, meta):
        def body(q, _):
            o = pdec.decode_attention(q, kc, vc, meta, scale, bs)
            return o.astype(q.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out[0, 0, :1]

    dt = _timed_floor_subtracted(run_chained, q, (kc, vc, meta), iters)
    itemsize = 1 if quantized else 2
    kv_bytes = 2 * S * ctx * kvh * d * itemsize
    if quantized:
        from minivllm_tpu.ops.attention import scale_lanes

        # ONE K+V-packed scale slab per block (not one per cache)
        kv_bytes += S * W * kvh * scale_lanes(bs) * 4
    gbs = kv_bytes / dt / 1e9
    return {
        "kernel": "decode",
        "S": S, "ctx": ctx, "kvh": kvh, "h": h, "d": d,
        "kv_dtype": dtype_name,
        "ms": round(dt * 1e3, 3),
        "kv_gb_per_s": round(gbs, 1),
        "roofline_frac": round(gbs / V5E_HBM_GBS, 3),
    }


def bench_prefill(S, q_len, ctx, kvh, h, d, bs, iters=100):
    """Varlen prefill flash kernel: S sequences, q_len new tokens each,
    over ctx total context (prefix-cached tokens = ctx - q_len)."""
    import jax
    import jax.numpy as jnp

    from minivllm_tpu.ops.attention import PrefillBatch, store_kv
    from minivllm_tpu.ops.pallas import prefill_attention as ppre

    QT = ppre.Q_TILE
    dtype = jnp.bfloat16
    W = -(-ctx // bs)
    num_blocks = S * W
    slots_total = (num_blocks + 1) * bs
    kc = jnp.zeros((slots_total, kvh, d), dtype)
    vc = jnp.zeros_like(kc)
    rng = np.random.default_rng(0)
    tables = np.arange(S * W, dtype=np.int32).reshape(S, W)
    for s in range(S):
        slots = (tables[s][:, None] * bs + np.arange(bs)[None, :]).reshape(-1)[:ctx]
        k = jnp.asarray(rng.standard_normal((ctx, kvh, d)), dtype)
        v = jnp.asarray(rng.standard_normal((ctx, kvh, d)), dtype)
        kc, vc = store_kv(kc, vc, k, v, jnp.asarray(slots))
    per = -(-q_len // QT) * QT
    T = S * per
    q = jnp.asarray(rng.standard_normal((T, h, d)), dtype)
    q_start = np.arange(S, dtype=np.int32) * per
    meta = PrefillBatch(
        input_ids=jnp.zeros(T, jnp.int32),
        positions=jnp.zeros(T, jnp.int32),
        q_seg=jnp.zeros(T, jnp.int32),
        slot_mapping=jnp.zeros(T, jnp.int32),
        ctx_slot_mapping=jnp.zeros(1, jnp.int32),
        k_seg=jnp.zeros(1, jnp.int32),
        k_pos=jnp.zeros(1, jnp.int32),
        last_token_idx=jnp.zeros(S, jnp.int32),
        block_tables=jnp.asarray(tables),
        ctx_lens=jnp.full((S,), ctx, jnp.int32),
        q_start=jnp.asarray(q_start),
        q_lens=jnp.full((S,), q_len, jnp.int32),
    )
    scale = d ** -0.5

    @jax.jit
    def run_chained(q, kc, vc, meta):
        def body(q, _):
            o = ppre.prefill_attention(q, kc, vc, meta, scale, bs)
            return o.astype(q.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out[0, 0, :1]

    dt = _timed_floor_subtracted(run_chained, q, (kc, vc, meta), iters)
    # attention FLOPs: per seq, q_len rows x ctx keys (~causal half for
    # the fresh part, full for the cached prefix; report the exact
    # masked count) x 2 matmuls x 2 flops
    fresh = q_len * (ctx - q_len) + q_len * (q_len + 1) // 2
    flops = S * fresh * h * d * 4
    return {
        "kernel": "prefill",
        "S": S, "q_len": q_len, "ctx": ctx, "kvh": kvh, "h": h, "d": d,
        "ms": round(dt * 1e3, 3),
        "tflops": round(flops / dt / 1e12, 2),
    }


def bench_gmm(T, K, N, E, wdtype_name, impl, iters=2000):
    """MoE grouped matmul (T rows sorted by expert, E experts of (K, N))
    — decode shapes are bound by streaming the expert weights, so the
    report is weight GB/s vs the HBM roofline.

    Floor-subtracted: the chained scan still pays one fixed relay round
    trip (~25 ms) per fetch, an additive `fixed/iters` per-iteration
    offset LARGER than these sub-ms kernels at small iter counts. An
    empty-body scan at the same iters measures that floor, which is
    subtracted. group_sizes stay uniform-and-full deliberately: the
    scan's feedback loop otherwise collapses the routing and both
    backends skip the empty experts' weights, benchmarking nothing."""
    import jax
    import jax.numpy as jnp

    from minivllm_tpu.ops.moe import qragged_dot
    from minivllm_tpu.ops.quant import quantize_weight

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.bfloat16)
    wf = rng.standard_normal((E, K, N)).astype(np.float32) * 0.05
    if wdtype_name == "int8":
        w = quantize_weight(wf, (1,))
        wbytes = 1
    else:
        w = jnp.asarray(wf, jnp.bfloat16)
        wbytes = 2
    # uneven-but-full routing: every expert holds rows (worst case for
    # weight streaming — all E weight matrices cross HBM every call)
    gs = np.full(E, T // E, np.int32)
    gs[0] += T - gs.sum()
    gs = jnp.asarray(gs)

    def chained(body):
        @jax.jit
        def run(x, w, gs):
            out, _ = jax.lax.scan(
                lambda c, _: (body(c, w, gs), None), x, None, length=iters
            )
            return out[0, :1]

        run(x, w, gs).block_until_ready()  # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(run(x, w, gs))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    floor = chained(lambda c, w, gs: c + 1.0)
    dt = chained(
        lambda c, w, gs: c.at[:, :1].add(
            qragged_dot(c, w, gs, impl)[:, :1].astype(c.dtype)
        )
    )
    dt = max(dt - floor, 1e-9)
    wtotal = E * K * N * wbytes
    gbs = wtotal / dt / 1e9
    return {
        "kernel": "moe_gmm", "impl": impl,
        "T": T, "K": K, "N": N, "E": E, "w_dtype": wdtype_name,
        "us": round(dt * 1e6, 1),
        "w_gb_per_s": round(gbs, 1),
        "roofline_frac": round(gbs / V5E_HBM_GBS, 3),
        "tflops": round(2 * T * K * N / dt / 1e12, 2),
    }



def bench_w8a8(M, K, N, impl, iters=400):
    """W8A8 layer matmul at decode shapes: the fused Pallas
    quantize-matmul (ops/pallas/qmatmul.py) vs the XLA a8 path vs
    weight-only int8 (dequant-into-bf16-matmul). Floor-subtracted
    chained scan (same protocol as bench_gmm). Weight streaming is the
    decode bound, so the report is weight GB/s; the int8-TOP/s column
    shows MXU utilization for the compute-heavy shapes.

    The feedback consumes the FULL output via a sum reduction — slicing
    one column lets XLA narrow the whole matmul to that column (the
    measurement trap documented for top-k in CLAUDE.md; first version
    of this bench read a 0 us weight-only matmul that way). The ~10 us
    reduce is identical across impls, so the A/B stays valid."""
    import jax
    import jax.numpy as jnp

    from minivllm_tpu.ops.quant import qdot, quantize_weight

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = quantize_weight(rng.standard_normal((K, N)).astype(np.float32) * 0.05,
                        (0,))

    def chained(body):
        @jax.jit
        def run(x, w):
            out, _ = jax.lax.scan(
                lambda c, _: (body(c, w), None), x, None, length=iters
            )
            return out[0, :1]

        run(x0, w).block_until_ready()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(run(x0, w))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    floor = chained(lambda c, w: c + 1.0)
    a8 = {"xla_a8": True, "pallas": "pallas", "int8_wo": False}[impl]
    dt = chained(
        lambda c, w: c.at[:, :1].add(
            (jnp.sum(qdot(c, w, a8=a8).astype(jnp.float32)) * 1e-9).astype(
                c.dtype
            )
        )
    ) - floor
    dt = max(dt, 1e-9)
    return {
        "kernel": "w8a8_matmul", "impl": impl,
        "M": M, "K": K, "N": N,
        "us": round(dt * 1e6, 1),
        "w_gb_per_s": round(K * N / dt / 1e9, 1),
        "roofline_frac": round(K * N / dt / 1e9 / V5E_HBM_GBS, 3),
        "int8_tops": round(2 * M * K * N / dt / 1e12, 2),
    }


def bench_sampler(S, V, iters=50):
    """Sampler-prep cost at serving logits shapes: the chunked two-stage
    exact top-64 (sampling/ops.chunked_top_k) vs lax.top_k's full vocab
    sort, both + full logsumexp — the two vocab sweeps of the fast
    sampler path. Floor-subtracted chained scan (the results feed a FULL
    reduction back into the carry: slicing a sort lets XLA narrow it to
    the consumed prefix and the measurement collapses)."""
    import jax
    import jax.numpy as jnp

    from minivllm_tpu.sampling.ops import chunked_top_k

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((S, V)) * 4.0, jnp.float32)

    def chained(body):
        @jax.jit
        def run(x):
            out, _ = jax.lax.scan(
                lambda c, _: (body(c), None), x, None, length=iters
            )
            return out[0, :1]

        run(x0).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x0))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    def dep(c, *vals):
        s = sum(jnp.sum(v.astype(jnp.float32)) * 1e-9 for v in vals)
        return c.at[:, :1].add(s)

    floor = chained(lambda c: c + 1.0)

    def prep(c, topk):
        lse = jax.scipy.special.logsumexp(c, axis=-1)
        cand, idx = topk(c, 64)
        return dep(c, cand, idx, lse)

    chunked = chained(lambda c: prep(c, chunked_top_k)) - floor
    full = chained(lambda c: prep(c, jax.lax.top_k)) - floor
    return {
        "kernel": "sampler_prep", "S": S, "V": V,
        "chunked_ms": round(chunked * 1e3, 3),
        "lax_top_k_ms": round(full * 1e3, 3),
        "speedup": round(full / max(chunked, 1e-9), 2),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kv-dtype", choices=["bf16", "int8"], default="bf16")
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--moe", action="store_true",
                   help="MoE grouped-matmul sweep instead of attention")
    p.add_argument("--sampler", action="store_true",
                   help="sampler-prep (chunked top-64 + logsumexp) sweep")
    p.add_argument("--w8a8", action="store_true",
                   help="W8A8 fused quantize-matmul sweep (7B decode shapes)")
    args = p.parse_args()

    if args.w8a8:
        # qwen2-7b layer matmuls at the 256-seq north-star decode batch.
        for M, K, N in [
            (256, 3584, 3584),    # q / o projection
            (256, 3584, 512),     # k / v projection
            (256, 3584, 18944),   # gate / up
            (256, 18944, 3584),   # down
        ]:
            for impl in ("xla_a8", "pallas", "int8_wo"):
                print(json.dumps(bench_w8a8(M, K, N, impl, args.iters)))
        return

    if args.sampler:
        for S, V in [(64, 151936), (256, 152064)]:
            print(json.dumps(bench_sampler(S, V)))
        return

    if args.moe:
        # qwen3-moe-3b shapes (bench_serving): D=2048, I=1408, E=8, k=2.
        # T = decode batch x top_k (128) and a prefill chunk (4096).
        for T, K, N in [
            (128, 2048, 1408),   # gate/up, decode
            (128, 1408, 2048),   # down, decode
            (4096, 2048, 1408),  # gate/up, prefill
        ]:
            for wdt in ("bf16", "int8"):
                for impl in ("xla", "pallas"):
                    print(json.dumps(bench_gmm(
                        T, K, N, 8, wdt, impl, args.iters)))
        return

    # Qwen3-0.6B / Qwen2-7B GQA decode shapes at serving concurrency.
    # iters must be large: the whole chain costs one relay round trip
    # (~30 ms through this environment's tunnel), so at 20 iters the
    # round trip alone reads as a fake ~1.5 ms/call floor.
    for S, ctx, kvh, h, d in [
        (64, 256, 8, 16, 128),
        (256, 256, 4, 28, 128),
        (256, 512, 4, 28, 128),
        (64, 1024, 8, 16, 128),
        (256, 1024, 4, 28, 128),
        (256, 4096, 4, 28, 128),
    ]:
        out = bench_decode(S, ctx, kvh, h, d, 64, args.kv_dtype, args.iters)
        print(json.dumps(out))
    if args.kv_dtype == "bf16":
        # Qwen2-7B prefill shapes: fresh prompts and long-context chunks
        for S, q_len, ctx in [(8, 512, 512), (2, 2048, 2048), (2, 1024, 4096)]:
            print(json.dumps(bench_prefill(S, q_len, ctx, 4, 28, 128, 64)))


if __name__ == "__main__":
    main()

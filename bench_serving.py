"""Serving-scale benchmark: continuous batching at high concurrency.

Reproduces the BASELINE.json target configs (e.g. "Qwen2-7B INT8
continuous batching: 256 seqs, 16384 batched tokens, INT8 KV-cache") on
one chip with random weights (zero-egress environment; throughput is
weight-independent). Prints one JSON line with aggregate throughput and
latency percentiles from the engine's metrics.

Examples:
    python bench_serving.py --model qwen3-0.6b --num-seqs 64
    python bench_serving.py --model qwen2-7b --quant int8 \
        --kv-dtype int8 --num-seqs 256 --batched-tokens 16384
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

# HF config shapes of the benchmark model zoo (real checkpoint configs;
# weights are randomly initialized on device).
_QWEN3 = {
    "architectures": ["Qwen3ForCausalLM"], "model_type": "qwen3",
    "rms_norm_eps": 1e-6, "rope_theta": 1000000.0, "attention_bias": False,
    "max_position_embeddings": 40960, "vocab_size": 151936,
}
_QWEN2 = {
    "architectures": ["Qwen2ForCausalLM"], "model_type": "qwen2",
    "rms_norm_eps": 1e-6, "rope_theta": 1000000.0,
    "max_position_embeddings": 32768, "vocab_size": 152064,
}
MODELS = {
    "qwen3-0.6b": {**_QWEN3, "hidden_size": 1024, "intermediate_size": 3072,
                   "num_attention_heads": 16, "num_key_value_heads": 8,
                   "num_hidden_layers": 28, "head_dim": 128,
                   "tie_word_embeddings": True},
    "qwen3-1.7b": {**_QWEN3, "hidden_size": 2048, "intermediate_size": 6144,
                   "num_attention_heads": 16, "num_key_value_heads": 8,
                   "num_hidden_layers": 28, "head_dim": 128,
                   "tie_word_embeddings": True},
    "qwen3-4b": {**_QWEN3, "hidden_size": 2560, "intermediate_size": 9728,
                 "num_attention_heads": 32, "num_key_value_heads": 8,
                 "num_hidden_layers": 36, "head_dim": 128,
                 "tie_word_embeddings": True},
    "qwen2-7b": {**_QWEN2, "hidden_size": 3584, "intermediate_size": 18944,
                 "num_attention_heads": 28, "num_key_value_heads": 4,
                 "num_hidden_layers": 28,
                 "tie_word_embeddings": False},
    "llama3-8b": {"architectures": ["LlamaForCausalLM"], "model_type": "llama",
                  "hidden_size": 4096, "intermediate_size": 14336,
                  "num_attention_heads": 32, "num_key_value_heads": 8,
                  "num_hidden_layers": 32, "vocab_size": 128256,
                  "rms_norm_eps": 1e-5, "rope_theta": 500000.0,
                  "max_position_embeddings": 8192,
                  "tie_word_embeddings": False},
    "mistral-7b": {"architectures": ["MistralForCausalLM"],
                   "model_type": "mistral",
                   "hidden_size": 4096, "intermediate_size": 14336,
                   "num_attention_heads": 32, "num_key_value_heads": 8,
                   "num_hidden_layers": 32, "vocab_size": 32000,
                   "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
                   "max_position_embeddings": 32768, "sliding_window": 4096,
                   "tie_word_embeddings": False},
    # Synthetic ~3B-total / ~0.9B-active MoE (Qwen3-MoE architecture):
    # dropless grouped-matmul experts via lax.ragged_dot, fp32 routing.
    "qwen3-moe-3b": {**_QWEN3, "architectures": ["Qwen3MoeForCausalLM"],
                     "model_type": "qwen3_moe",
                     "hidden_size": 2048, "intermediate_size": 5632,
                     "num_attention_heads": 16, "num_key_value_heads": 4,
                     "num_hidden_layers": 24, "head_dim": 128,
                     "num_experts": 8, "num_experts_per_tok": 2,
                     "moe_intermediate_size": 1408, "norm_topk_prob": True,
                     "decoder_sparse_step": 1, "mlp_only_layers": [],
                     "tie_word_embeddings": True},
    "opt-125m": {"architectures": ["OPTForCausalLM"], "model_type": "opt",
                 "hidden_size": 768, "ffn_dim": 3072,
                 "num_attention_heads": 12, "num_hidden_layers": 12,
                 "vocab_size": 50272, "max_position_embeddings": 2048,
                 "word_embed_proj_dim": 768, "do_layer_norm_before": True},
    "gpt2-117m": {"architectures": ["GPT2LMHeadModel"], "model_type": "gpt2",
                  "n_embd": 768, "n_head": 12, "n_layer": 12,
                  "n_positions": 1024, "vocab_size": 50257,
                  "layer_norm_epsilon": 1e-5},
}


# v5e per-chip peaks (public spec): bf16 197 TFLOP/s, int8 394 TOP/s,
# HBM ~819 GB/s. MFU uses the standard param-matmul FLOP count
# (2 * active matmul params per token); attention-score FLOPs are
# context-dependent and excluded, as in the usual MFU convention.
V5E_BF16_FLOPS = 197e12
V5E_INT8_OPS = 394e12


def flops_per_token(cfg: dict) -> float:
    """Matmul FLOPs per generated token from the HF config shapes:
    2 * (per-layer qkv/o + mlp or active-expert weights) * layers
    + 2 * lm_head. Makes cross-session tok/s numbers interpretable as
    a fraction of the chip bound despite the ±20-50% relay drift
    (VERDICT r4 next #8)."""
    D = cfg.get("hidden_size") or cfg.get("n_embd")
    L = cfg.get("num_hidden_layers") or cfg.get("n_layer")
    H = cfg.get("num_attention_heads") or cfg.get("n_head")
    KVH = cfg.get("num_key_value_heads", H)
    hd = cfg.get("head_dim") or D // H
    V = cfg["vocab_size"]
    qkvo = D * H * hd * 2 + D * KVH * hd * 2
    if "num_experts" in cfg:
        mlp = (
            D * cfg["num_experts"]  # router
            + cfg["num_experts_per_tok"] * 3 * D * cfg["moe_intermediate_size"]
        )
    elif "intermediate_size" in cfg:
        mlp = 3 * D * cfg["intermediate_size"]  # SwiGLU gate/up/down
    else:  # OPT / GPT2: fc1 + fc2 (GELU MLP)
        ffn = cfg.get("ffn_dim") or 4 * D
        mlp = 2 * D * ffn
    return float(2 * (L * (qkvo + mlp) + D * V))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=sorted(MODELS), default="qwen3-0.6b")
    p.add_argument("--num-seqs", type=int, default=64)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--max-tokens", type=int, default=32)
    p.add_argument("--max-model-len", type=int, default=512)
    p.add_argument("--batched-tokens", type=int, default=4096)
    p.add_argument("--quant", choices=["int8", "fp8", "w8a8"], default=None)
    p.add_argument("--kv-dtype", default="auto")
    p.add_argument("--multi-step", type=int, default=4)
    p.add_argument("--blocks", type=int, default=-1,
                   help="KV blocks (-1 = auto-size from free HBM)")
    p.add_argument("--block-size", type=int, default=64,
                   help="KV cache block size (tokens per block)")
    p.add_argument(
        "--spec-tokens", type=int, default=0, metavar="K",
        help="n-gram speculative decoding with K draft tokens (greedy "
        "only — pair with --temperature 0; use --repetitive for a "
        "workload whose prompts actually contain recurring n-grams)",
    )
    p.add_argument(
        "--repetitive", action="store_true",
        help="build each prompt by repeating a short random span "
        "(extraction/quoting-like text where prompt lookup fires)",
    )
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument(
        "--n", type=int, default=1,
        help="completions per prompt (KV-forked siblings); the prompt "
        "count shrinks to num-seqs//n so live-sequence concurrency "
        "matches the n=1 run — A/B: --n 4 vs default",
    )
    p.add_argument("--passes", type=int, default=2)
    p.add_argument(
        "--cached", action="store_true",
        help="reuse identical prompts across passes (measures fully "
        "prefix-cached serving; default uses fresh prompts per pass)",
    )
    p.add_argument(
        "--no-shared-prefix-decode", action="store_true",
        help="disable the two-phase grouped decode (A/B comparison)",
    )
    p.add_argument(
        "--shared-prefix", type=int, default=0, metavar="LEN",
        help="system-prompt workload: every request = one LEN-token "
        "shared prefix + its own prompt-len tail. Exercises prefix-"
        "cached prefill and shared-prefix two-phase decode attention.",
    )
    args = p.parse_args()

    from transformers import AutoConfig

    from minivllm_tpu import Config, SamplingParams
    from minivllm_tpu.llm import LLM

    tmp = Path(tempfile.mkdtemp(prefix="bench-serving-"))
    (tmp / "config.json").write_text(json.dumps(MODELS[args.model]))
    config = Config(
        model=str(tmp),
        hf_config=AutoConfig.from_pretrained(tmp),
        max_num_seqs=args.num_seqs,
        max_model_len=args.max_model_len,
        max_num_batched_tokens=args.batched_tokens,
        kvcache_block_size=args.block_size,
        num_kvcache_blocks=args.blocks,
        dtype="bfloat16",
        kvcache_dtype=args.kv_dtype,
        quantization=args.quant,
        decode_multi_step=args.multi_step,
        shared_prefix_decode=not args.no_shared_prefix_decode,
        speculative_num_tokens=args.spec_tokens,
    )
    t0 = time.perf_counter()
    llm = LLM(config, init_random=True)
    print(f"engine up in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    import numpy as np

    rng = np.random.default_rng(0)
    vocab = llm.model_runner.model.vocab_size

    system = (
        list(rng.integers(1, vocab, size=args.shared_prefix))
        if args.shared_prefix
        else []
    )

    def one_prompt():
        if args.repetitive:
            span = list(rng.integers(1, vocab, size=max(args.prompt_len // 8, 4)))
            reps = -(-args.prompt_len // len(span))
            return (span * reps)[: args.prompt_len]
        return list(rng.integers(1, vocab, size=args.prompt_len))

    def prompt_set():
        return [
            system + one_prompt()
            for _ in range(max(1, args.num_seqs // args.n))
        ]

    # Fresh prompts per pass measure cold serving (real prefill each
    # pass); --cached reuses one set, measuring fully prefix-cached
    # serving (the runner turns the 1-remaining-token prefills into a
    # decode step).
    first = prompt_set()
    sets = [
        first if args.cached else prompt_set() for _ in range(args.passes)
    ]
    sp = SamplingParams(
        temperature=args.temperature, top_p=0.95,
        max_tokens=args.max_tokens, ignore_eos=True, n=args.n,
    )

    llm.generate(first, sp, use_tqdm=False)  # warm compile buckets
    llm.metrics.reset()
    gen = 0
    t0 = time.perf_counter()
    for prompts in sets:
        outs = llm.generate(prompts, sp, use_tqdm=False)
        gen += sum(
            sum(len(c["token_ids"]) for c in o.get("completions", [o]))
            for o in outs
        )
    elapsed = time.perf_counter() - t0
    stats = llm.get_stats()
    ftok = flops_per_token(MODELS[args.model])
    decode_tps = stats.get("decode_tokens_per_s", 0)
    # The layer matmuls run on the int8 MXU path under w8a8, so its
    # roofline is the int8 bound; everything else computes in bf16.
    peak = V5E_INT8_OPS if args.quant == "w8a8" else V5E_BF16_FLOPS
    print(json.dumps({
        "metric": f"{args.model}_serving_throughput",
        "value": round(gen / elapsed, 2),
        "unit": "tok/s",
        "config": {
            "num_seqs": args.num_seqs, "prompt_len": args.prompt_len,
            "max_tokens": args.max_tokens, "quant": args.quant,
            "kv_dtype": args.kv_dtype, "multi_step": args.multi_step,
            "batched_tokens": args.batched_tokens, "cached": args.cached,
            "shared_prefix": args.shared_prefix, "n": args.n,
        },
        "shared_prefix_steps": stats.get("shared_prefix_steps", 0),
        "ngram_spec_steps": stats.get("ngram_spec_steps", 0),
        "ngram_spec_drafted": stats.get("ngram_spec_drafted", 0),
        "ngram_spec_accepted": stats.get("ngram_spec_accepted", 0),
        "decode_tokens_per_s": round(stats.get("decode_tokens_per_s", 0), 2),
        "decode_ms_per_token_p50": round(
            stats.get("decode_ms_per_token_p50", 0), 4),
        "ttft_s_p50": round(stats.get("ttft_s_p50", 0), 4),
        "ttft_s_p95": round(stats.get("ttft_s_p95", 0), 4),
        "prefill_tokens_per_s": round(stats.get("prefill_tokens_per_s", 0), 2),
        "model_gflops_per_token": round(ftok / 1e9, 2),
        "decode_mfu": round(decode_tps * ftok / peak, 4),
        "e2e_mfu": round(gen / elapsed * ftok / peak, 4),
        "mfu_bound": "int8" if args.quant == "w8a8" else "bf16",
    }))


if __name__ == "__main__":
    main()

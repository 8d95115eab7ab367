"""Prefix caching in action: shared system prompts skip recomputation."""

import time

import numpy as np

from common import base_parser, resolve_model
from minivllm_tpu import LLM, Config, SamplingParams


def main() -> None:
    args = base_parser(__doc__).parse_args()
    model = resolve_model(args.model, "qwen3")
    llm = LLM(Config(model=model, max_num_seqs=8, max_model_len=1024,
                     max_num_batched_tokens=2048))
    rng = np.random.default_rng(0)
    vocab = llm.model_runner.model.vocab_size
    system = list(rng.integers(1, vocab, size=256))  # 4 shared blocks
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    t0 = time.perf_counter()
    llm.generate([system + [1, 2, 3]], sp, use_tqdm=False)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    llm.generate([system + [7, 8, 9]], sp, use_tqdm=False)
    warm = time.perf_counter() - t0
    stats = llm.get_stats()
    print(f"cold prefill: {cold:.3f}s, warm (cached prefix): {warm:.3f}s")
    print(f"prefix cache hits: {stats['prefix_cache_hits']}, "
          f"hit rate: {stats['prefix_cache_hit_rate']:.2f}")


if __name__ == "__main__":
    main()

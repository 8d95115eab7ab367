"""Dynamic batch of prompts with mixed sampling parameters
(reference analog: examples/batch_inference_example.py)."""

import numpy as np

from common import base_parser, resolve_model
from minivllm_tpu import LLM, Config, SamplingParams


def main() -> None:
    args = base_parser(__doc__).parse_args()
    model = resolve_model(args.model, "gpt2")
    llm = LLM(Config(model=model, max_num_seqs=8, max_model_len=512,
                     max_num_batched_tokens=1024))
    rng = np.random.default_rng(0)
    vocab = llm.model_runner.model.vocab_size
    prompts = [list(rng.integers(1, vocab, size=n)) for n in (8, 21, 13, 34, 5, 17, 28, 11)]
    params = [
        SamplingParams(temperature=t, top_p=p, max_tokens=args.max_tokens,
                       ignore_eos=True)
        for t, p in [(0.0, 1.0), (0.7, 0.95), (1.0, 0.9), (1.2, 0.8)] * 2
    ]
    outs = llm.generate(prompts, params)
    for i, o in enumerate(outs):
        print(f"[{i}] {len(o['token_ids'])} tokens: {o['token_ids'][:8]}...")
    print("stats:", llm.get_stats())


if __name__ == "__main__":
    main()

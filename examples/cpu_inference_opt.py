"""OPT greedy decoding on CPU
(reference analog: examples/cpu_inference_opt.py)."""

import jax

from common import base_parser, resolve_model
from minivllm_tpu import LLM, Config, SamplingParams


def main() -> None:
    jax.config.update("jax_platforms", "cpu")
    args = base_parser(__doc__).parse_args()
    model = resolve_model(args.model, "opt")
    llm = LLM(Config(model=model, max_num_seqs=4, max_model_len=512,
                     max_num_batched_tokens=512, dtype="float32"))
    prompts = (
        ["Hello, my name is", "The capital of France is"]
        if llm.tokenizer is not None
        else [[5, 17, 42], [9, 131, 77, 3]]
    )
    outs = llm.generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=args.max_tokens)
    )
    for p, o in zip(prompts, outs):
        print(f"prompt: {p!r}\n  -> {o['text'] or o['token_ids']}")
    print("stats:", llm.get_stats())


if __name__ == "__main__":
    main()

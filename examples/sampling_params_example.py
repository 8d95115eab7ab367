"""Sweep of sampling configurations on one prompt
(reference analog: examples/sampling_params_example.py)."""

from common import base_parser, resolve_model
from minivllm_tpu import LLM, Config, SamplingParams

SWEEPS = {
    "greedy": SamplingParams(temperature=0.0, max_tokens=16),
    "creative": SamplingParams(temperature=1.2, top_p=0.95, max_tokens=16),
    "focused": SamplingParams(temperature=0.7, top_k=40, max_tokens=16),
    "min_p": SamplingParams(temperature=1.0, min_p=0.1, max_tokens=16),
    "typical": SamplingParams(temperature=1.0, typical_p=0.9, max_tokens=16),
    "no_repeat": SamplingParams(temperature=0.8, repetition_penalty=1.3,
                                frequency_penalty=0.2, max_tokens=16),
    # Generation TERMINATES at the first match (KV freed within one
    # decode window); the text is truncated at the stop string.
    "stop_str": SamplingParams(temperature=0.0, max_tokens=32,
                               stop=["the", "and"]),
    # 3 completions, one prompt prefill (copy-on-write KV forking);
    # out["completions"] lists all siblings.
    "n3": SamplingParams(temperature=0.9, seed=7, n=3, max_tokens=12),
}


def main() -> None:
    args = base_parser(__doc__).parse_args()
    model = resolve_model(args.model, "qwen3")
    llm = LLM(Config(model=model, max_num_seqs=4, max_model_len=512,
                     max_num_batched_tokens=512))
    prompt = (
        "Once upon a time" if llm.tokenizer is not None else [11, 47, 3, 88]
    )
    for name, sp in SWEEPS.items():
        out = llm.generate([prompt], sp, use_tqdm=False)[0]
        print(f"{name:10s}: {out['text'] or out['token_ids']}")


if __name__ == "__main__":
    main()

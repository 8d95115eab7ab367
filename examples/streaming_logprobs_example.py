"""Library-level token streaming and per-token logprobs.

Streams one completion chunk-by-chunk via llm.stream(), then requests
completion-token logprobs with top-3 alternatives (OpenAI semantics; the
HTTP server exposes the same through /v1/completions "logprobs").
"""

from common import base_parser, resolve_model
from minivllm_tpu import LLM, Config, SamplingParams


def main() -> None:
    args = base_parser(__doc__).parse_args()
    model = resolve_model(args.model, "qwen3")
    llm = LLM(Config(model=model, max_num_seqs=4, max_model_len=512,
                     max_num_batched_tokens=512))
    prompt = (
        "The three laws of robotics"
        if llm.tokenizer is not None
        else [11, 47, 3, 88]
    )

    print("streaming:", end=" ", flush=True)
    ids: list[int] = []
    for chunk in llm.stream(
        prompt, SamplingParams(temperature=0.7, max_tokens=24)
    ):
        ids.extend(chunk)
        if llm.tokenizer is not None:
            print(llm.tokenizer.decode(chunk), end="", flush=True)
        else:
            print(chunk, end=" ", flush=True)
    print()

    out = llm.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_tokens=8, logprobs=3),
        use_tqdm=False,
    )[0]
    for e in out["logprobs"]:
        alts = ", ".join(f"{t}:{lp:.2f}" for t, lp in e["top"].items())
        print(f"  token {e['token_id']:>6}  lp={e['logprob']:7.3f}  top3: {alts}")


if __name__ == "__main__":
    main()

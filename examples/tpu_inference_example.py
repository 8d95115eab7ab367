"""Qwen3 serving on TPU with Pallas attention kernels
(reference analog: examples/npu_inference_example.py)."""

from common import base_parser, resolve_model
from minivllm_tpu import LLM, Config, SamplingParams


def main() -> None:
    args = base_parser(__doc__).parse_args()
    model = resolve_model(args.model, "qwen3")
    llm = LLM(Config(model=model, max_num_seqs=8, max_model_len=1024,
                     max_num_batched_tokens=2048))
    print("runner:", llm.model_runner.get_model_info())
    prompts = (
        ["Explain what a TPU systolic array does."]
        if llm.tokenizer is not None
        else [[1, 2, 3, 4, 5, 6, 7, 8]]
    )
    outs = llm.generate(
        prompts, SamplingParams(temperature=0.7, top_p=0.95,
                                max_tokens=args.max_tokens)
    )
    for o in outs:
        print(o["text"] or o["token_ids"])
    print("stats:", llm.get_stats())


if __name__ == "__main__":
    main()

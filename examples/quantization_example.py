"""INT8/FP8 weight-only quantization: memory savings and output fidelity."""

import jax

from common import base_parser, resolve_model
from minivllm_tpu import LLM, Config, SamplingParams


def main() -> None:
    args = base_parser(__doc__).parse_args()
    model = resolve_model(args.model, "qwen3")
    sp = SamplingParams(temperature=0.0, max_tokens=args.max_tokens,
                        ignore_eos=True)
    prompt = [5, 9, 13, 44, 7]
    for quant in (None, "int8", "fp8"):
        llm = LLM(Config(model=model, max_num_seqs=4, max_model_len=512,
                         max_num_batched_tokens=512, quantization=quant))
        nbytes = sum(x.nbytes for x in jax.tree.leaves(llm.model_runner.params))
        out = llm.generate([prompt], sp, use_tqdm=False)[0]
        print(f"quant={quant}: weights {nbytes / 2**20:.1f} MiB, "
              f"tokens {out['token_ids'][:8]}")
        llm.exit()


if __name__ == "__main__":
    main()

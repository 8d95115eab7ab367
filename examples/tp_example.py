"""Tensor-parallel sweep over a device mesh
(reference analog: examples/npu_tp_example.py:64-187 — but real SPMD,
no worker processes). On a single host set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
to simulate 8 devices.
"""

import time

import jax

from common import base_parser, resolve_model
from minivllm_tpu import LLM, Config, SamplingParams


def main() -> None:
    p = base_parser(__doc__)
    p.add_argument("--tp", type=int, nargs="+", default=None)
    args = p.parse_args()
    n_dev = len(jax.devices())
    tps = args.tp or [t for t in (1, 2, 4, 8) if t <= n_dev]
    # Head counts must divide every tp size in the sweep.
    model = resolve_model(
        args.model, "qwen3",
        num_attention_heads=8, num_key_value_heads=8, head_dim=16,
    )
    prompt = [1, 2, 3, 4, 5, 6, 7, 8]
    for tp in tps:
        llm = LLM(Config(model=model, max_num_seqs=4, max_model_len=512,
                         max_num_batched_tokens=512, tensor_parallel_size=tp))
        t0 = time.perf_counter()
        out = llm.generate(
            [prompt],
            SamplingParams(temperature=0.0, max_tokens=args.max_tokens,
                           ignore_eos=True),
            use_tqdm=False,
        )[0]
        dt = time.perf_counter() - t0
        print(f"tp={tp}: {len(out['token_ids'])} tokens in {dt:.2f}s "
              f"-> {out['token_ids'][:6]}...")
        llm.exit()


if __name__ == "__main__":
    main()

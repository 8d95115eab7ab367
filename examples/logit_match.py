"""Standalone HF logit-parity check against a REAL checkpoint.

Reference analog: tests/test_qwen3_logit_match.py (SURVEY §3.5) — its
PASS bar is cosine similarity > 0.99 between the engine's last-token
logits and HF transformers'. Same contract here, for any supported
model directory (safetensors/bin + config.json on disk; nothing is
downloaded):

    python examples/logit_match.py --model /path/to/Qwen3-0.6B \
        --prompt "The capital of France is"

Without --model a tiny random checkpoint is generated, so the script
also runs air-gapped (the CI parity tests cover that case exhaustively;
this script exists to validate REAL weights end to end).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

from common import base_parser, resolve_model  # noqa: E402


def main() -> int:
    p = base_parser(__doc__)
    p.add_argument("--prompt", action="append", default=None,
                   help="prompt text (repeatable; needs a tokenizer)")
    p.add_argument("--tokens", default=None,
                   help="comma-separated token ids (no tokenizer needed)")
    p.add_argument("--cos-bar", type=float, default=0.99)
    args = p.parse_args()
    model_dir = resolve_model(args.model)

    import numpy as np

    token_lists: list[list[int]] = []
    if args.tokens:
        token_lists.append([int(t) for t in args.tokens.split(",")])
    if args.prompt:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_dir)
        token_lists += [tok.encode(t) for t in args.prompt]
    if not token_lists:
        token_lists = [[1, 2, 3, 4, 5, 6, 7, 8]]

    # HF ground truth (float32 torch on CPU).
    import torch
    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype=torch.float32
    ).eval()
    ref = []
    with torch.no_grad():
        for toks in token_lists:
            ref.append(hf(torch.tensor([toks])).logits[0, -1].numpy())
    del hf

    # Our model through the real loader + paged-cache prefill path.
    import jax.numpy as jnp
    from transformers import AutoConfig

    from minivllm_tpu.models.registry import create_model
    from minivllm_tpu.ops.backend import XlaAttentionBackend
    from minivllm_tpu.utils.loader import load_model_params
    from util_modeling import build_prefill_batch

    BS = 16
    num_blocks = sum(len(t) for t in token_lists) // BS + 2 * len(token_lists)
    hf_config = AutoConfig.from_pretrained(model_dir)
    model = create_model(hf_config, jnp.float32, XlaAttentionBackend(BS))
    params = load_model_params(model, model_dir)
    L = model.num_layers
    kvh = getattr(model, "num_kv_heads", model.num_heads)
    slots = (num_blocks + 1) * BS
    kc = jnp.zeros((L * slots, kvh, model.head_dim), jnp.float32)
    vc = jnp.zeros_like(kc)

    meta, _ = build_prefill_batch(token_lists, BS, num_blocks)
    hidden, kc, vc = model.forward(params, meta, kc, vc, is_prefill=True)
    last = np.asarray(
        model.compute_logits(params, hidden[meta.last_token_idx])
    )

    ok = True
    for s, (toks, r) in enumerate(zip(token_lists, ref)):
        ours = last[s][: r.shape[-1]]  # drop vocab padding columns
        cos = float(np.dot(ours, r)
                    / (np.linalg.norm(ours) * np.linalg.norm(r)))
        status = "PASS" if cos > args.cos_bar else "FAIL"
        ok &= cos > args.cos_bar
        print(f"[{status}] cos={cos:.6f} len={len(toks)} "
              f"top5 hf={np.argsort(r)[-5:][::-1].tolist()} "
              f"ours={np.argsort(ours)[-5:][::-1].tolist()}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

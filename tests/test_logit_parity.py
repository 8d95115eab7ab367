"""HF logit-parity harness (reference analog:
tests/test_qwen3_logit_match.py — PASS bar there is cosine sim > 0.99 on
last-token logits; here we additionally check allclose on all positions).

A tiny random checkpoint is built offline with transformers, loaded both by
HF torch (ground truth) and by our JAX model through the real safetensors
loader + paged-cache forward path, in float32.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from minivllm_tpu.models.registry import create_model
from minivllm_tpu.ops.backend import XlaAttentionBackend
from minivllm_tpu.utils.loader import load_model_params
from minivllm_tpu.utils.testing import make_tiny_checkpoint

from util_modeling import build_decode_batch, build_prefill_batch

BS = 4  # kv block size for tests
NUM_BLOCKS = 64


def hf_logits(model_dir, token_lists):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir, torch_dtype=torch.float32)
    model.eval()
    outs = []
    with torch.no_grad():
        for toks in token_lists:
            ids = torch.tensor([toks])
            outs.append(model(ids).logits[0].numpy())
    return outs


def our_model_and_cache(model_dir):
    from transformers import AutoConfig

    hf_config = AutoConfig.from_pretrained(model_dir)
    backend = XlaAttentionBackend(BS)
    model = create_model(hf_config, jnp.float32, backend)
    params = load_model_params(model, model_dir)
    L = model.num_layers
    kvh = getattr(model, "num_kv_heads", model.num_heads)
    hd = model.head_dim
    slots = (NUM_BLOCKS + 1) * BS
    kc = jnp.zeros((L * slots, kvh, hd), jnp.float32)
    vc = jnp.zeros((L * slots, kvh, hd), jnp.float32)
    return model, params, kc, vc


def run_parity(model_type, tmp_path, cos_bar=0.99, **overrides):
    model_dir = make_tiny_checkpoint(model_type, tmp_path / model_type, **overrides)
    rng = np.random.default_rng(7)
    token_lists = [list(rng.integers(0, 199, size=n)) for n in (11, 6)]
    ref = hf_logits(model_dir, token_lists)
    model, params, kc, vc = our_model_and_cache(str(model_dir))
    meta, block_tables = build_prefill_batch(token_lists, BS, NUM_BLOCKS)
    hidden, kc, vc = model.forward(params, meta, kc, vc, is_prefill=True)
    logits = np.asarray(model.compute_logits(params, hidden))
    logits = logits[:, : ref[0].shape[-1]]  # drop vocab padding columns
    ofs = 0
    for toks, ref_l in zip(token_lists, ref):
        ours = logits[ofs : ofs + len(toks)]
        ofs += len(toks)
        cos = np.sum(ours[-1] * ref_l[-1]) / (
            np.linalg.norm(ours[-1]) * np.linalg.norm(ref_l[-1])
        )
        assert cos > cos_bar, f"{model_type}: last-token cosine {cos}"
        np.testing.assert_allclose(ours, ref_l, rtol=2e-3, atol=2e-3)
    return model, params, kc, vc, token_lists, block_tables, model_dir


@pytest.mark.parametrize(
    "model_type",
    ["qwen3", "qwen2", "llama", "mistral", "qwen3_moe", "mixtral", "gemma",
     "gemma2", "opt", "gpt2"],
)
def test_prefill_parity(model_type, tmp_path):
    run_parity(model_type, tmp_path)


@pytest.mark.parametrize(
    "model_type,scaling",
    [
        (
            "llama",
            {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
             "high_freq_factor": 4.0,
             "original_max_position_embeddings": 64},
        ),
        (
            "qwen3",
            {"rope_type": "yarn", "factor": 4.0,
             "original_max_position_embeddings": 64},
        ),
    ],
)
def test_prefill_parity_rope_scaled(model_type, scaling, tmp_path):
    """Llama-3.1-style and YaRN rope_scaling configs must match HF through
    the full model forward (frequency bands + attention factor)."""
    run_parity(
        model_type, tmp_path, rope_scaling=scaling,
        max_position_embeddings=512,
    )


def test_prefill_parity_qwen3_moe_mixed_dense(tmp_path):
    """Qwen3-MoE with a MIXED dense/sparse stack: `mlp_only_layers` plus
    `decoder_sparse_step` (legal HF config fields; HF rule — sparse iff
    i not in mlp_only_layers and (i+1) % step == 0). Layers 0 (step),
    1 (mlp_only) and 2 (step) are dense, layer 3 sparse; the scanned
    layer body branches per layer with lax.cond on the static mask."""
    run_parity(
        "qwen3_moe", tmp_path,
        num_hidden_layers=4, mlp_only_layers=[1], decoder_sparse_step=2,
    )


def test_prefill_parity_mistral_sliding_window(tmp_path):
    """Mistral with a binding sliding window (8 < seq len) must match HF's
    windowed attention exactly (reference treats Mistral as out of scope)."""
    run_parity("mistral", tmp_path, sliding_window=8)


@pytest.mark.parametrize("model_type", ["opt", "gpt2"])
def test_decode_parity_non_rope(model_type, tmp_path):
    model, params, kc, vc, token_lists, block_tables, model_dir = run_parity(
        model_type, tmp_path
    )
    rng = np.random.default_rng(13)
    extended = [toks + [int(rng.integers(0, 199))] for toks in token_lists]
    meta, block_tables = build_decode_batch(extended, block_tables, BS, NUM_BLOCKS)
    hidden, kc, vc = model.forward(params, meta, kc, vc, is_prefill=False)
    logits = np.asarray(model.compute_logits(params, hidden))
    ref = hf_logits(model_dir, extended)
    for s, ref_l in enumerate(ref):
        np.testing.assert_allclose(
            logits[s, : ref_l.shape[-1]], ref_l[-1], rtol=2e-3, atol=2e-3
        )


@pytest.mark.parametrize("model_type", ["qwen3", "qwen3_moe", "mixtral", "gemma2"])
def test_decode_parity_qwen3(model_type, tmp_path):
    """Prefill then one decode step through the paged cache must match the
    HF forward over the extended sequence."""
    model, params, kc, vc, token_lists, block_tables, model_dir = run_parity(
        model_type, tmp_path
    )
    # Append one token per sequence and decode it.
    rng = np.random.default_rng(11)
    extended = [toks + [int(rng.integers(0, 199))] for toks in token_lists]
    meta, block_tables = build_decode_batch(extended, block_tables, BS, NUM_BLOCKS)
    hidden, kc, vc = model.forward(params, meta, kc, vc, is_prefill=False)
    logits = np.asarray(model.compute_logits(params, hidden))
    ref = hf_logits(model_dir, extended)
    for s, ref_l in enumerate(ref):
        np.testing.assert_allclose(
            logits[s, : ref_l.shape[-1]], ref_l[-1], rtol=2e-3, atol=2e-3
        )

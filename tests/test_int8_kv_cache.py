"""INT8 KV cache: op-level dequant fidelity and end-to-end generation
(north-star feature, BASELINE.json)."""

import numpy as np
import pytest
import jax.numpy as jnp

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.llm import LLM
from minivllm_tpu.ops.attention import (
    DecodeBatch,
    cache_gather,
    cache_write,
    decode_attention_xla,
    make_quantized_cache,
    store_kv,
)
from minivllm_tpu.utils.testing import make_tiny_checkpoint

BS = 16


def test_write_gather_roundtrip():
    rng = np.random.default_rng(0)
    cache = make_quantized_cache(64, 2, 32, BS)
    v = rng.normal(0, 3, (5, 2, 32)).astype(np.float32)
    slots = jnp.asarray([3, 10, 11, 40, 63])
    cache = cache_write(cache, slots, jnp.asarray(v))
    back = np.asarray(cache_gather(cache, slots))
    # per-row absmax int8: relative error < 1%
    assert np.abs(back - v).max() <= np.abs(v).max() / 100


def test_store_kv_packs_scales():
    """store_kv writes the IDENTICAL K+V-packed scale slab into both
    caches: K scales at lanes [0, bs), V at [bs, 2bs) — the layout the
    flash kernels rely on to fetch ONE scale DMA per sub-block."""
    rng = np.random.default_rng(3)
    kvh, d, L = 2, 32, 20
    q_k = make_quantized_cache(64, kvh, d, BS)
    q_v = make_quantized_cache(64, kvh, d, BS)
    k = rng.normal(0, 2, (L, kvh, d)).astype(np.float32)
    v = rng.normal(0, 5, (L, kvh, d)).astype(np.float32)
    slots = jnp.arange(L, dtype=jnp.int32)
    q_k, q_v = store_kv(q_k, q_v, jnp.asarray(k), jnp.asarray(v), slots)
    np.testing.assert_array_equal(
        np.asarray(q_k.scale), np.asarray(q_v.scale)
    )
    sk = np.abs(k).max(-1) / 127.0                       # (L, kvh)
    sv = np.abs(v).max(-1) / 127.0
    slab = np.asarray(q_k.scale)                         # (nb, kvh, lanes)
    for t in range(L):
        b, off = t // BS, t % BS
        np.testing.assert_allclose(slab[b, :, off], sk[t], rtol=1e-6)
        np.testing.assert_allclose(slab[b, :, BS + off], sv[t], rtol=1e-6)
    # role-offset gathers dequantize each side correctly
    kb = np.asarray(cache_gather(q_k, slots))
    vb = np.asarray(cache_gather(q_v, slots, role=1))
    assert np.abs(kb - k).max() <= np.abs(k).max() / 100
    assert np.abs(vb - v).max() <= np.abs(v).max() / 100


def test_decode_oracle_int8_close_to_fp32():
    rng = np.random.default_rng(1)
    kvh, h, d, L = 2, 4, 32, 40
    fp_k = jnp.zeros(((32 + 1) * BS, kvh, d), jnp.float32)
    fp_v = jnp.zeros_like(fp_k)
    q_k = make_quantized_cache((32 + 1) * BS, kvh, d, BS)
    q_v = make_quantized_cache((32 + 1) * BS, kvh, d, BS)
    k = jnp.asarray(rng.normal(0, 1, (L, kvh, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (L, kvh, d)).astype(np.float32))
    slots = jnp.arange(L, dtype=jnp.int32)
    fp_k, fp_v = store_kv(fp_k, fp_v, k, v, slots)
    # store_kv is the canonical PAIR write: both caches receive the
    # identical K+V-packed scale slab.
    q_k, q_v = store_kv(q_k, q_v, k, v, slots)
    q = jnp.asarray(rng.normal(0, 1, (1, h, d)).astype(np.float32))
    meta = DecodeBatch(
        input_ids=jnp.zeros(1, jnp.int32),
        positions=jnp.asarray([L - 1]),
        slot_mapping=jnp.zeros(1, jnp.int32),
        block_tables=jnp.asarray([[0, 1, 2]], jnp.int32),
        ctx_lens=jnp.asarray([L], jnp.int32),
    )
    ref = np.asarray(decode_attention_xla(q, fp_k, fp_v, meta, 0.18, BS))
    out = np.asarray(decode_attention_xla(q, q_k, q_v, meta, 0.18, BS))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_int8_kv_generation(tmp_path):
    ckpt = make_tiny_checkpoint("qwen3", tmp_path / "m")

    def gen(kv_dtype):
        llm = LLM(Config(
            model=str(ckpt), max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=128, kvcache_block_size=16,
            num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
            kvcache_dtype=kv_dtype,
        ))
        return llm.generate(
            [[5, 9, 13, 44, 7, 81, 2]],
            SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
            use_tqdm=False,
        )[0]["token_ids"]

    fp = gen("auto")
    q8 = gen("int8")
    assert len(q8) == 8
    assert q8[0] == fp[0]  # first-token argmax fidelity


def test_int8_kv_with_int8_weights(tmp_path):
    """Both quantizations stacked still generate."""
    ckpt = make_tiny_checkpoint("qwen3", tmp_path / "m2")
    llm = LLM(Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
        kvcache_dtype="int8", quantization="int8",
    ))
    out = llm.generate(
        [[3, 1, 4, 1, 5]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(out[0]["token_ids"]) == 6

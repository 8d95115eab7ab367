"""INT8/FP8 weight-only quantization tests: op-level round trip, model
logit fidelity vs fp32 (cosine > 0.99, the reference's parity bar),
end-to-end generation, and TP sharding of quantized params."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.llm import LLM
from minivllm_tpu.ops.quant import qdot, qlookup, qtranspose, quantize_weight
from minivllm_tpu.utils.testing import make_tiny_checkpoint


# fp8 (e4m3, 3 mantissa bits) has coarser steps than int8's absmax/127
# grid; each format gets its own error bar.
QUANT_ERR = {"int8": 0.01, "fp8": 0.07}
QDOT_ERR = {"int8": 0.02, "fp8": 0.05}


@pytest.mark.parametrize("fmt", ["int8", "fp8"])
def test_quantize_roundtrip_error(fmt):
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, (64, 128)).astype(np.float32)
    qw = quantize_weight(w, (0,), fmt)
    assert qw["w"].dtype == (jnp.int8 if fmt == "int8" else jnp.float8_e4m3fn)
    deq = np.asarray(qw["w"], np.float32) * np.asarray(qw["s"])
    assert np.abs(deq - w).max() < np.abs(w).max() * QUANT_ERR[fmt]


@pytest.mark.parametrize("fmt", ["int8", "fp8"])
def test_qdot_matches_dense_closely(fmt):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (8, 64)).astype(np.float32))
    w = rng.normal(0, 0.05, (64, 32)).astype(np.float32)
    qw = quantize_weight(w, (0,), fmt)
    ref = np.asarray(jnp.dot(x, jnp.asarray(w)))
    out = np.asarray(qdot(x, qw))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < QDOT_ERR[fmt]


def test_qdot_w8a8_matches_dense_closely():
    """W8A8: per-row int8 activations x int8 weights on the int8 MXU
    path; the added activation-quant error is bounded by the per-row
    absmax/127 grid (~0.4% relative) on top of the weight error."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (8, 64)).astype(np.float32))
    w = rng.normal(0, 0.05, (64, 32)).astype(np.float32)
    qw = quantize_weight(w, (0,), "w8a8")
    assert qw["w"].dtype == jnp.int8  # stored exactly like int8
    ref = np.asarray(jnp.dot(x, jnp.asarray(w)))
    out = np.asarray(qdot(x, qw, a8=True))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 0.03
    # layer-slice scale shape (1, out) broadcast path
    out2 = np.asarray(qdot(x, {"w": qw["w"], "s": qw["s"]}, a8=True))
    np.testing.assert_allclose(out, out2)


@pytest.mark.parametrize("M,K,N", [(32, 128, 128), (64, 256, 384),
                                   (256, 384, 512)])
def test_w8a8_kernel_matches_xla_path_to_1ulp(M, K, N):
    """The fused quantize-matmul kernel (ops/pallas/qmatmul.py) matches
    qdot's XLA a8 path: the int8 quantize and int32 accumulation are
    exact integer arithmetic (identical in both), and the two final f32
    dequant multiplies may differ by at most 1 ULP (XLA fusion can
    reassociate them; jitted-vs-eager qdot shows the same 1 ULP)."""
    from minivllm_tpu.ops.pallas import qmatmul

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32))
    w = rng.normal(0, 0.05, (K, N)).astype(np.float32)
    qw = quantize_weight(w, (0,), "int8")
    assert qmatmul.is_supported(x.shape, qw["w"].shape)
    ref = np.asarray(qdot(x, qw, a8=True))
    out = np.asarray(
        qmatmul.w8a8_matmul(
            x, qw["w"], qw["s"].reshape(-1), interpret=True
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=3e-7, atol=0)
    # The int32 accumulator itself is bit-exact: undo the (identical)
    # scales and compare integers.
    xf = np.asarray(x, np.float32)
    xs = np.maximum(np.abs(xf).max(axis=-1, keepdims=True), 1e-30) / 127.0
    ws = np.asarray(qw["s"], np.float32).reshape(1, -1)
    acc_k = np.rint(out / xs / ws)
    acc_r = np.rint(ref / xs / ws)
    np.testing.assert_array_equal(acc_k, acc_r)
    # qdot routes to the kernel itself under the a8="pallas_interpret"
    # marker the runner sets for single-chip Pallas serving.
    via_qdot = np.asarray(qdot(x, qw, a8="pallas_interpret"))
    np.testing.assert_array_equal(via_qdot, out)


def test_w8a8_kernel_engages_in_engine(tmp_path, monkeypatch):
    """End-to-end: w8a8 + the Pallas backend + MINIVLLM_W8A8_KERNEL=1
    (the kernel is opt-in — the serving A/B measured it 31% slower than
    the XLA a8 path, docs/performance.md) routes prefill matmuls
    (packed M >= 32) through the fused kernel (trace counter), and the
    generated tokens match the XLA a8 path exactly (greedy; the 1-ULP
    dequant difference does not flip these argmaxes)."""
    from minivllm_tpu.ops.pallas import qmatmul

    monkeypatch.setenv("MINIVLLM_W8A8_KERNEL", "1")

    ckpt = make_tiny_checkpoint(
        "qwen3", tmp_path / "m",
        num_attention_heads=4, num_key_value_heads=2, head_dim=128,
        hidden_size=128,
    )
    rng = np.random.default_rng(3)
    prompts = [[int(t) for t in rng.integers(1, 190, 40)] for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)

    def run(impl):
        llm = LLM(Config(
            model=str(ckpt), max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=128, kvcache_block_size=16,
            num_kvcache_blocks=32, dtype="float32", attention_impl=impl,
            quantization="w8a8",
        ))
        outs = llm.generate(prompts, sp, use_tqdm=False)
        llm.exit()
        return [o["token_ids"] for o in outs]

    ref = run("xla")
    before = qmatmul.TRACES
    got = run("pallas_interpret")
    assert qmatmul.TRACES > before, "fused w8a8 kernel never engaged"
    assert got == ref


def test_w8a8_kernel_support_gate():
    from minivllm_tpu.ops.pallas import qmatmul

    assert not qmatmul.is_supported((8, 128), (128, 128))     # M too small
    assert not qmatmul.is_supported((512, 128), (128, 128))   # M too big
    assert not qmatmul.is_supported((64, 100), (100, 128))    # K unaligned
    assert not qmatmul.is_supported((64, 128), (128, 100))    # N unaligned
    assert not qmatmul.is_supported((64, 200000), (200000, 128))  # overflow


def test_qlookup_and_transpose():
    rng = np.random.default_rng(2)
    table = rng.normal(0, 0.1, (10, 16)).astype(np.float32)
    qt = quantize_weight(table, (1,))
    ids = jnp.asarray([3, 7, 0])
    ref = table[np.asarray(ids)]
    out = np.asarray(qlookup(qt, ids, jnp.float32))
    np.testing.assert_allclose(out, ref, atol=0.01)
    h = jnp.asarray(rng.normal(0, 1, (2, 16)).astype(np.float32))
    ref_l = np.asarray(jnp.dot(h, jnp.asarray(table.T)))
    out_l = np.asarray(qdot(h, qtranspose(qt)))
    assert np.abs(out_l - ref_l).max() / np.abs(ref_l).max() < 0.02


@pytest.mark.parametrize("fmt", ["int8", "fp8", "w8a8"])
@pytest.mark.parametrize("model_type", ["qwen3", "llama", "gemma2", "opt", "gpt2"])
def test_quantized_generation_close_to_fp32(model_type, fmt, tmp_path):
    ckpt = make_tiny_checkpoint(model_type, tmp_path / model_type)

    def gen(quant):
        cfg = Config(
            model=str(ckpt), max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=128, kvcache_block_size=16,
            num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
            quantization=quant,
        )
        llm = LLM(cfg)
        out = llm.generate(
            [[5, 9, 13, 44, 7]],
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
            use_tqdm=False,
        )
        return out[0]["token_ids"]

    fp = gen(None)
    q = gen(fmt)
    # Greedy trajectories of a *random* tiny model are extremely sensitive;
    # require the first tokens to agree (logit argmax fidelity).
    assert q[0] == fp[0]


@pytest.mark.parametrize("fmt", ["int8", "fp8", "w8a8"])
def test_quantized_logit_cosine(tmp_path, fmt):
    """Cosine similarity of int8/fp8 vs fp32 logits > 0.99 (the
    reference's parity bar, test_qwen3_logit_match.py:307-312)."""
    from transformers import AutoConfig

    from minivllm_tpu.models.registry import create_model
    from minivllm_tpu.ops.backend import XlaAttentionBackend
    from minivllm_tpu.utils.loader import load_model_params

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from util_modeling import build_prefill_batch

    ckpt = make_tiny_checkpoint("qwen3", tmp_path / "m")
    hf_config = AutoConfig.from_pretrained(ckpt)
    model = create_model(hf_config, jnp.float32, XlaAttentionBackend(16))
    params = load_model_params(model, ckpt)
    qparams = model.quantize_params(params, fmt)
    toks = [list(np.random.default_rng(3).integers(0, 199, 20))]
    kc = jnp.zeros((model.num_layers * 33 * 16, model.num_kv_heads, model.head_dim), jnp.float32)
    vc = jnp.zeros_like(kc)
    meta, _ = build_prefill_batch(toks, 16, 32)
    h_fp, _, _ = model.forward(params, meta, kc, vc, is_prefill=True)
    model.a8 = fmt == "w8a8"  # the runner sets this for w8a8 configs
    h_q, _, _ = model.forward(qparams, meta, jnp.zeros_like(kc), jnp.zeros_like(vc), is_prefill=True)
    V = model.vocab_size
    l_fp = np.asarray(model.compute_logits(params, h_fp))[19, :V]
    l_q = np.asarray(model.compute_logits(qparams, h_q))[19, :V]
    cos = np.dot(l_fp, l_q) / (np.linalg.norm(l_fp) * np.linalg.norm(l_q))
    assert cos > 0.99, cos


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
@pytest.mark.parametrize("fmt", ["int8", "w8a8"])
def test_quantized_tp_sharding(tmp_path, fmt):
    """Quantized params shard over tp and the step runs under the mesh —
    for w8a8 the int8 x int8 dot_general must lower under GSPMD too."""
    from minivllm_tpu.engine.model_runner import ModelRunner
    from minivllm_tpu.engine.sequence import Sequence
    from minivllm_tpu.parallel.sharding import make_mesh

    ckpt = make_tiny_checkpoint(
        "qwen3", tmp_path / f"tp-{fmt}", num_attention_heads=8,
        num_key_value_heads=8, head_dim=16, hidden_size=64,
    )
    cfg = Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
        tensor_parallel_size=4, quantization=fmt,
    )
    runner = ModelRunner(cfg, mesh=make_mesh(4))
    seq = Sequence([1, 2, 3, 4, 5], SamplingParams(temperature=0.0), block_size=16)
    seq.block_table = [0]
    toks = runner.run([seq], is_prefill=True)
    assert len(toks) == 1

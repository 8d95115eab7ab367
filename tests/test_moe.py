"""MoE op + Qwen3-MoE model tests (beyond reference parity — the
reference has no MoE models, SURVEY.md §2.2)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.engine.model_runner import ModelRunner
from minivllm_tpu.engine.sequence import Sequence
from minivllm_tpu.llm import LLM
from minivllm_tpu.ops.moe import moe_mlp
from minivllm_tpu.ops.quant import quantize_weight
from minivllm_tpu.parallel.sharding import make_mesh
from minivllm_tpu.utils.testing import make_tiny_checkpoint


def ref_moe(x, router_w, w_gate, w_up, w_down, k, norm):
    """Per-token loop reference (mirrors HF Qwen3MoeSparseMoeBlock)."""
    T, D = x.shape
    probs = np.asarray(jax.nn.softmax(jnp.asarray(x @ router_w), axis=-1))
    out = np.zeros_like(x)
    for t in range(T):
        top = np.argsort(-probs[t])[:k]
        w = probs[t][top]
        if norm:
            w = w / w.sum()
        for e, we in zip(top, w):
            h = x[t] @ w_gate[e]
            u = x[t] @ w_up[e]
            act = (h / (1 + np.exp(-h))) * u
            out[t] += we * (act @ w_down[e])
    return out


@pytest.mark.parametrize("norm", [True, False])
def test_moe_mlp_matches_loop_reference(norm):
    rng = np.random.default_rng(0)
    T, D, I, E, K = 9, 16, 24, 6, 2
    x = rng.normal(0, 1, (T, D)).astype(np.float32)
    router = rng.normal(0, 0.5, (D, E)).astype(np.float32)
    wg = rng.normal(0, 0.2, (E, D, I)).astype(np.float32)
    wu = rng.normal(0, 0.2, (E, D, I)).astype(np.float32)
    wd = rng.normal(0, 0.2, (E, I, D)).astype(np.float32)
    ref = ref_moe(x, router, wg, wu, wd, K, norm)
    out = np.asarray(
        jax.jit(lambda *a: moe_mlp(*a, K, norm))(
            jnp.asarray(x), jnp.asarray(router),
            jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd),
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_moe_mlp_quantized_close():
    rng = np.random.default_rng(1)
    T, D, I, E, K = 7, 16, 24, 4, 2
    x = rng.normal(0, 1, (T, D)).astype(np.float32)
    router = rng.normal(0, 0.5, (D, E)).astype(np.float32)
    wg = rng.normal(0, 0.2, (E, D, I)).astype(np.float32)
    wu = rng.normal(0, 0.2, (E, D, I)).astype(np.float32)
    wd = rng.normal(0, 0.2, (E, I, D)).astype(np.float32)
    exact = np.asarray(moe_mlp(
        jnp.asarray(x), jnp.asarray(router),
        jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd), K, True,
    ))
    q = np.asarray(moe_mlp(
        jnp.asarray(x), jnp.asarray(router),
        quantize_weight(wg, (1,)), quantize_weight(wu, (1,)),
        quantize_weight(wd, (1,)), K, True,
    ))
    err = np.abs(q - exact).max() / (np.abs(exact).max() + 1e-9)
    assert err < 0.05, err


@pytest.mark.parametrize("quant", [False, True])
def test_gmm_kernel_matches_ragged_dot(quant):
    """The Pallas grouped matmul (interpret mode) vs the XLA path, at
    kernel-supported shapes (K, N multiples of 128), uneven groups
    including empty experts and groups straddling the 128-row tiles."""
    from minivllm_tpu.ops.moe import qragged_dot

    rng = np.random.default_rng(2)
    T, K, N, E = 384, 128, 256, 8
    gs = jnp.asarray([100, 0, 30, 90, 0, 64, 50, 50], jnp.int32)
    x = jnp.asarray(rng.normal(0, 1, (T, K)).astype(np.float32))
    w = rng.normal(0, 0.2, (E, K, N)).astype(np.float32)
    wq = quantize_weight(w, (1,)) if quant else jnp.asarray(w)
    ref = np.asarray(jax.jit(qragged_dot, static_argnames="impl")(x, wq, gs))
    out = np.asarray(
        jax.jit(qragged_dot, static_argnames="impl")(
            x, wq, gs, impl="pallas_interpret"
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_gmm_kernel_wide_tiles():
    """T > 1024 takes the 512-row tile path (multi-tile work list,
    experts straddling tile boundaries, a ragged last tile)."""
    from minivllm_tpu.ops.moe import qragged_dot

    rng = np.random.default_rng(11)
    T, K, N, E = 2560, 128, 128, 4
    gs = jnp.asarray([700, 1000, 0, 860], jnp.int32)
    x = jnp.asarray(rng.normal(0, 1, (T, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (E, K, N)).astype(np.float32))
    f = jax.jit(qragged_dot, static_argnames="impl")
    np.testing.assert_allclose(
        np.asarray(f(x, w, gs, impl="pallas_interpret")),
        np.asarray(f(x, w, gs)),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("quant", [False, True])
def test_gmm_blocked_weight_layout(quant):
    """The kernel also accepts (E, N/TN, K, TN) pre-blocked weights
    (block_weights); outputs must match the row-major layout."""
    from minivllm_tpu.ops.pallas import moe_gmm

    rng = np.random.default_rng(7)
    T, K, N, E = 256, 128, 256, 4
    gs = jnp.asarray([60, 100, 0, 96], jnp.int32)
    x = jnp.asarray(rng.normal(0, 1, (T, K)).astype(np.float32))
    w = rng.normal(0, 0.2, (E, K, N)).astype(np.float32)
    scale = None
    if quant:
        q = quantize_weight(w, (1,))
        w, scale = q["w"], q["s"].astype(jnp.float32).reshape(E, 1, N)
    else:
        w = jnp.asarray(w)
    wb = moe_gmm.block_weights(w)
    assert np.asarray(moe_gmm.unblock_weights(wb) == w).all()
    ref = np.asarray(moe_gmm.gmm(x, w, gs, scale, interpret=True))
    out = np.asarray(moe_gmm.gmm(x, wb, gs, scale, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "gs",
    [
        [384, 0, 0, 0, 0, 0, 0, 0],   # fully collapsed routing
        [0, 0, 0, 0, 0, 0, 0, 384],   # collapsed onto the last expert
        [0, 200, 0, 0, 184, 0, 0, 0],  # two occupied experts
    ],
)
def test_gmm_kernel_skewed_groups(gs):
    """Skewed/collapsed routing: most experts empty, so most work-list
    slots are padding items (block indices repeat the last real item's
    and compute is predicated off) — the output must still match."""
    from minivllm_tpu.ops.moe import qragged_dot

    rng = np.random.default_rng(5)
    T, K, N, E = 384, 128, 256, 8
    x = jnp.asarray(rng.normal(0, 1, (T, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (E, K, N)).astype(np.float32))
    gs = jnp.asarray(gs, jnp.int32)
    f = jax.jit(qragged_dot, static_argnames="impl")
    np.testing.assert_allclose(
        np.asarray(f(x, w, gs, impl="pallas_interpret")),
        np.asarray(f(x, w, gs)),
        rtol=2e-5, atol=2e-5,
    )


def test_gmm_expert_window_shards_sum_to_full():
    """build_items(e_lo, e_count) work lists: each expert-window shard
    computes exactly its window's rows (zeros elsewhere, incl. dummy
    items for un-owned tiles), so the shards SUM to the full grouped
    matmul — the invariant the ep-psum in moe_mlp_spmd relies on."""
    from minivllm_tpu.ops.pallas import moe_gmm

    rng = np.random.default_rng(3)
    T, K, N, E = 384, 128, 128, 8
    gs = jnp.asarray([100, 0, 30, 90, 0, 64, 50, 50], jnp.int32)
    x = jnp.asarray(rng.normal(0, 1, (T, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (E, K, N)).astype(np.float32))
    full = np.asarray(moe_gmm.gmm(x, w, gs, interpret=True))
    for ep in (2, 4, 8):
        ec = E // ep
        acc = np.zeros_like(full)
        for s in range(ep):
            items = moe_gmm.build_items(
                gs, T, moe_gmm._pick_tm(T), E, e_lo=s * ec, e_count=ec
            )
            part = np.asarray(
                moe_gmm.gmm(x, w[s * ec:(s + 1) * ec], gs,
                            interpret=True, items=items)
            )
            acc += part
        np.testing.assert_allclose(acc, full, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("ep,tp,dp", [(2, 4, 1), (4, 2, 1), (2, 2, 2)])
def test_moe_mlp_spmd_matches_xla(ep, tp, dp, quant):
    """The shard_map MoE wrapper (Pallas grouped matmul per shard,
    expert-window work lists, one ep+tp psum) vs the mesh-less XLA
    path, plain and weight-quantized."""
    from minivllm_tpu.ops.moe import moe_mlp_spmd
    from minivllm_tpu.ops.quant import quantize_weight

    rng = np.random.default_rng(4)
    T, D, I, E, K = 64, 256, 512, 8, 2
    x = jnp.asarray(rng.normal(0, 1, (T, D)).astype(np.float32))
    rw = jnp.asarray(rng.normal(0, 0.5, (D, E)).astype(np.float32))
    wg = rng.normal(0, 0.1, (E, D, I)).astype(np.float32)
    wu = rng.normal(0, 0.1, (E, D, I)).astype(np.float32)
    wd = rng.normal(0, 0.1, (E, I, D)).astype(np.float32)
    if quant:
        wg = quantize_weight(wg, (1,))
        wu = quantize_weight(wu, (1,))
        wd = quantize_weight(wd, (1,))
    else:
        wg, wu, wd = jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd)
    ref = np.asarray(moe_mlp(x, rw, wg, wu, wd, K, True, impl="xla"))
    mesh = make_mesh(tp, ep_size=ep, dp_size=dp)
    out = np.asarray(jax.jit(
        lambda *a: moe_mlp_spmd(
            mesh, *a, K, True, "pallas_interpret", row_axis="dp"
        )
    )(x, rw, wg, wu, wd))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def moe_ckpt(tmp_path_factory):
    # 8 kv heads / 8 experts so tp,ep in {1,2,4} divide evenly.
    return make_tiny_checkpoint(
        "qwen3_moe",
        tmp_path_factory.mktemp("moe") / "m",
        num_attention_heads=8,
        num_key_value_heads=8,
        head_dim=16,
        hidden_size=64,
        moe_intermediate_size=64,
    )


def _run_tokens(ckpt, tp, ep, quant=None):
    cfg = Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
        tensor_parallel_size=tp, quantization=quant,
    )
    mesh = make_mesh(tp, ep_size=ep) if tp * ep > 1 else None
    runner = ModelRunner(cfg, mesh=mesh)
    seqs = [
        Sequence(list(range(1, 1 + n)), SamplingParams(temperature=0.0),
                 block_size=16)
        for n in (7, 12)
    ]
    nb = 0
    for s in seqs:
        need = (len(s) + 15) // 16
        s.block_table = list(range(nb, nb + need))
        nb += need
    out = [runner.run(seqs, is_prefill=True)]
    for t, s in zip(out[-1], seqs):
        s.append_token(int(t))
    for _ in range(3):
        out.append(runner.run(seqs, is_prefill=False))
        for t, s in zip(out[-1], seqs):
            s.append_token(int(t))
    return out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_moe_ep_tp_matches_single_device(moe_ckpt):
    ref = _run_tokens(moe_ckpt, 1, 1)
    assert _run_tokens(moe_ckpt, 2, 1) == ref, "tp=2 diverged"
    assert _run_tokens(moe_ckpt, 1, 4) == ref, "ep=4 diverged"
    assert _run_tokens(moe_ckpt, 2, 2) == ref, "tp=2 x ep=2 diverged"


def test_moe_pallas_gmm_engine_parity(tmp_path):
    """Greedy tokens through the engine with the Pallas grouped-matmul
    engaged (interpret mode; hidden/intermediate at the kernel's 128
    multiple) must match the XLA ragged_dot path."""
    ckpt = make_tiny_checkpoint(
        "qwen3_moe", tmp_path / "m128",
        num_attention_heads=4, num_key_value_heads=4, head_dim=16,
        hidden_size=128, moe_intermediate_size=128,
    )

    def toks(impl):
        cfg = Config(
            model=str(ckpt), max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=128, kvcache_block_size=16,
            num_kvcache_blocks=32, dtype="float32", attention_impl=impl,
        )
        outs = LLM(cfg).generate(
            [[1, 2, 3, 4, 5], [9, 8, 7]],
            SamplingParams(temperature=0.0, max_tokens=8),
            use_tqdm=False,
        )
        return [o["token_ids"] for o in outs]

    assert toks("pallas_interpret") == toks("xla")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("ep,tp,dp", [(2, 2, 1), (4, 1, 1), (2, 1, 2)])
def test_moe_spmd_engine_matches_single_device(tmp_path, ep, tp, dp):
    """Greedy tokens through the engine under an ep/tp/dp mesh with the
    shard_map MoE kernel path ENGAGED (asserted via the model's
    trace counter) must match the mesh-less XLA run."""
    ckpt = make_tiny_checkpoint(
        "qwen3_moe", tmp_path / "m",
        num_attention_heads=4, num_key_value_heads=4, head_dim=16,
        hidden_size=128, moe_intermediate_size=256,
    )

    def toks(mesh, impl):
        cfg = Config(
            model=str(ckpt), max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=128, kvcache_block_size=16,
            num_kvcache_blocks=32, dtype="float32", attention_impl=impl,
        )
        runner = ModelRunner(cfg, mesh=mesh)
        seqs = [
            Sequence(list(range(1, 1 + n)), SamplingParams(temperature=0.0),
                     block_size=16)
            for n in (7, 12, 5)
        ]
        nb = 0
        for s in seqs:
            need = (len(s) + 15) // 16
            s.block_table = list(range(nb, nb + need))
            nb += need
        out = [runner.run(seqs, is_prefill=True)]
        for t, s in zip(out[-1], seqs):
            s.append_token(int(t))
        for _ in range(3):
            out.append(runner.run(seqs, is_prefill=False))
            for t, s in zip(out[-1], seqs):
                s.append_token(int(t))
        return out, getattr(runner.model, "_moe_spmd_traces", 0)

    ref, _ = toks(None, "xla")
    got, engaged = toks(make_mesh(tp, ep_size=ep, dp_size=dp),
                        "pallas_interpret")
    assert engaged > 0, "spmd MoE kernel path did not engage"
    assert got == ref


def test_moe_engine_generate(moe_ckpt):
    cfg = Config(
        model=str(moe_ckpt), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
    )
    llm = LLM(cfg)
    outs = llm.generate(
        [[1, 2, 3, 4, 5], [9, 8, 7]],
        SamplingParams(temperature=0.0, max_tokens=8),
        use_tqdm=False,
    )
    assert all(len(o["token_ids"]) == 8 for o in outs)


def test_mixtral_engine_hf_greedy_parity(tmp_path):
    """Mixtral end to end: sliding-window attention + the inherited MoE
    stack generate HF-identical greedy tokens through the engine, on
    both the XLA oracle and the Pallas kernels (interpret mode; the
    MoE grouped-matmul path gated by its own shape support)."""
    import torch
    from transformers import AutoModelForCausalLM

    ckpt = make_tiny_checkpoint(
        "mixtral", tmp_path / "m",
        head_dim=128, hidden_size=64, intermediate_size=128,
    )
    prompt = [11, 47, 3, 88, 120, 9, 55, 14]
    n = 8

    def run(impl):
        llm = LLM(Config(
            model=str(ckpt), max_num_seqs=4, max_model_len=128,
            max_num_batched_tokens=128, kvcache_block_size=16,
            num_kvcache_blocks=32, dtype="float32", attention_impl=impl,
        ))
        out = llm.generate(
            [prompt], SamplingParams(temperature=0.0, max_tokens=n,
                                     ignore_eos=True),
            use_tqdm=False,
        )[0]["token_ids"]
        llm.exit()
        return out

    model = AutoModelForCausalLM.from_pretrained(str(ckpt)).eval()
    toks = list(prompt)
    with torch.no_grad():
        for _ in range(n):
            toks.append(int(model(torch.tensor([toks])).logits[0, -1].argmax()))
    ref = toks[len(prompt):]
    assert run("xla") == ref
    assert run("pallas_interpret") == ref

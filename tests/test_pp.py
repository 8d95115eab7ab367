"""Pipeline-parallel ("pp" mesh axis) tests on the 8-virtual-device CPU
mesh — real multi-device execution of the microbatch pipeline
(parallel/pipeline.py), checked token-for-token against single-device
greedy decoding. The reference has no pipeline parallelism (SURVEY.md
§2.2)."""

import jax
import pytest

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.engine.model_runner import ModelRunner
from minivllm_tpu.engine.sequence import Sequence
from minivllm_tpu.parallel.sharding import make_mesh
from minivllm_tpu.utils.testing import make_tiny_checkpoint

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    # 4 layers so pp in {1, 2, 4} divides the stack evenly.
    return make_tiny_checkpoint(
        "qwen3",
        tmp_path_factory.mktemp("pp") / "m",
        num_hidden_layers=4,
        num_attention_heads=8,
        num_key_value_heads=8,
        head_dim=16,
        hidden_size=64,
    )


def run_tokens(ckpt, *, tp=1, pp=1, impl="xla", kernel_traces=None):
    cfg = Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl=impl,
        tensor_parallel_size=tp, pipeline_parallel_size=pp,
    )
    mesh = make_mesh(tp, pp_size=pp) if tp * pp > 1 else None
    runner = ModelRunner(cfg, mesh=mesh)
    seqs = [
        Sequence(list(range(1, 1 + n)), SamplingParams(temperature=0.0),
                 block_size=16)
        for n in (7, 12, 3)
    ]
    nb = 0
    for s in seqs:
        need = (len(s) + 15) // 16
        s.block_table = list(range(nb, nb + need))
        nb += need
    out = [runner.run(seqs, is_prefill=True)]
    for t, s in zip(out[-1], seqs):
        s.append_token(int(t))
    for _ in range(4):
        out.append(runner.run(seqs, is_prefill=False))
        for t, s in zip(out[-1], seqs):
            s.append_token(int(t))
    if kernel_traces is not None:
        kernel_traces.update(getattr(runner.attn_backend, "kernel_traces", {}))
    return out


@pytest.fixture(scope="module")
def ref(ckpt):
    return run_tokens(ckpt)


def test_pp_matches_single_device(ckpt, ref):
    assert run_tokens(ckpt, pp=2) == ref
    assert run_tokens(ckpt, pp=4) == ref


def test_pp_tp_composed(ckpt, ref):
    assert run_tokens(ckpt, tp=2, pp=2) == ref


@pytest.fixture(scope="module")
def ckpt128(tmp_path_factory):
    # head_dim=128: the Pallas kernels' lane requirement, so the
    # attention kernels engage (in interpret mode) inside the pipeline.
    return make_tiny_checkpoint(
        "qwen3",
        tmp_path_factory.mktemp("pp128") / "m",
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=128,
        hidden_size=64,
    )


def test_pp_pallas_kernels_engage(ckpt128):
    """Pallas attention inside the pipeline's manual-pp region: the SPMD
    wrappers rebuild their nested shard_map on the abstract context mesh
    (ops/pallas/spmd._resolve_mesh). Tokens must match the mesh-less XLA
    run and the kernel paths must actually trace in (no oracle-only
    fallback)."""
    ref = run_tokens(ckpt128)
    traces = {}
    got = run_tokens(
        ckpt128, tp=2, pp=2, impl="pallas_interpret", kernel_traces=traces
    )
    assert got == ref
    assert traces.get("decode", 0) > 0, "decode kernel never engaged under pp"
    assert traces.get("prefill", 0) > 0, "prefill kernel never engaged under pp"


def test_pp_pallas_engine_long_prompts(ckpt128):
    """Engine-level pp x tp with prompts long enough that prefill splits
    into several microbatches: catches microbatch-local tile metadata
    bugs (q_start/q_lens/ctx_lens are global packed-row values and must
    be re-based per microbatch in pipeline._split_meta)."""
    import numpy as np

    from minivllm_tpu.llm import LLM

    rng = np.random.default_rng(3)
    prompts = [
        [1, 5, 9, 2],
        [int(t) for t in rng.integers(1, 190, 70)],
        [4, 4, 8],
        [int(t) for t in rng.integers(1, 190, 40)],
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    def run(impl, tp, pp):
        llm = LLM(Config(
            model=str(ckpt128), max_num_seqs=4, max_model_len=256,
            dtype="float32", attention_impl=impl,
            tensor_parallel_size=tp, pipeline_parallel_size=pp,
        ))
        outs = llm.generate(prompts, sp, use_tqdm=False)
        return (
            [o["token_ids"] for o in outs],
            llm.model_runner.attn_backend.kernel_traces
            if impl != "xla" else None,
        )

    ref, _ = run("xla", 1, 1)
    got, traces = run("pallas_interpret", 2, 2)
    assert traces["prefill"] > 0 and traces["decode"] > 0, traces
    assert got == ref


def test_pp_pure_pallas_direct(ckpt128):
    """Pure-pp mesh (tp=1): the backend has no dp/sp/ep/tp axis to
    partition, so kernels are called directly on pp-local data inside
    the pipeline body."""
    ref = run_tokens(ckpt128)
    traces = {}
    got = run_tokens(
        ckpt128, pp=2, impl="pallas_interpret", kernel_traces=traces
    )
    assert got == ref
    assert traces.get("decode", 0) > 0


def test_pp_requires_divisible_layers(ckpt):
    cfg = Config(
        model=str(ckpt), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
        pipeline_parallel_size=8,
    )
    with pytest.raises(ValueError, match="not divisible"):
        ModelRunner(cfg, mesh=make_mesh(1, pp_size=8))


def test_pp_gemma2_alternating_windows(tmp_path):
    """Gemma2's sliding/full alternation is keyed on the GLOBAL layer
    index: with one layer per stage, stage 1 must see the full-attention
    window of global layer 1, not stage-local layer 0's sliding window."""
    ckpt = make_tiny_checkpoint(
        "gemma2", tmp_path / "g2",
        num_attention_heads=8, num_key_value_heads=8, head_dim=16,
        hidden_size=64, sliding_window=8,
    )
    ref = run_tokens(ckpt)
    assert run_tokens(ckpt, pp=2) == ref


def test_pp_adaptive_microbatches_large_batch(ckpt):
    """A 32-row decode batch raises the adaptive microbatch count above
    the stage count (bubble shrinks (P-1)/(M+P-1)); outputs must still
    match single-device execution exactly."""

    def run(pp):
        cfg = Config(
            model=str(ckpt), max_num_seqs=32, max_model_len=64,
            max_num_batched_tokens=2048, kvcache_block_size=16,
            num_kvcache_blocks=128, dtype="float32", attention_impl="xla",
            pipeline_parallel_size=pp,
        )
        mesh = make_mesh(1, pp_size=pp) if pp > 1 else None
        runner = ModelRunner(cfg, mesh=mesh)
        seqs = [
            Sequence([1 + (i % 50), 3 + i % 7, 9], SamplingParams(temperature=0.0),
                     block_size=16)
            for i in range(32)
        ]
        for i, s in enumerate(seqs):
            s.block_table = [i]
        out = [runner.run(seqs, is_prefill=True)]
        for t, s in zip(out[-1], seqs):
            s.append_token(int(t))
        for _ in range(2):
            out.append(runner.run(seqs, is_prefill=False))
            for t, s in zip(out[-1], seqs):
                s.append_token(int(t))
        return out

    assert run(2) == run(1)

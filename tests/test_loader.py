"""Checkpoint loader tests (reference analog: tests/test_loaders.py —
safetensors + .bin iteration, multi-file shards, dtype handling, model-dir
resolution)."""

import numpy as np
import pytest

from minivllm_tpu.utils.loader import (
    iter_checkpoint_weights,
    load_model_params,
    resolve_model_dir,
)
from minivllm_tpu.utils.testing import make_tiny_checkpoint


def _write_safetensors(path, tensors):
    from safetensors.numpy import save_file

    save_file(tensors, str(path))


def test_safetensors_roundtrip(tmp_path):
    tensors = {
        "a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b.bias": np.ones(5, np.float32),
    }
    _write_safetensors(tmp_path / "model.safetensors", tensors)
    got = dict(iter_checkpoint_weights(tmp_path))
    assert set(got) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def test_multi_file_shards_all_yielded(tmp_path):
    """HF checkpoints shard tensors across model-0000x-of-0000y files; every
    shard must be iterated (reference: loader.py:188-214)."""
    _write_safetensors(
        tmp_path / "model-00001-of-00002.safetensors",
        {"x": np.zeros(2, np.float32)},
    )
    _write_safetensors(
        tmp_path / "model-00002-of-00002.safetensors",
        {"y": np.ones(3, np.float32)},
    )
    got = dict(iter_checkpoint_weights(tmp_path))
    assert set(got) == {"x", "y"}


def test_bin_fallback(tmp_path):
    torch = pytest.importorskip("torch")
    state = {"w": torch.arange(6, dtype=torch.float32).reshape(2, 3)}
    torch.save(state, tmp_path / "pytorch_model.bin")
    got = dict(iter_checkpoint_weights(tmp_path))
    np.testing.assert_array_equal(got["w"], state["w"].numpy())


def test_bf16_safetensors_loaded_via_torch(tmp_path):
    """bf16 tensors (the common LLM checkpoint dtype) must load with values
    intact; numpy has no bf16, so the loader round-trips through torch."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    w = torch.randn(4, 4, dtype=torch.float32)
    save_file({"w": w.to(torch.bfloat16)}, str(tmp_path / "model.safetensors"))

    class Recorder:
        def load_weights(self, weights):
            return dict(weights)

    got = load_model_params(Recorder(), tmp_path)
    np.testing.assert_allclose(
        got["w"], w.to(torch.bfloat16).to(torch.float32).numpy()
    )


def test_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        list(iter_checkpoint_weights(tmp_path))


def test_resolve_local_dir(tmp_path):
    assert resolve_model_dir(str(tmp_path)) == tmp_path


def test_resolve_missing_model_raises():
    with pytest.raises(FileNotFoundError):
        resolve_model_dir("/nonexistent/not-a-model-dir")


def test_full_model_load_shapes_and_fusion(tmp_path):
    """End-to-end: tiny HF checkpoint -> model.load_weights assembles the
    transposed/stacked parameter pytree (packed q/k/v + gate/up fusion,
    reference mapping: qwen_base.py:326-388)."""
    import jax
    import jax.numpy as jnp

    from minivllm_tpu.config import Config
    from minivllm_tpu.models.registry import create_model

    make_tiny_checkpoint("qwen3", tmp_path)
    cfg = Config(model=str(tmp_path))
    model = create_model(cfg.hf_config, jnp.float32, "xla")
    params = load_model_params(model, tmp_path)
    # every leaf finite and correctly dtyped
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    shapes = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    loaded_paths = jax.tree_util.tree_structure(params)
    assert jax.tree_util.tree_structure(shapes) == loaded_paths
    for got, want in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(shapes)
    ):
        assert got.shape == want.shape, (got.shape, want.shape)

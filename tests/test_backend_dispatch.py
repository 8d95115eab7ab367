"""Attention-backend dispatch tests (reference analog: tests/test_npu_backend.py
/ test_npu_attention.py — which kernel handles which case, and fallback
behavior). Here selection is static at trace time instead of runtime
try/except."""

import jax.numpy as jnp
import pytest

from minivllm_tpu.ops.attention import make_quantized_cache
from minivllm_tpu.ops.backend import (
    PallasAttentionBackend,
    XlaAttentionBackend,
    make_backend,
)
from minivllm_tpu.ops.pallas import decode_attention as pdec
from minivllm_tpu.ops.pallas import prefill_attention as ppre


def test_make_backend_names():
    assert isinstance(make_backend("xla", 16), XlaAttentionBackend)
    assert isinstance(make_backend("pallas", 16), PallasAttentionBackend)
    with pytest.raises(ValueError):
        make_backend("triton", 16)


@pytest.mark.parametrize("mod", [pdec, ppre])
def test_kernel_support_gates(mod):
    # d must be a multiple of 128 (MXU lane width)
    assert not mod.is_supported(jnp.zeros((2, 4, 64)), jnp.zeros((32, 2, 64)))
    # h must fold into kvh groups
    assert not mod.is_supported(jnp.zeros((2, 3, 128)), jnp.zeros((32, 2, 128)))
    assert mod.is_supported(jnp.zeros((2, 4, 128)), jnp.zeros((32, 2, 128)))
    # quantized caches are supported (block-slabbed scales)
    qc = make_quantized_cache(64, 2, 128, 16)
    assert mod.is_supported(jnp.zeros((2, 4, 128)), qc, 16)


def test_pallas_backend_falls_back_to_oracle(monkeypatch):
    """Unsupported shapes route to the XLA oracle (the reference's
    SDPA-fallback analog, attention.py:157-173) — selection is static."""
    backend = PallasAttentionBackend(16)
    called = {}

    def fake_decode(q, k, v, meta, scale, block_size, base=0,
                    window=None, softcap=None):
        called["oracle"] = True
        return q

    import minivllm_tpu.ops.attention as A

    monkeypatch.setattr(A, "decode_attention_xla", fake_decode)
    # d=64: unsupported by the kernel -> oracle
    q = jnp.zeros((1, 2, 64))
    backend.decode(q, jnp.zeros((32, 2, 64)), jnp.zeros((32, 2, 64)),
                   meta=None, scale=1.0)
    assert called.get("oracle")

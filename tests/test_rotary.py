"""RoPE property tests (reference analog: tests/test_rotary_embedding.py —
relative-position dependence, norm preservation, linear/dynamic scaling)."""

import numpy as np
import jax.numpy as jnp

from minivllm_tpu.ops.rotary import apply_rope, compute_cos_sin

HEAD_DIM = 32
THETA = 10000.0


def _rope(x, positions, **kw):
    cos, sin = compute_cos_sin(jnp.asarray(positions), HEAD_DIM, THETA, **kw)
    return np.asarray(apply_rope(jnp.asarray(x, jnp.float32), cos, sin))


def test_matches_hf_rotate_half():
    """Same convention as HF Qwen/Llama: rotate_half with concatenated
    halves (q * cos + rotate_half(q) * sin)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 2, HEAD_DIM)).astype(np.float32)
    pos = np.arange(5)
    inv_freq = 1.0 / THETA ** (np.arange(0, HEAD_DIM, 2) / HEAD_DIM)
    ang = pos[:, None] * inv_freq  # (5, half)
    cos = np.concatenate([np.cos(ang)] * 2, -1)[:, None, :]
    sin = np.concatenate([np.sin(ang)] * 2, -1)[:, None, :]
    half = HEAD_DIM // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], -1)
    want = x * cos + rot * sin
    np.testing.assert_allclose(_rope(x, pos), want, atol=1e-5)


def test_relative_position_property():
    """q(m)·k(n) depends only on m-n (the defining RoPE property,
    reference: test_rotary_embedding.py relative-position tests)."""
    rng = np.random.default_rng(1)
    q = rng.normal(size=(1, 1, HEAD_DIM)).astype(np.float32)
    k = rng.normal(size=(1, 1, HEAD_DIM)).astype(np.float32)

    def score(m, n):
        qm = _rope(q, [m])[0, 0]
        kn = _rope(k, [n])[0, 0]
        return float(qm @ kn)

    assert abs(score(5, 3) - score(105, 103)) < 1e-3
    assert abs(score(17, 0) - score(517, 500)) < 1e-3


def test_norm_preserved():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(7, 3, HEAD_DIM)).astype(np.float32)
    y = _rope(x, np.arange(7) * 13)
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
    )


def test_position_zero_is_identity():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 2, HEAD_DIM)).astype(np.float32)
    np.testing.assert_allclose(_rope(x, [0]), x, atol=1e-6)


def test_linear_scaling_compresses_positions():
    """linear scaling with factor f rotates position p like p/f
    (reference: rotary_embedding.py:132-140)."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 1, HEAD_DIM)).astype(np.float32)
    scaled = _rope(x, [8], scaling_type="linear", scaling_factor=4.0)
    plain = _rope(x, [2])
    np.testing.assert_allclose(scaled, plain, atol=1e-5)


def test_dynamic_ntk_lowers_frequencies():
    """dynamic NTK scaling increases the base, so high-frequency dims
    rotate more slowly than unscaled RoPE at the same position."""
    # small position so all compared angles stay below pi (arctan2 wraps)
    pos = jnp.asarray([2])
    cos0, sin0 = compute_cos_sin(pos, HEAD_DIM, THETA)
    cos1, sin1 = compute_cos_sin(
        pos, HEAD_DIM, THETA, scaling_type="dynamic", scaling_factor=4.0,
        max_position_embeddings=128,
    )
    ang0 = np.arctan2(np.asarray(sin0), np.asarray(cos0))
    ang1 = np.arctan2(np.asarray(sin1), np.asarray(cos1))
    # dim 0 (frequency 1) is unaffected; every later dim slows down
    np.testing.assert_allclose(ang0[..., 0], ang1[..., 0], atol=1e-6)
    assert np.all(np.abs(ang1[..., 1:4]) < np.abs(ang0[..., 1:4]))


def test_batched_positions_shapes():
    cos, sin = compute_cos_sin(jnp.zeros((3, 5), jnp.int32), HEAD_DIM, THETA)
    assert cos.shape == (3, 5, HEAD_DIM // 2)
    x = jnp.ones((3, 5, 4, HEAD_DIM))
    assert apply_rope(x, cos, sin).shape == x.shape


def _hf_inv_freq(rope_type, rope_scaling, theta, head_dim, max_pos):
    """inv_freq + attention scaling from transformers' rope utils —
    the ground truth for the llama3/yarn frequency math."""
    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    cfg = LlamaConfig(
        rope_theta=theta,
        hidden_size=head_dim * 4,
        num_attention_heads=4,
        head_dim=head_dim,
        max_position_embeddings=max_pos,
        rope_scaling=rope_scaling,
    )
    inv_freq, attn = ROPE_INIT_FUNCTIONS[rope_type](cfg, device="cpu")
    return np.asarray(inv_freq), attn


def _angles(cos, sin):
    return np.arctan2(np.asarray(sin), np.asarray(cos))


def test_llama3_scaling_matches_transformers():
    scaling = {
        "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
        "high_freq_factor": 4.0, "original_max_position_embeddings": 256,
    }
    inv_freq, attn = _hf_inv_freq("llama3", scaling, THETA, HEAD_DIM, 2048)
    assert attn == 1.0
    pos = jnp.asarray([1])
    cos, sin = compute_cos_sin(
        pos, HEAD_DIM, THETA, "llama3", 8.0, 2048, scaling
    )
    # at position 1 (angles < pi) the angle IS the inv_freq
    np.testing.assert_allclose(
        _angles(cos, sin)[0], inv_freq, rtol=1e-6, atol=1e-8
    )


def test_yarn_scaling_matches_transformers():
    scaling = {
        "rope_type": "yarn", "factor": 4.0, "beta_fast": 32.0,
        "beta_slow": 1.0, "original_max_position_embeddings": 256,
    }
    inv_freq, attn = _hf_inv_freq("yarn", scaling, THETA, HEAD_DIM, 1024)
    pos = jnp.asarray([1])
    cos, sin = compute_cos_sin(
        pos, HEAD_DIM, THETA, "yarn", 4.0, 1024, scaling
    )
    c, s = np.asarray(cos)[0], np.asarray(sin)[0]
    # cos/sin carry the yarn attention factor; recover angle and magnitude
    np.testing.assert_allclose(np.hypot(c, s), attn, rtol=1e-5)
    np.testing.assert_allclose(
        np.arctan2(s, c), inv_freq, rtol=1e-5, atol=1e-7
    )


def test_yarn_correction_clamp_matches_transformers():
    """The correction-range upper clamp is head_dim - 1 (not half - 1):
    binding case where the slow-beta band edge lands past half."""
    scaling = {
        "rope_type": "yarn", "factor": 8.0,
        "original_max_position_embeddings": 65536,
    }
    inv_freq, attn = _hf_inv_freq("yarn", scaling, THETA, HEAD_DIM, 262144)
    cos, sin = compute_cos_sin(
        jnp.asarray([1]), HEAD_DIM, THETA, "yarn", 8.0, 262144, scaling
    )
    c, s = np.asarray(cos)[0], np.asarray(sin)[0]
    np.testing.assert_allclose(np.hypot(c, s), attn, rtol=1e-5)
    np.testing.assert_allclose(
        np.arctan2(s, c), inv_freq, rtol=1e-5, atol=1e-7
    )

"""Shared model utilities: stacked-parameter assembly and weight collection.

Models store per-layer parameters stacked along a leading layer axis so the
forward pass is a single `lax.scan` over layers — one layer traced/compiled
once regardless of depth (the TPU-idiomatic replacement for the
reference's Python module list, qwen_base.py:301-323).
"""

from __future__ import annotations

import re
from typing import Callable

import jax.numpy as jnp
import numpy as np

__all__ = ["WeightCollector", "init_linear", "init_norm", "mask_pad_logits"]


def mask_pad_logits(logits: jnp.ndarray, vocab_size: int) -> jnp.ndarray:
    """Set logits of vocab-padding columns to -inf so they are never
    sampled (vocab is padded to a TP/lane-friendly multiple)."""
    if logits.shape[-1] == vocab_size:
        return logits
    col = jnp.arange(logits.shape[-1], dtype=jnp.int32)
    return jnp.where(
        col[None, :] < vocab_size, logits, jnp.finfo(jnp.float32).min
    )


class WeightCollector:
    """Accumulates HF checkpoint tensors into stacked JAX param pytrees.

    Rules map an HF parameter-name regex to a (params-path, transform).
    A `{L}` placeholder in the pattern captures the layer index; matching
    tensors land in a stacked (num_layers, ...) buffer. A second `{E}`
    placeholder (MoE expert index) stacks into (num_layers, num_experts,
    ...).
    """

    def __init__(self, num_layers: int, dtype, num_experts: int = 0) -> None:
        self.num_layers = num_layers
        self.num_experts = num_experts
        self.dtype = dtype
        self._rules: list[tuple[re.Pattern, tuple[str, ...], Callable]] = []
        self._store: dict[tuple[str, ...], object] = {}
        self._seen: set[str] = set()

    def rule(
        self,
        pattern: str,
        path: tuple[str, ...],
        transform: Callable[[np.ndarray], np.ndarray] | None = None,
    ) -> None:
        pattern = pattern.replace("{L}", r"(\d+)").replace("{E}", r"(\d+)")
        self._rules.append(
            (re.compile(pattern + "$"), path, transform or (lambda x: x))
        )

    def add(self, name: str, tensor: np.ndarray) -> bool:
        """Route one checkpoint tensor. Returns False if no rule matches."""
        for pat, path, transform in self._rules:
            m = pat.match(name)
            if not m:
                continue
            t = np.asarray(transform(tensor))
            if len(m.groups()) == 2:  # {L} then {E} (HF order: layer, expert)
                layer, expert = int(m.group(1)), int(m.group(2))
                if path not in self._store:
                    self._store[path] = np.zeros(
                        (self.num_layers, self.num_experts, *t.shape),
                        dtype=t.dtype,
                    )
                self._store[path][layer, expert] = t
            elif m.groups():
                layer = int(m.group(1))
                if path not in self._store:
                    self._store[path] = np.zeros(
                        (self.num_layers, *t.shape), dtype=t.dtype
                    )
                self._store[path][layer] = t
            else:
                self._store[path] = t
            self._seen.add(name)
            return True
        return False

    def build(self) -> dict:
        """Nested params dict of jnp arrays in the model dtype."""
        params: dict = {}
        for path, arr in self._store.items():
            node = params
            for key in path[:-1]:
                node = node.setdefault(key, {})
            node[path[-1]] = jnp.asarray(arr, dtype=self.dtype)
        return params


def init_linear(rng, in_dim: int, out_dim: int, dtype, stack: int | None = None):
    import jax

    shape = (in_dim, out_dim) if stack is None else (stack, in_dim, out_dim)
    return (jax.random.normal(rng, shape, dtype=jnp.float32) * 0.02).astype(dtype)


def init_norm(dim: int, dtype, stack: int | None = None):
    shape = (dim,) if stack is None else (stack, dim)
    return jnp.ones(shape, dtype=dtype)

"""Shared example plumbing: model resolution that works offline.

Every example accepts --model PATH (or env MINIVLLM_TPU_MODEL); without
one, a tiny random checkpoint of the requested family is generated
locally so the examples run in air-gapped environments.
"""

from __future__ import annotations

import argparse
import os
import tempfile


def resolve_model(args_model: str | None, family: str = "qwen3", **overrides) -> str:
    model = args_model or os.environ.get("MINIVLLM_TPU_MODEL")
    if model:
        return model
    from minivllm_tpu.utils.testing import make_tiny_checkpoint

    path = tempfile.mkdtemp(prefix=f"minivllm-{family}-")
    make_tiny_checkpoint(family, path, **overrides)
    print(f"[example] no model given; using tiny random {family} at {path}")
    return path


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--model", default=None, help="model dir or HF id")
    p.add_argument("--max-tokens", type=int, default=32)
    return p

"""Checkpoint loading.

Counterpart of the reference loader
(/root/reference/minivllm/utils/loader.py:122-239): resolves a local dir
(or HF hub snapshot when available), iterates *.safetensors / *.bin
tensors as numpy, and hands them to the model's `load_weights`, which
assembles sharded/stacked JAX arrays. Safetensors are memory-mapped and
copied tensor-by-tensor, so peak host memory stays ~one tensor above the
final params size.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator

import numpy as np

__all__ = ["resolve_model_dir", "iter_checkpoint_weights", "load_model_params"]


def resolve_model_dir(model: str) -> Path:
    """Local directory, or HF-hub snapshot download as a fallback
    (reference: loader.py:148-186)."""
    p = Path(model)
    if p.is_dir():
        return p
    try:
        from huggingface_hub import snapshot_download

        return Path(
            snapshot_download(
                model, allow_patterns=["*.safetensors", "*.bin", "*.json", "*.txt"]
            )
        )
    except Exception as e:
        raise FileNotFoundError(
            f"model {model!r} is not a local directory and could not be "
            f"downloaded: {e}"
        ) from e


def _torch_to_numpy(t) -> np.ndarray:
    import torch

    if t.dtype == torch.bfloat16:
        # numpy has no bf16: round-trip through float32.
        return t.to(torch.float32).numpy()
    return t.numpy()


def iter_checkpoint_weights(model_dir: str | Path) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (name, numpy array) for every tensor in the checkpoint."""
    model_dir = Path(model_dir)
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(str(f), framework="numpy") as reader:
                for name in reader.keys():
                    try:
                        yield name, reader.get_tensor(name)
                    except TypeError:
                        # bf16 tensors: numpy framework can't represent them
                        pass
        return
    bin_files = sorted(model_dir.glob("*.bin"))
    if not bin_files:
        raise FileNotFoundError(f"no *.safetensors or *.bin under {model_dir}")
    import torch

    for f in bin_files:
        state = torch.load(str(f), map_location="cpu", weights_only=True)
        for name, t in state.items():
            yield name, _torch_to_numpy(t)


def _iter_safetensors_bf16_aware(model_dir: Path) -> Iterator[tuple[str, np.ndarray]]:
    """Safetensors iteration that handles bf16 via torch."""
    from safetensors import safe_open

    for f in sorted(model_dir.glob("*.safetensors")):
        with safe_open(str(f), framework="pt") as reader:
            for name in reader.keys():
                yield name, _torch_to_numpy(reader.get_tensor(name))


def load_model_params(model, model_dir: str | Path) -> dict:
    """Load checkpoint tensors into the model's parameter pytree."""
    model_dir = Path(model_dir)
    if sorted(model_dir.glob("*.safetensors")):
        weights = _iter_safetensors_bf16_aware(model_dir)
    else:
        weights = iter_checkpoint_weights(model_dir)
    return model.load_weights(weights)

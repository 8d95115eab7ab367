"""Platform/device introspection.

Counterpart of the reference device abstraction
(/root/reference/minivllm/utils/device.py:30-341). JAX's PJRT layer does
the heavy lifting the reference had to hand-roll for 7 torch device types;
what remains useful at this layer: backend detection with an env override,
HBM introspection for KV-cache sizing, and capability queries.

Env:
  MINIVLLM_TPU_DEVICE  — force a jax platform ("tpu", "cpu", ...), the
                         analog of the reference's MINIVLLM_DEVICE.
"""

from __future__ import annotations

import os

__all__ = [
    "get_backend",
    "is_tpu",
    "device_count",
    "memory_info",
    "supports_bucketed_compilation",
    "describe_devices",
]


def _apply_override() -> None:
    override = os.environ.get("MINIVLLM_TPU_DEVICE")
    if override:
        import jax

        try:
            jax.config.update("jax_platforms", override)
        except Exception:
            pass


def get_backend() -> str:
    _apply_override()
    import jax

    return jax.default_backend()


def is_tpu() -> bool:
    return get_backend() not in ("cpu", "gpu", "cuda", "rocm")


def device_count() -> int:
    import jax

    return len(jax.devices())


def memory_info(device=None) -> dict:
    """{"bytes_limit": int|None, "bytes_in_use": int|None} for one device
    (reference: device.py:179-218)."""
    import jax

    dev = device if device is not None else jax.devices()[0]
    stats = dev.memory_stats() or {}
    return {
        "bytes_limit": stats.get("bytes_limit")
        or stats.get("bytes_reservable_limit"),
        "bytes_in_use": stats.get("bytes_in_use"),
    }


def supports_bucketed_compilation() -> bool:
    """Always true under XLA — the analog of the reference's
    supports_cuda_graph gate (device.py:221-228) has no failure mode here."""
    return True


def describe_devices() -> list[str]:
    import jax

    return [f"{d.platform}:{d.id} ({d.device_kind})" for d in jax.devices()]

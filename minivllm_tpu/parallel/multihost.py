"""Multi-host serving support.

Beyond the reference (which hardcodes single-node 127.0.0.1,
/root/reference/minivllm/engine/llm_engine.py:83-90): on a TPU pod slice,
one Python process runs per host, `jax.distributed.initialize` wires the
processes, and a 2D ("dcn", "tp") mesh places tensor-parallel shards so
the per-layer all-reduces ride ICI within a host while only the
data-parallel/replication axis crosses DCN.

Engine determinism across hosts: every host runs the identical scheduler
on identical inputs, and sampling keys derive from config.seed + a step
counter, so all hosts sample identical tokens without any broadcast (the
SPMD analog of the reference's pickled command broadcast, SURVEY.md §2.3).
Feeding identical requests to every host is the caller's contract —
`requests_synchronized()` documents and asserts it where checkable.
"""

from __future__ import annotations

import numpy as np

__all__ = ["initialize_multihost", "make_pod_mesh"]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed. On Cloud TPU pods all arguments are
    auto-detected from the metadata server; set them explicitly elsewhere."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_pod_mesh(tp_size: int | None = None, ep_size: int = 1, pp_size: int = 1):
    """Mesh over all devices of a (possibly multi-host) slice.

    Axes: ("dcn", "pp", "dp", "sp", "ep", "tp") — the same engine axes as
    parallel/sharding.make_mesh plus a leading "dcn" axis spanning hosts.
    tp_size defaults to the per-host device count so tensor-parallel
    collectives stay on ICI. "dcn" replicates (data-parallel serving —
    each host group serves its own requests) unless the caller shards it;
    pp_size places pipeline stages across host groups, the natural layout
    when a model exceeds one host's HBM (stage hand-offs are point-to-point
    and tolerate DCN latency far better than tp's all-reduces).
    """
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    if tp_size is None:
        tp_size = max(1, jax.local_device_count())
    group = tp_size * ep_size * pp_size
    if len(devices) % group:
        raise ValueError(
            f"device count {len(devices)} not divisible by "
            f"tp_size*ep_size*pp_size = {group}"
        )
    grid = devices.reshape(len(devices) // group, pp_size, 1, 1, ep_size, tp_size)
    return Mesh(grid, ("dcn", "pp", "dp", "sp", "ep", "tp"))

"""Multi-host serving support.

Beyond the reference (which hardcodes single-node 127.0.0.1,
/root/reference/minivllm/engine/llm_engine.py:83-90): on a TPU pod slice,
one Python process runs per host, `jax.distributed.initialize` wires the
processes, and a ("dcn", "pp", "dp", "sp", "ep", "tp") mesh places
tensor-parallel shards so the per-layer all-reduces ride ICI within a
host while only pipeline hand-offs / replication cross DCN.

Engine determinism across hosts: every host runs the identical scheduler
on identical inputs, and sampling keys derive from config.seed + a step
counter, so all hosts sample identical tokens without any broadcast (the
SPMD analog of the reference's pickled command broadcast, SURVEY.md
§2.3). Feeding identical requests to every host is the caller's
contract; `requests_synchronized()` verifies it on demand (an allgather
of a request-stream digest) — call it at batch boundaries in staging,
drop it in steady-state production.

Launch recipe (v5e-16, 2 hosts x 8 chips):
    # on every host, same command, same request feed:
    python -m minivllm_tpu.server --model MODEL \
        --multihost --tensor-parallel-size 8 --pipeline-parallel-size 2
On Cloud TPU the coordinator is auto-detected from the metadata server;
elsewhere pass --coordinator-address HOST:PORT --num-processes N
--process-id I explicitly. The same flags exist on Config
(multihost/coordinator_address/num_processes/process_id) for library
use; tests/test_multihost.py runs the two-process CPU integration of
exactly this path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["initialize_multihost", "make_pod_mesh", "requests_synchronized"]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (idempotent). On Cloud TPU pods all
    arguments are auto-detected from the metadata server; set them
    explicitly elsewhere (e.g. the CPU integration test)."""
    import jax

    # Public idempotency check where available (jax >= 0.4.34); else
    # fall back to catching the already-initialized RuntimeError rather
    # than reading jax._src.distributed internals.
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None and is_init():
        return  # already initialized (idempotent re-entry)
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise


def make_pod_mesh(
    tp_size: int | None = None,
    ep_size: int = 1,
    pp_size: int = 1,
    dp_size: int = 1,
    sp_size: int = 1,
):
    """Mesh over all devices of a (possibly multi-host) slice.

    Axes: ("dcn", "pp", "dp", "sp", "ep", "tp") — the same engine axes as
    parallel/sharding.make_mesh plus a leading "dcn" axis spanning hosts.
    tp_size defaults to the per-host device count so tensor-parallel
    collectives stay on ICI. "dcn" replicates (every host computes the
    full replica — the determinism contract above) unless the caller
    shards it; pp_size places pipeline stages across host groups, the
    natural layout when a model exceeds one host's HBM (stage hand-offs
    are point-to-point and tolerate DCN latency far better than tp's
    all-reduces). To scale request throughput across hosts, run
    independent engines behind a load balancer instead of sharding dcn.
    """
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    if tp_size is None:
        tp_size = max(1, jax.local_device_count())
    group = tp_size * ep_size * pp_size * dp_size * sp_size
    if len(devices) % group:
        raise ValueError(
            f"device count {len(devices)} not divisible by "
            f"tp*ep*pp*dp*sp = {group}"
        )
    grid = devices.reshape(
        len(devices) // group, pp_size, dp_size, sp_size, ep_size, tp_size
    )
    return Mesh(grid, ("dcn", "pp", "dp", "sp", "ep", "tp"))


def requests_synchronized(payload) -> bool:
    """Verify every host enqueued the identical request stream.

    `payload` is any picklable description of the host's pending
    requests (e.g. a list of (prompt_token_ids, sampling_params dict)
    tuples, in arrival order). Allgathers a 64-bit digest across
    processes and compares — cheap enough for batch boundaries, not
    meant for per-step use. Single-process: trivially True.
    """
    import jax

    if jax.process_count() == 1:
        return True
    import hashlib
    import pickle

    from jax.experimental import multihost_utils

    digest = np.frombuffer(
        hashlib.sha256(
            pickle.dumps(payload, protocol=4)
        ).digest()[:8],
        dtype=np.uint64,
    )
    gathered = multihost_utils.process_allgather(digest)
    return bool((gathered == gathered.reshape(-1)[0]).all())

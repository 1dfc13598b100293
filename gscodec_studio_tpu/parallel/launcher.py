"""Multi-host bring-up: the TPU-native equivalent of the reference's
process launcher (/root/reference/gsplat/distributed.py:304-360).

The reference spawns one CUDA process per GPU (single node) or maps
OpenMPI ranks to nodes (:323-329) and initializes a NCCL group. On TPU
the runtime already runs one process per HOST and every host sees only
its local chips; `jax.distributed.initialize()` wires the hosts into one
logical computation, after which `jax.devices()` is GLOBAL and the
ordinary `shard_map` mesh code (distributed.py / trainer mesh mode) works
unchanged — collectives ride ICI within a slice and DCN across slices.

Typical bring-ups:

  * **TPU pod slice** (GKE/GCE TPU VMs): run the SAME script on every
    host; call ``init_multihost()`` with no arguments — the TPU runtime
    carries coordinator/process topology in its metadata and JAX
    auto-detects everything.
  * **Explicit coordinator** (CPU fleets, custom clusters): pass
    ``coordinator_address="host0:9876"``, ``num_processes`` and this
    host's ``process_id`` (or export JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID and call with no arguments).

``cli(fn)`` mirrors the reference's ``cli(main)`` contract: initialize,
run ``fn(world_rank, world_size, local_devices)``, and always finalize
(the reference's barrier + destroy_process_group, :296-298).
"""

from __future__ import annotations

import os
from typing import Callable, Optional


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize cross-host JAX. No-op when already initialized or when
    running single-process with no coordinator configured."""
    import jax

    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes in (None, 1):
        # single-host run (or TPU-pod auto-detect handled by initialize()
        # when the TPU metadata is present)
        if jax.default_backend() in ("tpu",):
            try:
                jax.distributed.initialize()
            except Exception:
                pass  # not a pod slice; single host is fine
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def cli(fn: Callable, *args, **kwargs):
    """Initialize multi-host JAX, run ``fn(world_rank, world_size,
    local_devices, *args, **kwargs)``, always shut down cleanly."""
    import jax

    init_multihost()
    try:
        return fn(
            jax.process_index(), jax.process_count(), jax.local_devices(),
            *args, **kwargs,
        )
    finally:
        try:
            jax.distributed.shutdown()
        except Exception:
            pass


def make_global_mesh(axis: str = "gs"):
    """1-D mesh over EVERY device of every host (call after
    init_multihost). With the gaussian-sharded strategy, lay the single
    axis over all chips: the visibility all_to_all then rides ICI within
    each slice and DCN between slices — the same layout the reference's
    Grendel-style sharding uses across NVLink/IB."""
    import numpy as np
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))

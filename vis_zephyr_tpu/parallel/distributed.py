"""Multi-host (multi-process) runtime: initialization and global-batch
assembly.

The reference's multi-node story is the DeepSpeed launcher + NCCL
(`script/zero2.json`, SURVEY §2.2). TPU-native equivalent: one JAX process
per host, `jax.distributed.initialize` for the coordination service, a
hybrid mesh whose outermost axis ("dcn") spans hosts, and
`jax.make_array_from_process_local_data` to assemble the global batch from
per-host shards — XLA then emits DCN collectives only where the sharding
demands them (gradient all-reduce over the dcn axis; everything else rides
ICI).

Convention: the `dcn` axis is pure data parallelism (params replicated
across hosts, batch split). ZeRO-style parameter sharding stays on the
intra-host `fsdp` axis — parameter all-gathers are ICI-bandwidth-bound and
must not cross DCN.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ensure_initialized() -> bool:
    """Initialize `jax.distributed` from environment variables when a
    multi-process launch is requested; no-op (returns False) otherwise.

    Env contract (mirrors the launcher script `scripts/multihost_train.sh`):
      VZT_COORDINATOR   host:port of process 0
      VZT_NUM_PROCESSES total process count
      VZT_PROCESS_ID    this process's rank
    """
    coord = os.environ.get("VZT_COORDINATOR")
    if not coord:
        return False
    # Must NOT touch the backend (jax.devices/process_count) before
    # initialize — that would freeze a single-process runtime.
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["VZT_NUM_PROCESSES"]),
            process_id=int(os.environ["VZT_PROCESS_ID"]),
        )
    except RuntimeError as e:  # already initialized (idempotent callers)
        if "already" not in str(e).lower():
            raise
    return True


def process_batch_slice(global_batch: int) -> slice:
    """The half-open index range of the global batch this process loads.
    Each host materializes only its own samples (elastic data loading —
    the reference loads per-rank shards via the DeepSpeed sampler)."""
    n, i = jax.process_count(), jax.process_index()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} must divide by {n} processes")
    per = global_batch // n
    return slice(i * per, (i + 1) * per)


def agree_flag(local_flag: bool) -> bool:
    """Collective OR of a per-process bool — every process returns the same
    answer. Used for preemption: SIGTERM may land on only some hosts (or at
    different step boundaries), but `save_checkpoint` is a collective, so
    all hosts must enter the preemption save at the SAME step or the save
    hangs until hard eviction. Single-process: identity."""
    if jax.process_count() == 1:
        return bool(local_flag)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(bool(local_flag)))
    return bool(np.any(flags))


def make_global_batch(local_batch: Dict, mesh: Mesh) -> Dict:
    """Assemble per-process host arrays into global jax.Arrays sharded
    batch-first over the mesh's data axes. Single-process: equivalent to
    `sharding.shard_batch`."""
    from .sharding import batch_spec

    spec = batch_spec(mesh)

    def put(x):
        x = np.asarray(x)
        s = NamedSharding(mesh, P(*(list(spec) + [None] * (x.ndim - 1))))
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        return jax.make_array_from_process_local_data(s, x)

    return {k: put(v) for k, v in local_batch.items()}

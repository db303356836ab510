"""Multi-host (multi-slice / DCN) scaffolding.

Scaling past one TPU slice: each host runs this same SPMD program;
`jax.distributed` stitches the processes into one global device pool, the
mesh is laid out so the gradient all-reduce's ring stays on ICI within a
slice and only crosses DCN once per slice (data axis ordered
[dcn, ici]), and host-local batches are assembled into one global array with
`make_array_from_process_local_data`.

Single-process behavior degrades to the plain mesh (verified in tests); the
multi-process path follows the standard JAX recipe and activates when the
coordinator env vars are present.
"""
from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> bool:
    """Initialize jax.distributed from env vars when present.

    Uses COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID (or the standard
    cloud auto-detection when only COORDINATOR_ADDRESS is set).  Returns True
    if multi-process mode is active.
    """
    addr = os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return jax.process_count() > 1
    kwargs = {"coordinator_address": addr}
    if os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ.get("PROCESS_ID", "0"))
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def make_global_mesh(*, model_parallel: int = 1) -> Mesh:
    """('data','model') mesh over ALL processes' devices, ordered so that the
    data axis iterates devices within a slice first (ICI) and across slices
    second (DCN) — gradient reduction then rides ICI with one DCN hop."""
    devices = jax.devices()  # global list, process-major (slice-major)
    n = len(devices)
    assert n % model_parallel == 0
    dev_array = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(dev_array, axis_names=("data", "model"))


def global_batch_from_local(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Assemble per-process host batches into global arrays sharded over the
    'data' axis.  Each process supplies its local slice of the global batch
    (global batch size = local batch size × process_count)."""
    sharding = NamedSharding(mesh, P("data"))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }

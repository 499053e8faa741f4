"""Device mesh and sharding helpers.

The entire collective surface this workload requires is data parallelism
(SURVEY §2.4): the reference's single-process ``torch.nn.DataParallel``
(reference train.py:205, with replica-mean loss train.py:285) maps to ONE
``jax.sharding.Mesh(('data',))`` spanning ICI (and DCN across hosts): params
replicated, batch sharded, gradient all-reduce emitted by XLA from the jitted
global-view computation. No NCCL-style hand-written collectives are needed —
that is the point of the pjit design.

The mesh helpers are deliberately generic (n-D meshes, named axes) so future
model families can add 'model'/'pipe' axes without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Create a device mesh. Default: all devices on one 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh {shape} needs {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement (params, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch dict onto the mesh, sharded along the batch dim."""
    return jax.device_put(batch, batch_sharding(mesh, axis))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host (DCN) initialization.

    On a multi-host deployment each process calls this once before any jax
    API; afterwards ``make_mesh()`` spans every chip in the slice and the
    same global-view jitted step runs unchanged — gradient all-reduce rides
    ICI within a host and DCN across hosts, inserted by XLA. On TPU pods the
    arguments resolve automatically from the environment; pass them
    explicitly for CPU/GPU fleets. No-op when already initialized.

    NOTE: the already-initialized guard must be ``jax.distributed
    .is_initialized()`` — NOT ``jax.process_count()``, which initializes
    the local backend as a side effect and makes the subsequent
    ``jax.distributed.initialize`` raise ("must be called before any JAX
    computations"). That failure mode silently degraded an explicit
    2-process request to two 1-process runs until the multi-process smoke
    test (tests/test_multiprocess.py) caught it.
    """
    if jax.distributed.is_initialized():
        return
    try:
        kwargs = {}
        if coordinator_address is not None:
            kwargs = dict(coordinator_address=coordinator_address,
                          num_processes=num_processes, process_id=process_id)
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        if coordinator_address is not None:
            # the caller explicitly asked for a multi-process topology;
            # degrading to single-process here would silently train on a
            # fraction of the fleet — surface it instead.
            raise
        # auto-resolve found no cluster: single-process run (the common
        # local case).


def local_batch_slice(global_batch: int, mesh: Mesh, axis: str = "data"):
    """(start, size) of this process's shard of a globally sharded batch.

    Host data loading in multi-host DP: each process feeds only its
    addressable slice; jax.make_array_from_process_local_data assembles the
    global array.
    """
    n_shards = mesh.shape[axis]
    per = global_batch // n_shards
    local_devices = set(jax.local_devices())
    # contiguous run of mesh positions owned by this process
    positions = [i for i, d in enumerate(mesh.devices.reshape(-1))
                 if d in local_devices]
    return positions[0] * per, len(positions) * per

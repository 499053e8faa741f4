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

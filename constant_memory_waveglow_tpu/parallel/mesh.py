"""Device mesh and sharding helpers.

The reference's entire distributed surface is Lightning DDP over NCCL
(``train.py:77``, ``model/lightning.py:63-64``): gradient all-reduce, synced
metric means, rank broadcast of weights.  The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model`` axis for
channel sharding of the WN stacks), ``NamedSharding`` annotations on the batch
/ params, and XLA-inserted collectives over ICI — no hand-written comms.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_axis_size(batch_size: int, n_devices: int = None) -> int:
    """Largest device count <= n_devices that divides the global batch
    (reference keeps the global batch constant across world sizes,
    ``train.py:51-53``)."""
    if n_devices is None:
        n_devices = jax.device_count()
    n = min(n_devices, batch_size)
    while batch_size % n:
        n -= 1
    return max(n, 1)


def make_mesh(data: int = None, model: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'model') mesh.  Defaults: all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Place a host array on the mesh sharded along the leading (batch) axis."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (``jax.distributed.initialize``) — the TPU analog of
    Lightning's DDP process-group init.  No-op on a single host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)

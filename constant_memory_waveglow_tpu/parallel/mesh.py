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
    """Fully replicate a pytree (params / opt state) across the mesh.

    Multi-process: every process holds the full value (same seed / same
    restore on all ranks — the DDP weight-broadcast analog), and
    ``make_array_from_process_local_data`` builds the global replicated
    array; ``device_put`` would reject non-addressable devices.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    else:
        put = lambda x: jax.device_put(x, sharding)
    return jax.tree_util.tree_map(put, tree)


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_global_batch(mesh: Mesh, local_batch):
    """Assemble a globally-sharded batch from this process's local shard.

    Multi-host DP: every process loads ``global_batch // process_count``
    examples; ``jax.make_array_from_process_local_data`` stitches them into
    one global array sharded on the ``data`` axis, so the global batch stays
    invariant in world size (reference semantics ``train.py:51-53``).  On a
    single process this is equivalent to a sharded ``device_put``.
    """
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))

    return jax.tree_util.tree_map(put, local_batch)


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (``jax.distributed.initialize``) — the TPU analog of
    Lightning's DDP process-group init.  No-op on a single host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)

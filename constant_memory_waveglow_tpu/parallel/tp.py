"""Tensor-parallel sharding rules for WN-family stacks.

The reference never shards a model (everything fits on one GPU); the north
star for the TPU build keeps TP optional, "shard residual channels only if a
model exceeds one chip" (BASELINE.json).  These rules implement the classic
column/row-parallel pattern for each WN layer over the ``model`` mesh axis:

  * V / start / dilated W: output channels sharded (column-parallel) —
    the gated activation is then computed locally per shard,
  * W_o / end: input (contraction) channels sharded (row-parallel) —
    XLA inserts the psum over ``model`` at the layer boundary.

Applied as a pytree of ``NamedSharding`` matching the params structure; all
non-matching leaves stay replicated.  Composes with the ``data`` axis (batch
sharding) in the same mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path_keys, leaf):
    """Sharding spec for one param leaf based on its key path."""
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path_keys]
    ndim = getattr(leaf, "ndim", 0)
    # the scan-group layout stacks flows on a leading axis ("groups" subtree):
    # the channel axes shift right by one and the flow axis stays unsharded
    shift = 1 if "groups" in keys else 0

    def spec(*axes):
        full = [None] * shift + list(axes) + [None] * ndim
        return P(*full[:ndim])

    # only WN-stack weights are sharded; everything else stays replicated
    if any(k in keys for k in ("invconv1x1", "invconv", "upsampler", "pred",
                               "mu_embed", "angle_embed")):
        return P()
    # weight-norm g has shape [out, 1, ...]; raw weights [out, in, k]
    if "V" in keys or "start" in keys or "W" in keys:
        return spec("model")  # column-parallel: out channels sharded
    if "W_o" in keys or "end" in keys:
        if keys[-1] == "g":
            return spec(None)  # per-out-channel scale, out not sharded
        if ndim >= 2 + shift:
            return spec(None, "model")  # row-parallel: in channels sharded
    return P()


def wn_tensor_parallel_shardings(mesh: Mesh, params):
    """Pytree of NamedSharding for a params tree containing WN stacks."""
    def to_sharding(path, leaf):
        if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for_path(path, leaf))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params_tp(mesh: Mesh, params):
    """Place params on the mesh with TP shardings (replicated elsewhere)."""
    shardings = wn_tensor_parallel_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)

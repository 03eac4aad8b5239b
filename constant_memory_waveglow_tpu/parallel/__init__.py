from .mesh import make_mesh, shard_batch, replicate
from .tp import wn_tensor_parallel_shardings, shard_params_tp

__all__ = ["make_mesh", "shard_batch", "replicate",
           "wn_tensor_parallel_shardings", "shard_params_tp"]

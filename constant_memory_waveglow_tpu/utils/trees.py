"""Small pytree helpers."""

from __future__ import annotations

import jax
import numpy as np


def tree_size_bytes(tree) -> int:
    """Total bytes of all array leaves in a pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves if hasattr(l, "shape"))


def tree_param_count(tree) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(int(np.prod(l.shape)) for l in leaves if hasattr(l, "shape"))

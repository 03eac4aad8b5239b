"""Optimizer registry: config ``{"type": "Adam", "args": {...}}`` -> optax.

The reference instantiates any ``torch.optim.*`` class by reflection
(``model/lightning.py:41-44``).  Here a small registry maps the torch names
(with their torch argument conventions: ``lr``, ``betas``, ``eps``,
``weight_decay`` as *coupled* L2) onto optax gradient transforms.
"""

from __future__ import annotations

import optax

from ..utils.config import Registry

OPTIMIZER_REGISTRY = Registry("optimizer")


@OPTIMIZER_REGISTRY.register("Adam")
def adam(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    b1, b2 = betas
    chain = []
    if weight_decay:
        # torch.optim.Adam applies *coupled* L2: grad += wd * param, before
        # the Adam moment updates.
        chain.append(optax.add_decayed_weights(weight_decay))
    chain += [optax.scale_by_adam(b1=b1, b2=b2, eps=eps), optax.scale(-lr)]
    return optax.chain(*chain)


@OPTIMIZER_REGISTRY.register("AdamW")
def adamw(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2, **_):
    b1, b2 = betas
    return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)


@OPTIMIZER_REGISTRY.register("SGD")
def sgd(lr, momentum=0.0, weight_decay=0.0, nesterov=False, **_):
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.sgd(lr, momentum=momentum or None, nesterov=nesterov))
    return optax.chain(*chain)


def build_optimizer(config):
    from ..utils.config import get_instance

    return get_instance(OPTIMIZER_REGISTRY, config)

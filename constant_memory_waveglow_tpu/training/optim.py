"""Optimizer + LR-scheduler registries: torch-named configs -> optax.

The reference instantiates any ``torch.optim.*`` class by reflection
(``model/lightning.py:41-44``) and carries (legacy-schema) ``lr_scheduler``
blocks with ``torch.optim.lr_scheduler`` names
(``configs/musicnet_config.json``).  Here small registries map the torch
names (with their torch argument conventions: ``lr``, ``betas``, ``eps``,
``weight_decay`` as *coupled* L2; scheduler factors multiply the base lr,
stepped per optimization step) onto optax transforms / schedules.
"""

from __future__ import annotations

import numpy as np
import optax

from ..utils.config import Registry

OPTIMIZER_REGISTRY = Registry("optimizer")
SCHEDULER_REGISTRY = Registry("lr_scheduler")


# ------------------------------------------------------------- lr schedulers
# Each returns factor(step) -> multiplier on the base lr, matching the torch
# scheduler of the same name with one scheduler.step() per optimization step.

@SCHEDULER_REGISTRY.register("StepLR")
def step_lr(step_size, gamma=0.1, **_):
    return lambda step: gamma ** (step // step_size)


@SCHEDULER_REGISTRY.register("MultiStepLR")
def multi_step_lr(milestones, gamma=0.1, **_):
    ms = np.asarray(sorted(milestones))

    def factor(step):
        import jax.numpy as jnp

        return gamma ** jnp.sum(step >= jnp.asarray(ms))

    return factor


@SCHEDULER_REGISTRY.register("ExponentialLR")
def exponential_lr(gamma, **_):
    return lambda step: gamma ** step


def _compile_lr_lambda(expr):
    """Compile a config-carried lr_lambda.

    The reference passes any ``torch.optim.lr_scheduler`` class by
    reflection (``model/lightning.py:41-44``); ``LambdaLR``'s ``lr_lambda``
    is a callable, which a JSON config can only carry as source text.  We
    accept either ``"lambda step: ..."`` or a bare expression in ``step``
    (e.g. ``"0.95 ** (step // 1000)"``), evaluated with ``math`` plus
    ``min``/``max`` available.  Already-callable values pass through (for
    programmatic configs)."""
    if callable(expr):
        return expr
    import math

    ns = {"math": math, "min": min, "max": max, "__builtins__": {}}
    src = expr.strip()
    if not src.startswith("lambda"):
        src = "lambda step: " + src
    fn = eval(src, ns)  # noqa: S307 - config-author-supplied, sandboxed ns
    if not callable(fn):
        raise TypeError(f"lr_lambda {expr!r} did not evaluate to a callable")
    return fn


@SCHEDULER_REGISTRY.register("LambdaLR")
def lambda_lr(lr_lambda, **_):
    # torch semantics: factor = lr_lambda(step) multiplies the base lr.
    # NOTE: the factor must be traceable (jnp-compatible) — it runs inside
    # the jitted step with a traced step counter.
    return _compile_lr_lambda(lr_lambda)


@SCHEDULER_REGISTRY.register("MultiplicativeLR")
def multiplicative_lr(lr_lambda, **_):
    # torch multiplies factors cumulatively: lr_t = lr_0 * prod_{i<=t} f(i).
    # For the traceable-per-step form we support the closed form when f is
    # step-independent (f(step) == const): lr_t = lr_0 * f**step; otherwise
    # the cumulative product is not expressible as a pure function of step
    # and we reject it with a clear error.
    fn = _compile_lr_lambda(lr_lambda)
    f0, f1 = float(fn(0)), float(fn(1))
    if f0 != f1:
        raise ValueError(
            "MultiplicativeLR supports step-independent lr_lambda only "
            "(the cumulative product must have a closed form); use "
            "LambdaLR with an explicit formula instead")
    return lambda step: f0 ** step


@SCHEDULER_REGISTRY.register("ConstantLR")
def constant_lr(factor=1.0 / 3.0, total_iters=5, **_):
    def sched(step):
        import jax.numpy as jnp

        return jnp.where(step < total_iters, factor, 1.0)

    return sched


@SCHEDULER_REGISTRY.register("LinearLR")
def linear_lr(start_factor=1.0 / 3.0, end_factor=1.0, total_iters=5, **_):
    def sched(step):
        import jax.numpy as jnp

        t = jnp.minimum(step, total_iters) / total_iters
        return start_factor + (end_factor - start_factor) * t

    return sched


@SCHEDULER_REGISTRY.register("CosineAnnealingLR")
def cosine_annealing_lr(T_max, eta_min=0.0, **_):
    # factor relative to base lr; eta_min is absolute in torch, so callers
    # with eta_min should treat it as a fraction only if base lr == 1.  We
    # return the torch formula normalized by base lr at build time instead —
    # see build_optimizer, which closes over the base lr.
    def factor(step, base_lr=None):
        import jax.numpy as jnp

        # torch's closed-form CosineAnnealingLR is periodic: past T_max the
        # lr rises back from eta_min (no clamp), so resumed/long runs match
        cos = 0.5 * (1 + jnp.cos(jnp.pi * step / T_max))
        if base_lr:
            return (eta_min + (base_lr - eta_min) * cos) / base_lr
        return cos

    return factor


def build_lr_schedule(base_lr, scheduler_config=None):
    """Returns ``lr(step)`` (absolute learning rate)."""
    if not scheduler_config:
        return lambda step: base_lr
    from ..utils.config import get_instance

    factor = get_instance(SCHEDULER_REGISTRY, scheduler_config)
    if scheduler_config.get("type") == "CosineAnnealingLR":
        return lambda step: base_lr * factor(step, base_lr=base_lr)
    return lambda step: base_lr * factor(step)


# ----------------------------------------------------------------- optimizers

@OPTIMIZER_REGISTRY.register("Adam")
def adam(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    b1, b2 = betas
    chain = []
    if weight_decay:
        # torch.optim.Adam applies *coupled* L2: grad += wd * param, before
        # the Adam moment updates.
        chain.append(optax.add_decayed_weights(weight_decay))
    chain += [optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
              optax.scale_by_learning_rate(lr)]
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


@OPTIMIZER_REGISTRY.register("RMSprop")
def rmsprop(lr=1e-2, alpha=0.99, eps=1e-8, weight_decay=0.0, momentum=0.0,
            centered=False, **_):
    # torch.optim.RMSprop adds eps OUTSIDE the sqrt (update =
    # grad / (sqrt(sq_avg) + eps)) — optax's eps_in_sqrt=False matches.
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.rmsprop(lr, decay=alpha, eps=eps, centered=centered,
                               momentum=momentum or None, eps_in_sqrt=False))
    return optax.chain(*chain)


@OPTIMIZER_REGISTRY.register("Adagrad")
def adagrad(lr=1e-2, lr_decay=0.0, weight_decay=0.0,
            initial_accumulator_value=0.0, eps=1e-10, **_):
    # torch decays the EFFECTIVE lr by 1/(1 + step*lr_decay) (its `step`
    # counts from 0 on the first update); expressed here as an optax
    # schedule so the optimizer state stays a plain accumulator.
    if lr_decay:
        base = lr
        lr = lambda step: base / (1.0 + step * lr_decay)
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.adagrad(
        lr, initial_accumulator_value=initial_accumulator_value, eps=eps))
    return optax.chain(*chain)


@OPTIMIZER_REGISTRY.register("Adamax")
def adamax(lr=2e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    b1, b2 = betas
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.adamax(lr, b1=b1, b2=b2, eps=eps))
    return optax.chain(*chain)


def build_optimizer(config, scheduler_config=None, grad_clip=None):
    """Build the optax optimizer; with a scheduler config the ``lr`` argument
    becomes a per-step schedule (optax accepts callables wherever a fixed
    learning rate is accepted).  ``grad_clip`` prepends global-norm gradient
    clipping (the Lightning ``gradient_clip_val`` analog — optional here as
    there; flow losses occasionally spike on small datasets)."""
    from ..utils.config import get_instance

    if scheduler_config:
        config = dict(config)
        args = dict(config.get("args", {}))
        args["lr"] = build_lr_schedule(args.get("lr", 1e-3), scheduler_config)
        config["args"] = args
    opt = get_instance(OPTIMIZER_REGISTRY, config)
    if grad_clip:
        opt = optax.chain(optax.clip_by_global_norm(float(grad_clip)), opt)
    return opt

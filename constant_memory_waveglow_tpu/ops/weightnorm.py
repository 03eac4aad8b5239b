"""Weight normalization as an explicit functional reparameterization.

The reference wraps most convs in ``torch.nn.utils.weight_norm``
(``utils.py:9-16``, applied at e.g. ``model/waveglow.py:72,76,90``) and fuses
it away for inference (``inference.py:17``).  Here a weight-normed parameter is
simply the pytree ``{"v": ..., "g": ...}`` with ``w = g * v / ||v||`` (norm
taken over all dims except dim 0, per PyTorch's default ``dim=0``), and fusing
replaces it with ``{"w": ...}``.  ``wn_weight`` resolves either form, so model
code is agnostic to whether fusion has happened.
"""

from __future__ import annotations

import jax.numpy as jnp


def _norm(v):
    axes = tuple(range(1, v.ndim))
    return jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))


def wn_init(v):
    """Create a weight-norm param dict from an initial weight tensor.

    g is initialized to ||v|| so the effective weight equals v at init
    (PyTorch ``weight_norm`` semantics).
    """
    return {"v": v, "g": _norm(v)}


def wn_weight(p):
    """Resolve a maybe-weight-normed param ({'v','g'} or {'w'} or raw array).

    The normalization axes are inferred from ``g``'s broadcast shape (the
    axes where g has extent 1): for a per-conv param g is [out, 1, ...] —
    PyTorch's ``dim=0`` — and for a *flow-stacked* param ([n_flows, out, ...],
    the scan-group layout) g is [n, out, 1, ...], giving per-(flow, out)
    norms.  Both resolve correctly through the same rule.
    """
    if isinstance(p, dict):
        if "w" in p:
            return p["w"]
        v, g = p["v"], p["g"]
        axes = tuple(i for i, s in enumerate(g.shape) if s == 1)
        norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
        return g * v / norm
    return p


def resolve_large_weight_norms(params, min_elems=2 ** 21):
    """Pre-resolve {'v','g'} -> {'w'} for params with >= ``min_elems``
    weight elements, as *traced ops* inside the step.

    For giant weight-normed projections (WSRGlow's conditioner V:
    4096x3659 per flow, ~720 MB of master params) the per-pass norm
    recomputation is pathological: the forward, the custom_vjp backward's
    re-forward, and the gradient pass each re-normalize, and on TPU each
    recomputation forced a 240 MB/group layout round-trip into the reduce's
    preferred T(1,128) tiling (traced at ~8 ms/step of pure copies,
    round-5).  Resolving once per step makes the resolved weight an
    ordinary intermediate: the custom_vjp saves it with its other residuals
    instead of recomputing, and gradients to (v, g) flow through the
    resolution chain automatically.

    Size-gated because the resolved weights become params-sized *temp*
    buffers: for ordinary WN stacks (flagship V is 4096x80) the temp cost
    would show up in the peak-temp-by-flows constant-memory series for no
    measurable win, so only genuinely large projections are resolved.
    """

    def rec(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"v", "g"} and node["v"].size >= min_elems:
                return {"w": wn_weight(node)}
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(rec(v) for v in node)
        return node

    return rec(params)


def fuse_weight_norms(params):
    """Replace every {'v','g'} leaf-dict with the fused {'w'} form.

    The TPU analog of the reference's ``remove_weight_norms``
    (``utils.py:9-11``): done once before inference so the per-step
    normalization disappears from the compiled graph.
    """

    def rec(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"v", "g"}:
                return {"w": wn_weight(node)}
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(rec(v) for v in node)
        return node

    return rec(params)

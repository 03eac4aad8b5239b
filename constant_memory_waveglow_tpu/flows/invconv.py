"""Invertible 1x1 convolution with log-determinant.

TPU-native re-design of the reference ``InvertibleConv1x1`` and its
memory-efficient autograd Functions ``Conv1x1Func`` / ``InvConv1x1Func``
(``model/efficient_modules.py:17-54,215-279``).

Design notes
------------
* The conv is a [C, C] GEMM over the channel axis — ``dot_general`` onto the
  MXU, no conv primitive needed.
* log-determinant uses ``slogdet`` (log|det|), which is the correct
  change-of-variables term and never NaNs for negative determinants — this
  deliberately fixes the reference's "should fix nan logdet" comment
  (``model/efficient_modules.py:38-40``).
* The memory-efficient variants are ``jax.custom_vjp`` rules whose residuals
  are the *outputs*; the backward rule reconstructs the input by applying the
  inverse map (``x = W^{-1} z`` resp. ``z = W x``), the JAX analog of the
  reference freeing the input storage and re-materializing it in backward
  (``model/efficient_modules.py:235-237,268-269``).  Under XLA buffer liveness
  this means no extra activation is retained across the flow chain.

Gradient formulas (forward direction, ``z = W x``, ``ld = T * log|det W|``):
  dx = W^T dz
  dW = sum_{b,t} dz x^T + W^{-T} * dld * T          (Conv1x1Func.backward)
Reverse direction (``x = W^{-1} z``, ``ld = -T * log|det W|``):
  dz = W^{-T} dx
  dW = -W^{-T} dx x^T - W^{-T} * dld * T            (InvConv1x1Func.backward)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.convs import get_default_precision


def invconv_init(key, c, dtype=jnp.float32):
    """Orthogonal init via QR with det forced to +1 (``model/efficient_modules.py:22-26``)."""
    w = jax.random.normal(key, (c, c), dtype=jnp.float32)
    q, _ = jnp.linalg.qr(w)
    sign, _ = jnp.linalg.slogdet(q)
    q = q.at[:, 0].multiply(sign)  # flip first column if det < 0
    return {"W": q.astype(dtype)}


def _mix(w, x, precision=None):
    """[C_out, C_in] x [B, C_in, T] -> [B, C_out, T] on the MXU."""
    p = precision or get_default_precision()
    return lax.dot_general(w, x, (((1,), (1,)), ((), ())), precision=p).transpose(1, 0, 2)


def _logabsdet(w):
    """log|det W| computed in fp32 (TPU linalg supports only f32) and cast back."""
    _, ld = jnp.linalg.slogdet(w.astype(jnp.float32))
    return ld.astype(w.dtype)


def _inv(w):
    """Matrix inverse in fp32, cast back to the working dtype."""
    return jnp.linalg.inv(w.astype(jnp.float32)).astype(w.dtype)


def invconv_forward(params, x):
    """Naive forward: z = W x, logdet = T * log|det W|.  Differentiable by jax.grad."""
    w = params["W"]
    t = x.shape[-1]
    return _mix(w, x), t * _logabsdet(w)


def invconv_reverse(params, z):
    """Naive reverse: x = W^{-1} z, logdet = -T * log|det W|."""
    w = params["W"]
    t = z.shape[-1]
    x = _mix(_inv(w), z)  # conv with W^{-1}, as the reference does
    return x, -t * _logabsdet(w)


@jax.custom_vjp
def invconv_forward_efficient(params, x):
    return invconv_forward(params, x)


def _fwd_fwd(params, x):
    out = invconv_forward(params, x)
    z, _ = out
    return out, (params["W"], z)


def _fwd_bwd(res, cts):
    w, z = res
    dz, dld = cts
    # scheduling barrier: keep this flow's reconstruction tied to its
    # cotangent so XLA cannot hoist it (see coupling._f_bwd)
    z, dz = lax.optimization_barrier((z, dz))
    t = z.shape[-1]
    prec = get_default_precision()
    # reconstruct the input from the output (constant-memory trick)
    x = _mix(_inv(w), z)
    # dx = W^T dz
    dx = lax.dot_general(w, dz, (((0,), (1,)), ((), ())), precision=prec).transpose(1, 0, 2)
    # dW = sum_{b,t} dz x^T + W^{-T} dld T
    dw = lax.dot_general(dz, x, (((0, 2), (0, 2)), ((), ())), precision=prec)
    dw = dw + _inv(w).T * (dld * t)
    return {"W": dw}, dx


invconv_forward_efficient.defvjp(_fwd_fwd, _fwd_bwd)


@jax.custom_vjp
def invconv_reverse_efficient(params, z):
    return invconv_reverse(params, z)


def _rev_fwd(params, z):
    out = invconv_reverse(params, z)
    x, _ = out
    return out, (params["W"], x)


def _rev_bwd(res, cts):
    w, x = res
    dx, dld = cts
    x, dx = lax.optimization_barrier((x, dx))  # see coupling._f_bwd
    t = x.shape[-1]
    prec = get_default_precision()
    w_inv_t = _inv(w).T
    # dz = W^{-T} dx
    dz = lax.dot_general(w_inv_t, dx, (((1,), (1,)), ((), ())), precision=prec).transpose(1, 0, 2)
    # dW = -W^{-T} dx x^T - W^{-T} dld T = -dz x^T - W^{-T} dld T
    dw = -lax.dot_general(dz, x, (((0, 2), (0, 2)), ((), ())), precision=prec)
    dw = dw - w_inv_t * (dld * t)
    return {"W": dw}, dz


invconv_reverse_efficient.defvjp(_rev_fwd, _rev_bwd)


class InvertibleConv1x1:
    """Config-holding wrapper mirroring the reference module's dispatch
    (``model/efficient_modules.py:17-54``): ``forward_computation`` /
    ``reverse_computation`` plus the ``reverse_mode`` / ``memory_efficient``
    flags.  Stateless; params live in an external pytree ``{"W": [c, c]}``.
    """

    def __init__(self, c, memory_efficient=False, reverse_mode=False):
        self.c = c
        self.memory_efficient = memory_efficient
        self._reverse_mode = reverse_mode

    def init(self, key, dtype=jnp.float32):
        return invconv_init(key, self.c, dtype)

    def forward_computation(self, params, x):
        fn = invconv_forward_efficient if self.memory_efficient else invconv_forward
        return fn(params, x)

    def reverse_computation(self, params, z):
        fn = invconv_reverse_efficient if self.memory_efficient else invconv_reverse
        return fn(params, z)

    def forward(self, params, x):
        if self._reverse_mode:
            return self.reverse_computation(params, x)
        return self.forward_computation(params, x)

    def reverse(self, params, z):
        if self._reverse_mode:
            return self.forward_computation(params, z)
        return self.reverse_computation(params, z)

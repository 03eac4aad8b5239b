"""Affine coupling with constant-memory (invert-and-recompute) backward.

TPU-native re-design of the reference ``AffineCouplingBlock`` and its
``AffineCouplingFunc`` / ``InvAffineCouplingFunc`` autograd Functions
(``model/efficient_modules.py:57-212``).

The coupling transform, given a conditioner network F (the WaveNet stack):
  forward:  x = [xa; xb];  (log_s, t) = F(xa, y);  zb = xb * e^{log_s} + t
            -> z = [xa; zb], aux output log_s
  reverse:  z = [za; zb];  (log_s, t) = F(za, y);  xb = (zb - t) * e^{-log_s}
            -> x = [za; xb], aux output -log_s

Memory-efficient mode wraps each direction in a ``jax.custom_vjp`` whose
residuals are (params, output, y) — never the input and never F's internal
activations.  The backward rule reconstructs the input from the output via the
inverse map and then calls ``jax.vjp`` on F once, exactly the reference's
grad-through-``cat(log_s, t)`` trick (``model/efficient_modules.py:139-154``)
but expressed as a VJP with analytically-combined cotangents:

  forward bwd:  cot(log_s) = dlog_s + dzb * xb * s ;   cot(t) = dzb
                dxa = dza + vjp_F ;  dxb = dzb * s
  reverse bwd:  cot(log_s) = -dxb * xb - d(-log_s) ;   cot(t) = -dxb / s
                dza = dxa + vjp_F ;  dzb = dxb / s

F's internal activations exist only transiently inside the backward
computation (one block at a time), giving activation memory constant in the
number of flows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _split2(x):
    """torch ``chunk(2, 1)`` semantics: first chunk gets ceil(C/2) channels."""
    ca = (x.shape[1] + 1) // 2
    return x[:, :ca], x[:, ca:]


def make_affine_coupling(f_apply):
    """Build (forward, reverse, forward_eff, reverse_eff) coupling functions.

    ``f_apply(f_params, xa, y) -> (log_s, t)`` must be a pure jax function.
    """

    def forward(params, x, y):
        xa, xb = _split2(x)
        log_s, t = f_apply(params, xa, y)
        zb = xb * jnp.exp(log_s) + t
        return jnp.concatenate([xa, zb], 1), log_s

    def reverse(params, z, y):
        za, zb = _split2(z)
        log_s, t = f_apply(params, za, y)
        xb = (zb - t) * jnp.exp(-log_s)
        return jnp.concatenate([za, xb], 1), -log_s

    @jax.custom_vjp
    def forward_eff(params, x, y):
        return forward(params, x, y)

    def _f_fwd(params, x, y):
        out = forward(params, x, y)
        z, _ = out
        return out, (params, z, y)

    def _f_bwd(res, cts):
        params, z, y = res
        dz, dlog_s = cts
        # The recompute below depends only on residuals, so without a barrier
        # XLA's scheduler may hoist *every* flow's backward recompute to run
        # right after the forward pass, keeping all their internals live at
        # once (observed: +1.6 GB/flow at batch 24).  Tying z to the incoming
        # cotangent restores the sequential backward chain and the
        # constant-in-depth memory property.
        z, dz, dlog_s = lax.optimization_barrier((z, dz, dlog_s))
        za, zb = _split2(z)
        dza, dzb = _split2(dz)
        xa = za
        (log_s, t), f_vjp = jax.vjp(f_apply, params, xa, y)
        s = jnp.exp(log_s)
        xb = (zb - t) / s  # input reconstruction from the output
        dp, dxa_f, dy = f_vjp((dlog_s + dzb * xb * s, dzb))
        dxa = dza + dxa_f
        dxb = dzb * s
        return dp, jnp.concatenate([dxa, dxb], 1), dy

    forward_eff.defvjp(_f_fwd, _f_bwd)

    @jax.custom_vjp
    def reverse_eff(params, z, y):
        return reverse(params, z, y)

    def _r_fwd(params, z, y):
        out = reverse(params, z, y)
        x, _ = out
        return out, (params, x, y)

    def _r_bwd(res, cts):
        params, x, y = res
        dx, dnls = cts  # dnls is the cotangent of the (-log_s) output
        # scheduling barrier: see _f_bwd
        x, dx, dnls = lax.optimization_barrier((x, dx, dnls))
        xa, xb = _split2(x)
        dxa, dxb = _split2(dx)
        za = xa
        (log_s, t), f_vjp = jax.vjp(f_apply, params, za, y)
        s = jnp.exp(log_s)
        dp, dza_f, dy = f_vjp((-dxb * xb - dnls, -dxb / s))
        dza = dxa + dza_f
        dzb = dxb / s
        return dp, jnp.concatenate([dza, dzb], 1), dy

    reverse_eff.defvjp(_r_fwd, _r_bwd)

    return forward, reverse, forward_eff, reverse_eff


class AffineCouplingBlock:
    """Mirror of the reference module surface (``model/efficient_modules.py:57-96``).

    ``transform`` is any object with ``init(key) -> params`` and
    ``apply(params, xa, y) -> (log_s, t)`` (e.g. a WN config object).
    Stateless; params = {"F": transform params}.
    """

    def __init__(self, transform, memory_efficient=True, reverse_mode=False):
        self.F = transform
        self.memory_efficient = memory_efficient
        self._reverse_mode = reverse_mode
        fwd, rev, fwd_eff, rev_eff = make_affine_coupling(transform.apply)
        self._forward = fwd_eff if memory_efficient else fwd
        self._reverse = rev_eff if memory_efficient else rev

    def init(self, key):
        return {"F": self.F.init(key)}

    def forward_computation(self, params, x, y):
        return self._forward(params["F"], x, y)

    def reverse_computation(self, params, z, y):
        return self._reverse(params["F"], z, y)

    def forward(self, params, x, y):
        if self._reverse_mode:
            return self.reverse_computation(params, x, y)
        return self.forward_computation(params, x, y)

    def reverse(self, params, z, y):
        if self._reverse_mode:
            return self.forward_computation(params, z, y)
        return self.reverse_computation(params, z, y)

"""Flow-group scan: constant-memory backward that is *structurally* flat.

Round-1 implemented the reference's invert-and-recompute trick
(``model/efficient_modules.py:99-279``) as per-block ``jax.custom_vjp`` rules
with the flow chain unrolled in Python.  That is mathematically O(1) in flow
depth, but XLA's latency-hiding scheduler could still overlap several flows'
backward recomputations, keeping their WN internals live simultaneously
(~0.5 GB/flow observed at ch256/bs24 despite ``optimization_barrier``).

This module removes the scheduler from the equation: a *group* of equal-width
flows (invertible 1x1 -> affine coupling, the WaveGlow per-flow unit,
``model/waveglow.py:163-175``) runs as a single ``lax.scan`` wrapped in one
group-level ``custom_vjp``:

* forward: ``scan`` over stacked per-flow params; residuals are only
  (stacked params, group output, conditioning) — never the input, never any
  WN internal.
* backward: a *reversed* ``scan`` that per step (a) reconstructs the flow's
  input from its output via the inverse map, (b) recomputes the WN with
  ``jax.vjp`` once and combines the analytic coupling/1x1 cotangents exactly
  as the reference's ``AffineCouplingFunc.backward`` / ``Conv1x1Func.backward``
  (``model/efficient_modules.py:116-154,228-244``).

Because the backward is a single XLA while-loop, one flow's internals exist
per iteration by construction — no barriers, no scheduler heuristics — and
the compiled graph size is constant in flow count.

Cotangent conventions: the group returns ``(z, logdet)`` with
``logdet[b] = sum_k T*log|det W_k| + sum(log_s_k[b])``, so the incoming
``dld`` is per-batch; the 1x1 logdet term is batch-broadcast hence receives
``dld.sum()``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.convs import get_default_precision
from .coupling import _split2
from .invconv import _inv, _logabsdet, _mix

# lax.scan unroll factor for the group scans.  1 = strictly one flow's
# internals live at a time (the constant-memory contract).  >1 trades peak
# temp memory for scheduler overlap across flows.  Measured on v5e
# (flagship AMP step, b8): unroll 1 = 95.0 audio-s/s, 2 = 94.2 (no win),
# 4 (a whole flagship group, i.e. the while-loop disappears) = 102.8
# (+8%) at +1.5 GB peak temp (compiled total 5272 MB at ch256/bs24/12
# flows vs 3797 at unroll 1 — the reference reports 4951).  The module
# default is 1 (the memory contract); the TRAINER default is
# ``--scan-unroll auto``: ``Experiment.autotune_scan_unroll`` picks the
# largest of 4/2/1 whose compiled step fits the chip's memory budget
# (compile-time XLA buffer assignment — the microbatch_plan philosophy),
# so the measured throughput ships by default when memory allows.
_SCAN_UNROLL = 1


def get_scan_unroll() -> int:
    return _SCAN_UNROLL


def set_scan_unroll(n: int):
    """Set the flow-group scan unroll factor (takes effect at next trace)."""
    global _SCAN_UNROLL
    _SCAN_UNROLL = int(n)


# Hybrid remat knob (VERDICT r4 next #4): when False, flow scans that use
# plain rematerialization (WaveFlow's jax.checkpoint'ed body) store the
# body intermediates instead — deleting the backward's re-forward (one of
# three WN passes) at O(flows) activation memory.  Autotuned per run by
# ``Experiment.autotune_scan_unroll`` (the memory-budget philosophy): the
# no-remat step is tried first and kept only when XLA's buffer assignment
# fits the chip.  The module default True is the constant-memory contract.
_FLOW_REMAT = True


def get_flow_remat() -> bool:
    return _FLOW_REMAT


def set_flow_remat(on: bool):
    global _FLOW_REMAT
    _FLOW_REMAT = bool(on)


def _dot(a, b, dims):
    return lax.dot_general(a, b, (dims, ((), ())),
                           precision=get_default_precision())


def _mix_t(w, x):
    """W^T-mix: [C,C] x [B,C,T] -> [B,C,T] contracting over w's first axis."""
    return _dot(w, x, ((0,), (1,))).transpose(1, 0, 2)


def make_flow_group(f_apply, reverse_mode=False):
    """Build scanned flow-group functions for stacked per-flow params.

    ``f_apply(wn_params, xa, y) -> (log_s, t)`` must be pure.  ``wn_params``
    is an OPAQUE pytree — it may carry non-parameter leaves too (e.g.
    MelGlow threads BatchNorm running stats as ``{"p": ..., "s": ...}``;
    their cotangents are zeros and are dropped by the caller's
    ``value_and_grad``).  Stacked params:
    ``{"invconv": {"W": [n, C, C]}, "WN": <wn pytree with leading n axis>}``.

    ``reverse_mode=True`` builds the *construct-inverted* group (reference
    ``model/base.py:7-28`` applied per block): the model's
    ``forward_computation`` (training direction) runs each flow's INVERSE
    unit — invconv inverse then coupling inverse — ascending, and its
    ``reverse_computation`` (synthesis) runs coupling-forward then
    invconv-forward descending.  The returned functions keep the same
    calling convention either way, so model code is mode-agnostic.

    Returns ``(forward, reverse, forward_eff, reverse_eff)`` each mapping
    ``(params, x, y) -> (out, logdet)`` with ``logdet: [B]``, where
    ``forward`` is the group as used by the model's ``forward_computation``
    and ``reverse`` its exact inverse.
    """
    if reverse_mode:
        return _make_flow_group_rm(f_apply)

    # ------------------------------------------------------------- primitives
    def _flow_forward(p, x, y):
        """One flow: invconv then coupling.  -> (z, logdet_contrib [B])."""
        w = p["invconv"]["W"]
        t_len = x.shape[-1]
        u = _mix(w, x)
        ldw = t_len * _logabsdet(w)
        ua, ub = _split2(u)
        log_s, t = f_apply(p["WN"], ua, y)
        zb = ub * jnp.exp(log_s) + t
        z = jnp.concatenate([ua, zb], 1)
        return z, ldw + log_s.sum((1, 2))

    def _flow_reverse(p, z, y):
        """One flow inverted: coupling inverse then invconv inverse."""
        za, zb = _split2(z)
        log_s, t = f_apply(p["WN"], za, y)
        ub = (zb - t) * jnp.exp(-log_s)
        u = jnp.concatenate([za, ub], 1)
        w = p["invconv"]["W"]
        t_len = z.shape[-1]
        x = _mix(_inv(w), u)
        return x, -t_len * _logabsdet(w) - log_s.sum((1, 2))

    # ------------------------------------------------------------ naive scans
    def forward(params, x, y):
        def body(carry, p):
            x, ld = carry
            z, d = _flow_forward(p, x, y)
            return (z, ld + d), None

        init = (x, jnp.zeros((x.shape[0],), x.dtype))
        (z, ld), _ = lax.scan(body, init, params, unroll=_SCAN_UNROLL)
        return z, ld

    def reverse(params, z, y):
        def body(carry, p):
            z, ld = carry
            x, d = _flow_reverse(p, z, y)
            return (x, ld + d), None

        init = (z, jnp.zeros((z.shape[0],), z.dtype))
        (x, ld), _ = lax.scan(body, init, params, reverse=True,
                               unroll=_SCAN_UNROLL)
        return x, ld

    # -------------------------------------------------- efficient: x -> z dir
    @jax.custom_vjp
    def forward_eff(params, x, y):
        return forward(params, x, y)

    def _f_fwd(params, x, y):
        out = forward(params, x, y)
        return out, (params, out[0], y)

    def _f_bwd(res, cts):
        params, z, y = res
        dz, dld = cts
        dld_bc = dld[:, None, None]
        dld_sum = dld.sum()

        def body(carry, p):
            z, dz, dy = carry
            # ---- coupling backward (ref AffineCouplingFunc.backward,
            # model/efficient_modules.py:116-154): reconstruct the coupling
            # input from the output, one WN vjp for both value and grads.
            za, zb = _split2(z)
            dza, dzb = _split2(dz)
            (log_s, t), f_vjp = jax.vjp(f_apply, p["WN"], za, y)
            s = jnp.exp(log_s)
            ub = (zb - t) / s
            dwn, dua_f, dy_k = f_vjp((dld_bc + dzb * ub * s, dzb))
            du = jnp.concatenate([dza + dua_f, dzb * s], 1)
            u = jnp.concatenate([za, ub], 1)
            # ---- invconv backward (ref Conv1x1Func.backward, :228-244):
            # x = W^-1 u ; dx = W^T du ; dW = du x^T + W^-T * dld * T
            w = p["invconv"]["W"]
            w_inv = _inv(w)
            x = _mix(w_inv, u)
            t_len = x.shape[-1]
            dx = _mix_t(w, du)
            dw = _dot(du, x, ((0, 2), (0, 2))) + w_inv.T * (dld_sum * t_len)
            return (x, dx, dy + dy_k), {"invconv": {"W": dw}, "WN": dwn}

        init = (z, dz, jnp.zeros_like(y))
        (_, dx, dy), dparams = lax.scan(body, init, params, reverse=True,
                                        unroll=_SCAN_UNROLL)
        return dparams, dx, dy

    forward_eff.defvjp(_f_fwd, _f_bwd)

    # -------------------------------------------------- efficient: z -> x dir
    @jax.custom_vjp
    def reverse_eff(params, z, y):
        return reverse(params, z, y)

    def _r_fwd(params, z, y):
        out = reverse(params, z, y)
        return out, (params, out[0], y)

    def _r_bwd(res, cts):
        params, x, y = res
        dx, dld = cts
        dld_bc = dld[:, None, None]
        dld_sum = dld.sum()

        def body(carry, p):
            x, dx, dy = carry
            # ---- invconv reverse backward (ref InvConv1x1Func.backward,
            # model/efficient_modules.py:261-279): u = W x reconstructs the
            # 1x1's input; du = W^-T dx ; dW = -du x^T - W^-T * dld * T
            w = p["invconv"]["W"]
            w_inv_t = _inv(w).T
            u = _mix(w, x)
            t_len = x.shape[-1]
            du = _dot(w_inv_t, dx, ((1,), (1,))).transpose(1, 0, 2)
            dw = -_dot(du, x, ((0, 2), (0, 2))) - w_inv_t * (dld_sum * t_len)
            # ---- coupling reverse backward (ref InvAffineCouplingFunc
            # .backward, :169-212): zb = ub s + t reconstructs the coupling
            # input; cotangents through (-log_s, -t/s).
            ua, ub = _split2(u)
            dua, dub = _split2(du)
            (log_s, t), f_vjp = jax.vjp(f_apply, p["WN"], ua, y)
            s = jnp.exp(log_s)
            zb = ub * s + t
            # group logdet cot: d(-log_s)[b,c,t] = dld[b]
            dwn, dza_f, dy_k = f_vjp((-dub * ub - dld_bc, -dub / s))
            dz = jnp.concatenate([dua + dza_f, dub / s], 1)
            z = jnp.concatenate([ua, zb], 1)
            return (z, dz, dy + dy_k), {"invconv": {"W": dw}, "WN": dwn}

        init = (x, dx, jnp.zeros_like(y))
        (_, dz, dy), dparams = lax.scan(body, init, params,
                                        unroll=_SCAN_UNROLL)
        return dparams, dz, dy

    reverse_eff.defvjp(_r_fwd, _r_bwd)

    return forward, reverse, forward_eff, reverse_eff


def _make_flow_group_rm(f_apply):
    """Construct-inverted (``reverse_mode``) flow group.

    Per-flow TRAINING-direction unit (the composition the unrolled path
    produces when every block carries ``reverse_mode=True``,
    ref ``model/base.py:19-28`` + ``model/waveglow.py:163-175``):

        u = W^{-1} x                    logdet -= T * log|det W|
        (log_s, t) = F(u_a, y)
        v_b = (u_b - t) * e^{-log_s}    logdet -= sum(log_s)
        v = [u_a; v_b]

    ascending over the group; synthesis is the exact inverse descending.
    The efficient backward rules mirror the reference's
    ``InvAffineCouplingFunc`` / ``InvConv1x1Func``
    (``model/efficient_modules.py:169-279``) at the group-scan level:
    residuals are (params, group output, cond) only, inputs reconstructed
    flow-by-flow inside a single reversed while-loop.
    """

    def _flow_forward(p, x, y):
        w = p["invconv"]["W"]
        t_len = x.shape[-1]
        u = _mix(_inv(w), x)
        ldw = -t_len * _logabsdet(w)
        ua, ub = _split2(u)
        log_s, t = f_apply(p["WN"], ua, y)
        vb = (ub - t) * jnp.exp(-log_s)
        v = jnp.concatenate([ua, vb], 1)
        return v, ldw - log_s.sum((1, 2))

    def _flow_reverse(p, v, y):
        va, vb = _split2(v)
        log_s, t = f_apply(p["WN"], va, y)
        ub = vb * jnp.exp(log_s) + t
        u = jnp.concatenate([va, ub], 1)
        w = p["invconv"]["W"]
        t_len = v.shape[-1]
        x = _mix(w, u)
        return x, t_len * _logabsdet(w) + log_s.sum((1, 2))

    def forward(params, x, y):
        def body(carry, p):
            x, ld = carry
            v, d = _flow_forward(p, x, y)
            return (v, ld + d), None

        init = (x, jnp.zeros((x.shape[0],), x.dtype))
        (v, ld), _ = lax.scan(body, init, params, unroll=_SCAN_UNROLL)
        return v, ld

    def reverse(params, v, y):
        def body(carry, p):
            v, ld = carry
            x, d = _flow_reverse(p, v, y)
            return (x, ld + d), None

        init = (v, jnp.zeros((v.shape[0],), v.dtype))
        (x, ld), _ = lax.scan(body, init, params, reverse=True,
                              unroll=_SCAN_UNROLL)
        return x, ld

    # ------------------------------------------- efficient: training dir
    @jax.custom_vjp
    def forward_eff(params, x, y):
        return forward(params, x, y)

    def _f_fwd(params, x, y):
        out = forward(params, x, y)
        return out, (params, out[0], y)

    def _f_bwd(res, cts):
        params, v, y = res
        dv, dld = cts
        dld_bc = dld[:, None, None]
        dld_sum = dld.sum()

        def body(carry, p):
            v, dv, dy = carry
            # ---- coupling-inverse backward: reconstruct the coupling input
            # u from the output v (u_b = v_b * s + t), one WN vjp; the
            # group logdet carries -sum(log_s) so cot(log_s) gets -dld
            va, vb = _split2(v)
            dva, dvb = _split2(dv)
            (log_s, t), f_vjp = jax.vjp(f_apply, p["WN"], va, y)
            s = jnp.exp(log_s)
            ub = vb * s + t
            dwn, dua_f, dy_k = f_vjp((-dvb * vb - dld_bc, -dvb / s))
            du = jnp.concatenate([dva + dua_f, dvb / s], 1)
            u = jnp.concatenate([va, ub], 1)
            # ---- invconv-inverse backward (u = W^{-1} x, ld -= T log|detW|):
            # x = W u reconstructs the input; dx = W^{-T} du ;
            # dW = -dx u^T - W^{-T} * dld * T
            w = p["invconv"]["W"]
            w_inv_t = _inv(w).T
            x = _mix(w, u)
            t_len = x.shape[-1]
            dx = _dot(w_inv_t, du, ((1,), (1,))).transpose(1, 0, 2)
            dw = -_dot(dx, u, ((0, 2), (0, 2))) - w_inv_t * (dld_sum * t_len)
            return (x, dx, dy + dy_k), {"invconv": {"W": dw}, "WN": dwn}

        init = (v, dv, jnp.zeros_like(y))
        (_, dx, dy), dparams = lax.scan(body, init, params, reverse=True,
                                        unroll=_SCAN_UNROLL)
        return dparams, dx, dy

    forward_eff.defvjp(_f_fwd, _f_bwd)

    # ------------------------------------------- efficient: synthesis dir
    @jax.custom_vjp
    def reverse_eff(params, v, y):
        return reverse(params, v, y)

    def _r_fwd(params, v, y):
        out = reverse(params, v, y)
        return out, (params, out[0], y)

    def _r_bwd(res, cts):
        params, x, y = res
        dx, dld = cts
        dld_bc = dld[:, None, None]
        dld_sum = dld.sum()

        def body(carry, p):
            x, dx, dy = carry
            # ---- invconv-forward backward (x = W u, ld += T log|detW|):
            # u = W^{-1} x reconstructs the 1x1 input; du = W^T dx ;
            # dW = dx u^T + W^{-T} * dld * T
            w = p["invconv"]["W"]
            w_inv = _inv(w)
            u = _mix(w_inv, x)
            t_len = x.shape[-1]
            du = _mix_t(w, dx)
            dw = _dot(dx, u, ((0, 2), (0, 2))) + w_inv.T * (dld_sum * t_len)
            # ---- coupling-forward backward (u_b = v_b * s + t,
            # ld += sum(log_s)): v_b = (u_b - t)/s reconstructs the input
            ua, ub = _split2(u)
            dua, dub = _split2(du)
            (log_s, t), f_vjp = jax.vjp(f_apply, p["WN"], ua, y)
            s = jnp.exp(log_s)
            vb = (ub - t) / s
            dwn, dva_f, dy_k = f_vjp((dld_bc + dub * vb * s, dub))
            dv = jnp.concatenate([dua + dva_f, dub * s], 1)
            v = jnp.concatenate([ua, vb], 1)
            return (v, dv, dy + dy_k), {"invconv": {"W": dw}, "WN": dwn}

        init = (x, dx, jnp.zeros_like(y))
        (_, dv, dy), dparams = lax.scan(body, init, params,
                                        unroll=_SCAN_UNROLL)
        return dparams, dv, dy

    reverse_eff.defvjp(_r_fwd, _r_bwd)

    return forward, reverse, forward_eff, reverse_eff


def stack_flow_params(invconv_list, wn_list):
    """Stack per-flow param pytrees into the scanned layout (differentiable)."""
    inv = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *invconv_list)
    wn = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *[p["F"] for p in wn_list])
    return {"invconv": inv, "WN": wn}

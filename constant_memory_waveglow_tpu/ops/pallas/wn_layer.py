"""Pallas TPU kernel: fused WaveNet layer.

One WN layer is ``y = W_dil *_d x  (+v) -> gate -> W_o -> (x + res, skip)``
(reference ``NonCausalLayer``, ``model/waveglow.py:18-46``).  Under plain XLA
the two convolutions are separate MXU ops with the gated intermediate
round-tripping HBM; at 256 channels the layer sits near the roofline ridge,
so that traffic is wall-clock.  This kernel keeps the whole layer in VMEM:

  grid (B, T/t_tile); per tile:
    - DMA the haloed x window [C, t_tile + 2*dilation] from HBM
    - dilated conv as 3 MXU GEMMs [2D, C] @ [C, t_tile] accumulated in fp32
    - add the conditioning chunk, tanh x sigmoid gate
    - W_o GEMM [O, D] @ [D, t_tile]
    - write [x + res ; skip] as one [C+S, t_tile] block

Gradients: ``fused_wn_layer`` carries a custom_vjp whose backward is the VJP
of the (numerically identical) XLA formulation — the forward runs the Pallas
kernel, backprop recomputes through XLA.  This composes with the outer
constant-memory coupling custom_vjp, which recomputes F in its own backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..convs import conv1d, conv1x1, get_default_precision

# Off by default: measured END-TO-END on a v5e chip (chained-steps timing,
# round 2), flagship WaveGlow synthesis runs 3439 kHz on the plain XLA path
# vs 2185 kHz with this kernel — XLA's conv emitters + fusion beat the
# hand-written layer at these shapes (the round-1 "1.48x/layer" came from
# single-dispatch timing that under-counted the kernel's pipeline stalls:
# the halo DMA is synchronous, one tile in flight).  Kept as an opt-in for
# experimentation; the Pallas effort goes where XLA is weak instead (the
# WaveFlow AR step, ``ops/pallas/ar_step.py``).
_ENABLED = False


def set_fused_wn_enabled(flag):
    """Force the Pallas fused WN layer on/off."""
    global _ENABLED
    _ENABLED = bool(flag)


def fused_wn_enabled() -> bool:
    return _ENABLED


def wn_layer_xla(x, v, w_dil, w_out, dilation, has_res=True):
    """Reference XLA formulation of one WN layer.

    x: [B, C, T]; v: [B, 2D, T]; w_dil: [2D, C, 3]; w_out: [O, D]
    -> out [B, O, T]; rows [:C] are the residual-updated x when has_res.
    """
    if w_out.ndim == 2:
        w_out = w_out[..., None]
    xy = conv1d(x, w_dil, dilation=dilation) + v
    d = xy.shape[1] // 2
    g = jnp.tanh(xy[:, :d]) * jax.nn.sigmoid(xy[:, d:])
    out = conv1x1(g, w_out)
    c = x.shape[1]
    if has_res:
        out = jnp.concatenate([x + out[:, :c], out[:, c:]], axis=1)
    return out


def _pallas_impl(x, v, w_dil, w_out, dilation, has_res, t_tile, interpret,
                 precision):
    b, c, t = x.shape
    d2 = w_dil.shape[0]
    d_half = d2 // 2
    o = w_out.shape[0]
    halo = dilation

    t_pad = (-t) % t_tile
    # DMA slice sizes along the lane dim must be 128-aligned on TPU
    win = t_tile + 2 * halo
    win = ((win + 127) // 128) * 128
    t_pad_r = t_pad + halo + (win - (t_tile + 2 * halo))
    xp = jnp.pad(x, [(0, 0), (0, 0), (halo, t_pad_r)])
    vp = jnp.pad(v, [(0, 0), (0, 0), (0, t_pad)]) if t_pad else v
    n_tiles = (t + t_pad) // t_tile
    # taps leading so the weight block's lane dim is C, not the radix
    wd_t = jnp.transpose(w_dil, (2, 0, 1))  # [3, 2D, C]

    out_dtype = x.dtype

    # Global matmul precision is honored (ADVICE r1): DEFAULT = bf16 MXU
    # operands (XLA's own f32 'default' semantics); HIGH/HIGHEST keep f32
    # operands with Precision.HIGHEST dots (Mosaic rejects HIGH — probed on
    # v5e: bf16 and f32-HIGHEST lower, 'Unsupported dot precision: HIGH').
    fast = precision in (lax.Precision.DEFAULT, None)
    op_dtype = jnp.bfloat16 if fast else jnp.float32
    dot_prec = None if fast else lax.Precision.HIGHEST

    def kernel(xp_ref, v_ref, wd_ref, wo_ref, out_ref, xwin, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        cp = pltpu.make_async_copy(
            xp_ref.at[bi, :, pl.ds(ti * t_tile, win)], xwin, sem)
        cp.start()
        cp.wait()

        acc = jnp.zeros((d2, t_tile), jnp.float32)
        for k in range(3):
            acc += jax.lax.dot_general(
                wd_ref[k].astype(op_dtype),
                xwin[:, pl.ds(k * halo, t_tile)].astype(op_dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=dot_prec)
        xy = acc + v_ref[0].astype(jnp.float32)
        g = jnp.tanh(xy[:d_half]) * jax.nn.sigmoid(xy[d_half:])
        out = jax.lax.dot_general(
            wo_ref[:].astype(op_dtype), g.astype(op_dtype if fast else jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=dot_prec)
        if has_res:
            x_center = xwin[:, pl.ds(halo, t_tile)].astype(jnp.float32)
            out = jnp.concatenate([out[:c] + x_center, out[c:]], axis=0)
        out_ref[0] = out.astype(out_dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # haloed x, DMA'd manually
            pl.BlockSpec((1, d2, t_tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, d2, c), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o, d_half), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, o, t_tile), lambda bi, ti: (bi, 0, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, o, t + t_pad), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((c, win), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, vp, wd_t, w_out)
    if t_pad:
        out = out[..., :t]
    return out


@functools.lru_cache(maxsize=None)
def _make_fused(dilation, has_res, t_tile, interpret, precision):
    @jax.custom_vjp
    def fused(x, v, w_dil, w_out):
        return _pallas_impl(x, v, w_dil, w_out, dilation, has_res, t_tile,
                            interpret, precision)

    def fwd(x, v, w_dil, w_out):
        return fused(x, v, w_dil, w_out), (x, v, w_dil, w_out)

    def bwd(res, g):
        x, v, w_dil, w_out = res
        _, vjp = jax.vjp(
            lambda x, v, wd, wo: wn_layer_xla(x, v, wd, wo, dilation,
                                              has_res)[..., :x.shape[-1]],
            x, v, w_dil, w_out)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def fused_wn_layer(x, v, w_dil, w_out, dilation, has_res, t_tile=512,
                   interpret=False):
    """Fused WN layer; ``has_res=True`` for non-last layers whose first C
    output rows are the residual-updated x.  w_out must be [O, D] or
    [O, D, 1]; w_dil [2D, C, 3]."""
    if w_out.ndim == 3:
        w_out = w_out[..., 0]
    t_tile = min(t_tile, max(128, (x.shape[-1] // 128) * 128))
    return _make_fused(int(dilation), bool(has_res), int(t_tile),
                       bool(interpret),
                       get_default_precision())(x, v, w_dil, w_out)

"""WaveFlow — 2-D height-causal autoregressive flow.

TPU-native re-design of reference ``WaveFlow`` (``model/waveflow.py:14-265``).
Audio is squeezed to an image [B, 1, n_group, T']; each flow predicts
``(log_s, t)`` for rows 1..G-1 from rows 0..G-2 through an 8-layer 2-D WN
whose convolutions are *causal in height* (top-padded) and 'same' in time;
after each flow the transformed rows are flipped (or mixed by an optional
height-axis invertible 1x1).

Synthesis is autoregressive over the ``n_group`` height rows.  The reference's
per-layer Python ring buffers (``model/waveflow.py:53-67,137-151``) become a
single ``lax.scan`` whose carry holds one [B, res, 2*h_dil+1, T'] rolling
window per layer — the Fast-WaveNet conv cache expressed as a compiled loop,
with the conditioning projection V(y) hoisted out of the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import FlowBase
from .wn import _conv_param as _conv2d_param  # shape-agnostic: handles 2-D kernels
from ..flows.invconv import InvertibleConv1x1
from ..ops.convs import (conv1x1, conv2d, conv2d_causal_h, conv_transpose1d,
                         torch_conv_uniform_init)
from ..ops.weightnorm import wn_init, wn_weight
from ..ops.gate import gated_tanh_packed


# height-dilation schedules keyed by n_group (model/waveflow.py:81-87)
DILATION_DICT = {
    8: [1] * 8,
    16: [1] * 8,
    32: [1, 2, 4] * 2 + [1, 2],
    64: [1, 2, 4, 8, 16, 1, 2, 4],
    128: [1, 2, 4, 8, 16, 32, 64, 1],
}




def _apply_1x1_2d(p, x):
    """[Cout, Cin, 1, 1] pointwise conv on [B, C, H, W]."""
    w = wn_weight(p["w"])
    y = conv2d(x, w)
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    return y


class WN2D:
    """8-layer height-causal gated conv stack (reference ``WN2D``,
    ``model/waveflow.py:70-151``)."""

    def __init__(self, n_group, aux_channels, dilation_channels=256,
                 residual_channels=256, skip_channels=256, bias=False,
                 zero_init=True):
        self.n_group = n_group
        self.aux_channels = aux_channels
        self.dilation_channels = dilation_channels
        self.residual_channels = residual_channels
        self.skip_channels = skip_channels
        self.bias = bias
        self.zero_init = zero_init
        self.h_dilations = DILATION_DICT[n_group]
        self.dilations = [2**i for i in range(8)]
        self.depth = 8

    def init(self, key):
        keys = jax.random.split(key, 3 + self.depth)
        d, r, s = self.dilation_channels, self.residual_channels, self.skip_channels
        params = {
            "V": _conv2d_param(keys[0], (2 * d * self.depth, self.aux_channels, 1), self.bias),
            "start": _conv2d_param(keys[1], (r, 1, 1, 1), self.bias),
            "layers": [],
        }
        for i in range(self.depth):
            k1, k2 = jax.random.split(keys[3 + i])
            last = i == self.depth - 1
            out_ch = s if last else r + s
            params["layers"].append({
                "W": _conv2d_param(k1, (2 * d, r, 3, 3), self.bias),
                "W_o": _conv2d_param(k2, (out_ch, d, 1, 1), self.bias),
            })
        end_w = (jnp.zeros((2, s, 1, 1)) if self.zero_init
                 else torch_conv_uniform_init(keys[2], (2, s, 1, 1)))
        params["end"] = {"w": end_w}
        if self.bias:
            params["end"]["b"] = jnp.zeros((2,))
        return params

    def _cond_chunks(self, params, y):
        """V(y) -> list of per-layer [B, 2*dil, 1, W] chunks
        (hoisted once per flow; reference caches this across AR steps,
        ``model/waveflow.py:142-143``)."""
        p = params["V"]
        v = conv1x1(y, wn_weight(p["w"]))
        if "b" in p:
            v = v + p["b"][None, :, None]
        v = v[:, :, None, :]  # [B, 2*d*depth, 1, W]
        d2 = 2 * self.dilation_channels
        return [v[:, i * d2 : (i + 1) * d2] for i in range(self.depth)]

    def apply(self, params, x, y):
        """x: [B, 1, H, W] rows 0..G-2; y: [B, aux, W] -> (log_s, t) [B, 1, H, W]."""
        x = _apply_1x1_2d(params["start"], x)
        cond = self._cond_chunks(params, y)
        cum_skip = 0.0
        for i, lp in enumerate(params["layers"]):
            w = wn_weight(lp["W"]["w"])
            xy = conv2d_causal_h(x, w, h_dilation=self.h_dilations[i],
                                 dilation=self.dilations[i])
            if "b" in lp["W"]:
                xy = xy + lp["W"]["b"][None, :, None, None]
            z = gated_tanh_packed(xy + cond[i])
            out = _apply_1x1_2d(lp["W_o"], z)
            if i == self.depth - 1:
                skip = out
            else:
                x = x + out[:, : self.residual_channels]
                skip = out[:, self.residual_channels :]
            cum_skip = cum_skip + skip
        out = _apply_1x1_2d(params["end"], cum_skip)
        log_s, t = jnp.split(out, 2, axis=1)
        return log_s, t

    # -------------------------------------------------------- AR cached step
    def init_buffers(self, batch, width, dtype):
        """Zero ring buffers: one [B, res, 2*hd+1, W] window per layer."""
        r = self.residual_channels
        return tuple(
            jnp.zeros((batch, r, 2 * hd + 1, width), dtype)
            for hd in self.h_dilations
        )

    def ar_step(self, params, x_row, cond, buffers, s):
        """One autoregressive row step with *ring* conv caches.

        x_row: [B, 1, 1, W] (the last generated row); cond: per-layer chunks;
        buffers: per-layer rings [B, C, 2*hd+1, W]; s: scalar step index.
        Returns (log_s, t, new_buffers), each map output [B, 1, 1, W].
        Equivalent to the reference's ``reverse_mode_forward`` chain
        (``model/waveflow.py:53-67,137-151``), but instead of shifting the
        whole window each step (O(window) HBM traffic), the step writes one
        row at ``s mod rows`` and gathers the two old taps at
        ``(s-hd) mod rows`` / ``(s-2hd) mod rows`` — unwritten rows are the
        zero-init, matching the shifted-window semantics exactly.

        The 3x3 conv over the window degenerates to one output row, which XLA
        lowers poorly as a conv; instead the 9 taps are gathered explicitly
        and contracted as a single [2D, C*9] GEMM per layer.
        """
        from ..ops.convs import get_default_precision

        prec = get_default_precision()
        x = _apply_1x1_2d(params["start"], x_row)
        new_buffers = []
        cum_skip = 0.0
        for i, lp in enumerate(params["layers"]):
            hd, d = self.h_dilations[i], self.dilations[i]
            n_rows = 2 * hd + 1
            pos = jax.lax.rem(s, n_rows)
            buf = jax.lax.dynamic_update_slice(
                buffers[i], x, (0, 0, pos, 0))
            new_buffers.append(buf)
            # taps [B, C, 3, W]: rows s-2hd, s-hd, s (oldest first, matching
            # the weight's height-tap order)
            t0 = jax.lax.dynamic_slice_in_dim(
                buf, jax.lax.rem(pos + 1, n_rows), 1, axis=2)
            t1 = jax.lax.dynamic_slice_in_dim(
                buf, jax.lax.rem(pos + hd + 1, n_rows), 1, axis=2)
            rows = jnp.concatenate([t0, t1, x], axis=2)
            w = wn_weight(lp["W"]["w"])  # [2D, C, 3, 3]
            rp = jnp.pad(rows, [(0, 0), (0, 0), (0, 0), (d, d)])
            wdim = x.shape[-1]
            taps = jnp.stack([rp[..., k * d : k * d + wdim] for k in range(3)],
                             axis=3)  # [B, C, 3, 3, W]
            xy = jnp.einsum("ocij,bcijw->bow", w, taps,
                            precision=prec)[:, :, None, :]
            if "b" in lp["W"]:
                xy = xy + lp["W"]["b"][None, :, None, None]
            z = gated_tanh_packed(xy + cond[i])
            out = _apply_1x1_2d(lp["W_o"], z)
            if i == self.depth - 1:
                skip = out
            else:
                x = x + out[:, : self.residual_channels]
                skip = out[:, self.residual_channels :]
            cum_skip = cum_skip + skip
        out = _apply_1x1_2d(params["end"], cum_skip)
        log_s, t = jnp.split(out, 2, axis=1)
        return log_s, t, tuple(new_buffers)


class WaveFlow(FlowBase):
    def __init__(self, flows, n_group, n_mels, use_conv1x1, memory_efficient,
                 reverse_mode=False, scan_flows=True, **wn_kwargs):
        super().__init__(256, reverse_mode)  # hop hard-coded (model/waveflow.py:163)
        self.flows = flows
        self.n_group = n_group
        self.n_mels = n_mels
        self.use_conv1x1 = use_conv1x1
        self.mem_efficient = memory_efficient
        self.sub_sr = self._hop_length // n_group
        # Beyond-reference memory efficiency: the reference's WaveFlow
        # ``memory_efficient`` only covers the invertible 1x1
        # (``model/waveflow.py:188``) — the AR coupling cannot be cheaply
        # inverted, so its WN internals stay resident for every flow.  Here
        # every flow is structurally identical (the dilation schedule is
        # per-LAYER, not per-flow), so the flow chain runs as one
        # ``lax.scan`` over flow-stacked params with a ``jax.checkpoint``ed
        # body: autodiff saves only each flow's [B,1,G,T'] carry and
        # rematerializes the WN forward in backward — activation residuals
        # drop from O(flows x WN internals) to O(flows x carry).
        self.scan_flows = scan_flows and memory_efficient and not reverse_mode

        self.WNs = [WN2D(n_group, n_mels, **wn_kwargs) for _ in range(flows)]
        self.invconv1x1 = (
            [InvertibleConv1x1(n_group, memory_efficient=memory_efficient,
                               reverse_mode=reverse_mode) for _ in range(flows)]
            if use_conv1x1 else None)

    def init(self, key):
        keys = jax.random.split(key, 1 + 2 * self.flows)
        k_up = self.sub_sr * 2 + 1
        up_w = torch_conv_uniform_init(keys[0], (self.n_mels, self.n_mels, k_up),
                                       fan_in=self.n_mels * k_up)
        # torch ConvTranspose1d default bias init: U(-1/sqrt(fan_in), ..)
        up_b = torch_conv_uniform_init(jax.random.fold_in(keys[0], 1),
                                       (self.n_mels,), fan_in=self.n_mels * k_up)
        params = {
            "upsampler": {"w": wn_init(up_w), "b": up_b},
            "WNs": [wn.init(k) for wn, k in zip(self.WNs, keys[1::2])],
        }
        if self.use_conv1x1:
            params["invconv1x1"] = [c.init(k) for c, k in
                                    zip(self.invconv1x1, keys[2::2])]
        if self.scan_flows:
            params = self.stack_param_layout(params)
        return params

    def stack_param_layout(self, legacy):
        """Per-flow list layout (canonical/on-disk) -> flow-stacked scan
        layout.  All flows are one group (uniform width, no early outputs)."""
        if "groups" in legacy:
            return legacy
        tm = jax.tree_util.tree_map
        out = {k: v for k, v in legacy.items()
               if k not in ("invconv1x1", "WNs")}
        gp = {"WN": tm(lambda *a: jnp.stack(a), *legacy["WNs"])}
        if self.use_conv1x1:
            gp["invconv"] = tm(lambda *a: jnp.stack(a), *legacy["invconv1x1"])
        out["groups"] = [gp]
        return out

    def unstack_param_layout(self, params):
        """Flow-stacked layout -> per-flow list layout (tooling/export and
        the unrolled AR reverse)."""
        if "groups" not in params:
            return params
        tm = jax.tree_util.tree_map
        gp = params["groups"][0]
        n = jax.tree_util.tree_leaves(gp["WN"])[0].shape[0]
        out = {k: v for k, v in params.items() if k != "groups"}
        out["WNs"] = [tm(lambda a: a[i], gp["WN"]) for i in range(n)]
        if "invconv" in gp:
            out["invconv1x1"] = [tm(lambda a: a[i], gp["invconv"])
                                 for i in range(n)]
        return out

    def _upsample_h(self, params, h):
        """ReplicationPad(0,1) + ConvTranspose1d + LeakyReLU(0.4), computed in
        fp32 regardless of the working dtype and cast back — the reference
        pins this op to fp32 under AMP (``model/waveflow.py:169-175,263-265``)."""
        dtype = h.dtype
        h = h.astype(jnp.float32)
        h = jnp.concatenate([h, h[..., -1:]], axis=-1)
        w = wn_weight(params["upsampler"]["w"]).astype(jnp.float32)
        y = conv_transpose1d(h, w, stride=self.sub_sr, padding=self.sub_sr // 2)
        y = y + params["upsampler"]["b"][None, :, None].astype(jnp.float32)
        return jnp.where(y >= 0, y, 0.4 * y).astype(dtype)

    def _squeeze(self, x):
        b = x.shape[0]
        return x.reshape(b, 1, -1, self.n_group).transpose(0, 1, 3, 2)

    def _unsqueeze(self, x):
        b = x.shape[0]
        return x[:, 0].transpose(0, 2, 1).reshape(b, -1)

    def _forward_scanned(self, gp, x, y):
        """Flow chain as one ``lax.scan`` over stacked params with a
        rematerialized body (see __init__ docstring): per-flow residual =
        the carry, not the WN internals."""
        from jax import lax
        from ..flows.invconv import _logabsdet, _mix

        wn = self.WNs[0]  # all flows are structurally identical
        t_len = x.shape[-1]

        def body(carry, p):
            x, ld = carry
            x0 = x[:, :, :1]
            log_s, t = wn.apply(p["WN"], x[:, :, :-1], y)
            xout = x[:, :, 1:] * jnp.exp(log_s) + t
            ld = ld + log_s.sum((1, 2, 3))
            if self.use_conv1x1:
                w = p["invconv"]["W"]
                x = _mix(w, jnp.concatenate([x0, xout], 2)[:, 0])[:, None]
                ld = ld + t_len * _logabsdet(w)
            else:
                x = jnp.concatenate([jnp.flip(xout, 2), x0], 2)
            return (x, ld), None

        ld0 = jnp.zeros((x.shape[0],), x.dtype)
        # honor the global flow-scan unroll knob (autotuned by
        # Experiment.autotune_scan_unroll): at unroll 1 the while loop's
        # serialization cost half the WaveFlow step device time (round-5
        # trace: 49.9% 'while' at 77 GB/s achieved)
        from ..flows.scan_group import get_flow_remat, get_scan_unroll
        scan_body = jax.checkpoint(body) if get_flow_remat() else body
        (x, logdet), _ = lax.scan(scan_body, (x, ld0), gp,
                                  unroll=min(get_scan_unroll(), self.flows))
        return self._unsqueeze(x), logdet

    def forward_computation(self, params, x, h):
        y = self._upsample_h(params, h)
        x = self._squeeze(x)  # [B, 1, G, T']
        y = y[..., : x.shape[-1]]

        if "groups" in params:
            return self._forward_scanned(params["groups"][0], x, y)

        logdet = jnp.zeros((x.shape[0],), x.dtype)
        for k in range(self.flows):
            x0 = x[:, :, :1]
            log_s, t = self.WNs[k].apply(params["WNs"][k], x[:, :, :-1], y)
            xout = x[:, :, 1:] * jnp.exp(log_s) + t
            logdet = logdet + log_s.sum((1, 2, 3))

            if self.invconv1x1 is None:
                x = jnp.concatenate([jnp.flip(xout, 2), x0], 2)
            else:
                mixed, log_det_w = self.invconv1x1[k].forward(
                    params["invconv1x1"][k],
                    jnp.concatenate([x0, xout], 2)[:, 0])
                x = mixed[:, None]
                logdet = logdet + log_det_w

        return self._unsqueeze(x), logdet

    def _flow_inverse_fused(self, wn, wn_params, z, y, *, use_vmem, fast):
        """One flow's AR inverse via the fused Pallas kernels (v2 VMEM when
        ``use_vmem``, else v1 DMA).  z: [B, 1, G, W] -> (x [B, 1, G, W],
        logdet contribution [B])."""
        from ..ops.pallas import ar_step as _ar

        b, _, g, w = z.shape
        w_pad = ((w + 127) // 128) * 128
        # DMA/lane dim must be 128-aligned: run the kernel at padded
        # width and slice the (zero-padded, conv-local) results back
        packed = _ar.pack_ar_weights(wn_params)
        cond_all = conv1x1(y, wn_weight(wn_params["V"]["w"]))
        cond_all = jnp.pad(cond_all, [(0, 0), (0, 0), (0, w_pad - w)])
        hds, ds = tuple(wn.h_dilations), tuple(wn.dilations)

        z_in = jnp.pad(z[:, 0], [(0, 0), (0, 0), (0, w_pad - w)])
        if use_vmem:  # v2: VMEM-resident whole-flow kernel
            x_rows, log_rows = _ar.fused_ar_flow_vmem(
                packed, z_in, cond_all, h_dilations=hds,
                dilations=ds, residual=wn.residual_channels,
                skip=wn.skip_channels, interpret=_ar._INTERPRET,
                fast=fast, true_w=w)
            ld = -log_rows[..., :w].sum((1, 2))
            return jnp.concatenate([z[:, :, :1], x_rows[:, None, 1:, :w]], 2), ld
        x_rows, log_rows = _ar.fused_ar_flow(
            packed, z_in[:, :, None, :], cond_all, h_dilations=hds,
            dilations=ds, residual=wn.residual_channels,
            skip=wn.skip_channels, interpret=_ar._INTERPRET,
            fast=fast, true_w=w)
        ld = -log_rows[..., :w].sum((1, 2, 3))
        return jnp.concatenate(
            [z[:, :, :1], x_rows[:, 1:, :, :w].transpose(0, 2, 1, 3)], 2), ld

    def _flow_inverse_scan(self, wn, wn_params, z, y):
        """One flow's AR inverse as an XLA ``lax.scan`` over height rows
        (per-layer conv ring buffers in the carry).  Same signature as
        :meth:`_flow_inverse_fused`."""
        b, _, g, w = z.shape
        x0 = z[:, :, :1]  # first row passes through
        cond = wn._cond_chunks(wn_params, y)
        buffers = wn.init_buffers(b, w, z.dtype)

        def step(carry, inp):
            z_row, s = inp
            x_prev, buffers, ld = carry
            log_s, t, buffers = wn.ar_step(wn_params, x_prev, cond,
                                           buffers, s)
            x_new = (z_row - t) * jnp.exp(-log_s)
            ld = ld - log_s.sum((1, 2, 3))
            return (x_new, buffers, ld), x_new

        carry0 = (x0, buffers, jnp.zeros((b,), z.dtype))

        z_rows = jnp.moveaxis(z[:, :, 1:], 2, 0)[:, :, :, None, :]  # [G-1, B, 1, 1, W]
        (x_last, _, ld), xs = jax.lax.scan(
            step, carry0, (z_rows, jnp.arange(g - 1)))
        rows = jnp.moveaxis(xs[:, :, :, 0], 0, 2)  # [B, 1, G-1, W]
        return jnp.concatenate([x0, rows], 2), ld

    def reverse_computation(self, params, z, h):
        # the AR inverse is unrolled per flow (each launches the fused
        # Pallas kernel); consume the canonical per-flow layout
        params = self.unstack_param_layout(params)
        y = self._upsample_h(params, h)
        z = self._squeeze(z)
        y = y[..., : z.shape[-1]]
        b, _, g, w = z.shape

        from ..ops.convs import get_default_precision
        from ..ops.pallas import ar_step as _ar

        # symbolic-shape exports (serving artifacts with a symbolic time
        # axis) can only take the scan path: Pallas block shapes are static
        static_w = isinstance(w, int)
        w_pad = ((w + 127) // 128) * 128 if static_w else None
        fast = get_default_precision() in (jax.lax.Precision.DEFAULT,)

        logdet = jnp.zeros((b,), z.dtype)
        for k in range(self.flows - 1, -1, -1):
            if self.invconv1x1 is None:
                z = jnp.flip(z, 2)
            else:
                mixed, log_det_w = self.invconv1x1[k].reverse(
                    params["invconv1x1"][k], z[:, 0])
                z = mixed[:, None]
                logdet = logdet + log_det_w

            wn = self.WNs[k]
            wn_params = params["WNs"][k]

            kernel_ok = static_w and "b" not in wn_params["V"]
            use_vmem = kernel_ok and _ar.flow_vmem_supported(
                wn, w_pad, g, z.dtype, fast)
            use_dma = kernel_ok and _ar.ar_step_supported(wn, w, z.dtype)
            mode = _ar.fused_ar_mode()
            if not (use_vmem or use_dma):
                mode = "off"

            def fused_flow(p, zz, yy, *, wn=wn, uv=use_vmem):
                return self._flow_inverse_fused(wn, p, zz, yy,
                                                use_vmem=uv, fast=fast)

            def scan_flow(p, zz, yy, *, wn=wn):
                return self._flow_inverse_scan(wn, p, zz, yy)

            if mode == "on":
                z, ld = fused_flow(wn_params, z, y)
            elif mode == "off":
                z, ld = scan_flow(wn_params, z, y)
            else:
                # auto: branch on the LOWERING platform (not the host
                # backend), so a serving artifact exported from a CPU-only
                # host for platforms=("tpu", ...) contains the fused kernel
                # on its TPU branch and the scan on every other platform
                z, ld = jax.lax.platform_dependent(
                    wn_params, z, y, tpu=fused_flow, default=scan_flow)
            logdet = logdet + ld

        return self._unsqueeze(z), logdet

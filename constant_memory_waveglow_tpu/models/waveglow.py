"""WaveGlow — squeeze-flow vocoder with early outputs.

TPU-native re-design of reference ``WaveGlow`` (``model/waveglow.py:108-212``):
audio squeezed into ``n_group`` channels, depthwise transposed-conv mel
upsampler, per-flow invertible 1x1 + affine coupling with a WN conditioner,
early-output extraction every ``n_early_every`` flows with ``z_split_sizes``
bookkeeping.  The flow loop is unrolled in Python (channel widths change at
early outputs).  ``memory_efficient=True`` selects the custom_vjp
constant-memory blocks; no ``.clone()`` protocol is needed — buffer liveness
is XLA's job.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import FlowBase
from .wn import WN
from ..flows.invconv import InvertibleConv1x1
from ..flows.coupling import AffineCouplingBlock
from ..flows.scan_group import make_flow_group, stack_flow_params
from ..ops.convs import conv_transpose1d, torch_conv_uniform_init
from ..ops.weightnorm import wn_init, wn_weight


class WaveGlow(FlowBase):
    def __init__(self,
                 flows,
                 n_group,
                 n_early_every,
                 n_early_size,
                 hop_size,
                 n_mels,
                 memory_efficient,
                 reverse_mode=False,
                 scan_flows=True,
                 **wn_kwargs):
        super().__init__(hop_size, reverse_mode)
        self.flows = flows
        self.n_group = n_group
        self.n_early_every = n_early_every
        self.n_early_size = n_early_size
        self.n_mels = n_mels
        self.mem_efficient = memory_efficient
        # scan over equal-width flow groups: one custom_vjp per group whose
        # backward is a reversed lax.scan -> structurally one flow's WN
        # internals live at a time (see flows/scan_group.py).  reverse_mode
        # (construct-inverted training) selects the inverted-unit group
        # scans — the guarantee holds in both construction modes.
        self.scan_flows = scan_flows and memory_efficient

        self.upsample_factor = self._hop_length // n_group
        self.sub_win_size = self.upsample_factor * 2 + 1
        self.upsample_pad = self.sub_win_size // 2 - self.upsample_factor // 2

        self.invconv1x1 = []
        self.WNs = []
        n_remaining = n_group
        self.z_split_sizes = []
        self.flow_groups = []  # runs of equal-width flows (early splits between)
        for k in range(flows):
            if k % n_early_every == 0 and k:
                n_remaining -= n_early_size
                self.z_split_sizes.append(n_early_size)
                self.flow_groups.append([])
            if not self.flow_groups:
                self.flow_groups.append([])
            self.flow_groups[-1].append(k)
            self.invconv1x1.append(
                InvertibleConv1x1(n_remaining, memory_efficient=memory_efficient,
                                  reverse_mode=reverse_mode))
            self.WNs.append(
                AffineCouplingBlock(
                    WN(in_channels=n_remaining // 2, aux_channels=n_mels, **wn_kwargs),
                    memory_efficient=memory_efficient, reverse_mode=reverse_mode))
        self.z_split_sizes.append(n_remaining)
        # per-group scanned flow functions (forward, reverse, fwd_eff, rev_eff)
        self._group_fns = [
            make_flow_group(self.WNs[g[0]].F.apply, reverse_mode=reverse_mode)
            for g in self.flow_groups]

    # ------------------------------------------------------------------ params
    def init(self, key):
        keys = jax.random.split(key, 1 + 2 * self.flows)
        # depthwise ConvTranspose1d(n_mels, n_mels, 2u+1, stride=u, groups=n_mels)
        # (model/waveglow.py:126-129); weight layout [in=n_mels, out/groups=1, K]
        up_w = torch_conv_uniform_init(
            keys[0], (self.n_mels, 1, self.sub_win_size),
            fan_in=self.sub_win_size)  # torch ConvTranspose fan_in = (out/groups)*K
        # bias follows the same U(-1/sqrt(fan_in), ..) bound (torch default)
        up_b = torch_conv_uniform_init(
            jax.random.fold_in(keys[0], 1), (self.n_mels,),
            fan_in=self.sub_win_size)
        params = {
            "upsampler": {"w": wn_init(up_w), "b": up_b},
            "invconv1x1": [c.init(k) for c, k in zip(self.invconv1x1, keys[1::2])],
            "WNs": [b.init(k) for b, k in zip(self.WNs, keys[2::2])],
        }
        if self.scan_flows:
            # native layout = the scanned-group layout: params are stored
            # flow-stacked per group, so forward/backward consume them with
            # ZERO per-step restacking copies — the remaining memory slope
            # per flow is just the parameters themselves (args, not temps)
            params = self.stack_param_layout(params)
        return params

    def stack_param_layout(self, legacy):
        """Per-flow list layout -> flow-stacked scan-group layout.

        Keys other than the per-flow lists (upsampler, subclass extras like
        WSRGlow's embeddings) pass through untouched."""
        out = {k: v for k, v in legacy.items() if k not in ("invconv1x1", "WNs")}
        out["groups"] = [self._stacked_group_params(legacy, g)
                        for g in self.flow_groups]
        return out

    def unstack_param_layout(self, params):
        """Flow-stacked layout -> per-flow list layout (tooling/export)."""
        if "groups" not in params:
            return params
        inv, wns = [], []
        for gp in params["groups"]:
            n = jax.tree_util.tree_leaves(gp["invconv"])[0].shape[0]
            for i in range(n):
                take = lambda a: a[i]
                inv.append(jax.tree_util.tree_map(take, gp["invconv"]))
                wns.append({"F": jax.tree_util.tree_map(take, gp["WN"])})
        out = {k: v for k, v in params.items() if k != "groups"}
        out["invconv1x1"] = inv
        out["WNs"] = wns
        return out

    # --------------------------------------------------------------- internals
    def _upsample_h(self, params, h):
        w = wn_weight(params["upsampler"]["w"])
        y = conv_transpose1d(h, w, stride=self.upsample_factor,
                             padding=self.upsample_pad, groups=self.n_mels)
        return y + params["upsampler"]["b"][None, :, None]

    def _squeeze(self, x):
        b = x.shape[0]
        return x.reshape(b, -1, self.n_group).transpose(0, 2, 1)

    def _unsqueeze(self, x):
        b = x.shape[0]
        return x.transpose(0, 2, 1).reshape(b, -1)

    def _stacked_group_params(self, params, group):
        return stack_flow_params([params["invconv1x1"][k] for k in group],
                                 [params["WNs"][k] for k in group])

    def _group_params(self, params, gi):
        """Stacked params for group gi: native when the tree carries the
        scan-group layout, lazily stacked from a per-flow-list tree (torch
        imports, parity tooling) otherwise."""
        if "groups" in params:
            return params["groups"][gi]
        return self._stacked_group_params(params, self.flow_groups[gi])

    # ------------------------------------------------------------------- flows
    def forward_computation(self, params, x, h):
        """x: [B, T] audio, h: [B, n_mels, frames] -> (z [B, T], logdet [B])."""
        y = self._upsample_h(params, h)
        x = self._squeeze(x)
        assert x.shape[2] <= y.shape[2], (x.shape, y.shape)
        y = y[..., : x.shape[2]]

        output_audio = []
        logdet = jnp.zeros((x.shape[0],), x.dtype)

        if self.scan_flows:
            for gi, group in enumerate(self.flow_groups):
                if gi:
                    early, x = x[:, : self.n_early_size], x[:, self.n_early_size :]
                    output_audio.append(early)
                fwd_eff = self._group_fns[gi][2]
                x, ld = fwd_eff(self._group_params(params, gi), x, y)
                logdet = logdet + ld
        else:
            for k in range(self.flows):
                if k % self.n_early_every == 0 and k:
                    early, x = x[:, : self.n_early_size], x[:, self.n_early_size :]
                    output_audio.append(early)

                x, log_det_w = self.invconv1x1[k].forward(params["invconv1x1"][k], x)
                x, log_s = self.WNs[k].forward(params["WNs"][k], x, y)
                logdet = logdet + log_det_w + log_s.sum((1, 2))

        output_audio.append(x)
        return self._unsqueeze(jnp.concatenate(output_audio, 1)), logdet

    def reverse_computation(self, params, z, h):
        y = self._upsample_h(params, h)
        z = self._squeeze(z)
        assert z.shape[2] <= y.shape[2]
        y = y[..., : z.shape[2]]

        splits = np.cumsum(self.z_split_sizes)[:-1]
        *remained_z, z = jnp.split(z, splits, axis=1)

        logdet = jnp.zeros((z.shape[0],), z.dtype)
        if self.scan_flows:
            for gi in range(len(self.flow_groups) - 1, -1, -1):
                rev_eff = self._group_fns[gi][3]
                z, ld = rev_eff(self._group_params(params, gi), z, y)
                logdet = logdet + ld
                if gi:
                    z = jnp.concatenate([remained_z.pop(), z], 1)
        else:
            for k in range(self.flows - 1, -1, -1):
                z, log_s = self.WNs[k].reverse(params["WNs"][k], z, y)
                z, log_det_w = self.invconv1x1[k].reverse(params["invconv1x1"][k], z)
                logdet = logdet + log_det_w + log_s.sum((1, 2))

                if k % self.n_early_every == 0 and k:
                    z = jnp.concatenate([remained_z.pop(), z], 1)

        return self._unsqueeze(z), logdet

"""MRWaveGlow — multi-resolution (Haar-pyramid) WaveGlow.

TPU-native re-design of reference ``MRWaveGlow`` (``model/mr_waveglow.py:14-134``):
``levels-1`` even/odd splits produce per-level difference bands transformed by
flows conditioned on the running mean band (+ mel unless super_resolution);
``prior_flows`` WaveGlow flows act on the coarsest band; reconstruction runs
coarse -> fine.  Mel is upsampled by linear interpolation (half-pixel, the
torch ``align_corners=False`` convention).

Deliberate fix vs the reference: the reference builds level conv1x1s as
``InvertibleConv1x1(in_channels, in_channels)`` (``model/mr_waveglow.py:46``),
accidentally passing the channel count as the ``memory_efficient`` flag and
dropping ``reverse_mode``; here both flags are forwarded properly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import FlowBase
from .wn import WN
from ..flows.invconv import InvertibleConv1x1
from ..flows.coupling import AffineCouplingBlock
from ..flows.scan_group import make_flow_group, stack_flow_params


class MRWaveGlow(FlowBase):
    def __init__(self, prior_flows, n_group, hop_size, n_mels, memory_efficient,
                 levels=3, flows=4, super_resolution=False, reverse_mode=False,
                 scan_flows=True, **wn_kwargs):
        super().__init__(hop_size, reverse_mode)
        self.flows = flows
        self.prior_flows = prior_flows
        self.n_group = n_group
        self.n_mels = n_mels
        self.super_resolution = super_resolution
        self.levels = levels
        self.upsample_factor = hop_size // n_group
        # structural constant-memory engine (flows/scan_group.py): each
        # level's equal-width flow run is one scanned group (the per-level
        # cond is constant across the run), the prior flows another — the
        # reference gives MRWaveGlow the same per-block guarantee via
        # AffineCouplingFunc (model/mr_waveglow.py:46,87-90)
        self.scan_flows = scan_flows and memory_efficient

        self.invconv1x1_list = []
        self.WNs_list = []
        in_channels = n_group
        for _ in range(levels - 1):
            in_channels //= 2
            self.invconv1x1_list.append([
                InvertibleConv1x1(in_channels, memory_efficient=memory_efficient,
                                  reverse_mode=reverse_mode)
                for _ in range(flows)])
            aux = in_channels + (0 if super_resolution else n_mels)
            self.WNs_list.append([
                AffineCouplingBlock(
                    WN(in_channels=in_channels // 2, aux_channels=aux, **wn_kwargs),
                    memory_efficient=memory_efficient, reverse_mode=reverse_mode)
                for _ in range(flows)])

        self.prior_invconv1x1 = [
            InvertibleConv1x1(in_channels, memory_efficient=memory_efficient,
                              reverse_mode=reverse_mode)
            for _ in range(prior_flows)]
        self.prior_WNs = [
            AffineCouplingBlock(
                WN(in_channels=in_channels // 2, aux_channels=n_mels, **wn_kwargs),
                memory_efficient=memory_efficient, reverse_mode=reverse_mode)
            for _ in range(prior_flows)]
        # scanned (forward, reverse, fwd_eff, rev_eff) per level + prior
        self._level_group_fns = [
            make_flow_group(self.WNs_list[lvl][0].F.apply,
                            reverse_mode=reverse_mode)
            for lvl in range(levels - 1)] if flows else []
        self._prior_group_fn = (
            make_flow_group(self.prior_WNs[0].F.apply,
                            reverse_mode=reverse_mode)
            if prior_flows else None)

    def init(self, key):
        n_keys = 2 * self.flows * (self.levels - 1) + 2 * self.prior_flows
        keys = iter(jax.random.split(key, n_keys))
        params = {"levels": [], "prior_invconv1x1": [], "prior_WNs": []}
        for lvl in range(self.levels - 1):
            lv = {"invconv1x1": [], "WNs": []}
            for f in range(self.flows):
                lv["invconv1x1"].append(self.invconv1x1_list[lvl][f].init(next(keys)))
                lv["WNs"].append(self.WNs_list[lvl][f].init(next(keys)))
            params["levels"].append(lv)
        for f in range(self.prior_flows):
            params["prior_invconv1x1"].append(self.prior_invconv1x1[f].init(next(keys)))
            params["prior_WNs"].append(self.prior_WNs[f].init(next(keys)))
        if self.scan_flows:
            params = self.stack_param_layout(params)
        return params

    # ------------------------------------------------------- layout conversion
    @staticmethod
    def canonical_root(d):
        """Canonical per-flow-list param root (Adam moments mirror it)."""
        return "prior_invconv1x1" in d and "prior_WNs" in d

    def stack_param_layout(self, legacy):
        """Per-flow list layout -> flow-stacked scan-group layout."""
        if "groups" in legacy:
            return legacy
        g = {"levels": [], "prior": None}
        if self.flows:
            for lvl in range(self.levels - 1):
                lv = legacy["levels"][lvl]
                g["levels"].append(
                    stack_flow_params(lv["invconv1x1"], lv["WNs"]))
        if self.prior_flows:
            g["prior"] = stack_flow_params(legacy["prior_invconv1x1"],
                                           legacy["prior_WNs"])
        out = {k: v for k, v in legacy.items()
               if k not in ("levels", "prior_invconv1x1", "prior_WNs")}
        out["groups"] = g
        return out

    def unstack_param_layout(self, params):
        """Flow-stacked layout -> per-flow list layout (tooling/export)."""
        if "groups" not in params:
            return params

        def split(gp):
            inv, wns = [], []
            n = jax.tree_util.tree_leaves(gp["invconv"])[0].shape[0]
            for i in range(n):
                take = lambda a, i=i: a[i]
                inv.append(jax.tree_util.tree_map(take, gp["invconv"]))
                wns.append({"F": jax.tree_util.tree_map(take, gp["WN"])})
            return inv, wns

        out = {k: v for k, v in params.items() if k != "groups"}
        out["levels"] = []
        if self.flows:
            for gp in params["groups"]["levels"]:
                inv, wns = split(gp)
                out["levels"].append({"invconv1x1": inv, "WNs": wns})
        pinv, pwns = ([], [])
        if self.prior_flows:
            pinv, pwns = split(params["groups"]["prior"])
        out["prior_invconv1x1"] = pinv
        out["prior_WNs"] = pwns
        return out

    def _level_params(self, params, lvl):
        if "groups" in params:
            return params["groups"]["levels"][lvl]
        lv = params["levels"][lvl]
        return stack_flow_params(lv["invconv1x1"], lv["WNs"])

    def _prior_params(self, params):
        if "groups" in params:
            return params["groups"]["prior"]
        return stack_flow_params(params["prior_invconv1x1"],
                                 params["prior_WNs"])

    def _upsample_h(self, h):
        """F.interpolate(mode='linear', align_corners=False) equivalent
        (reference ``model/mr_waveglow.py:133-134``)."""
        b, c, t = h.shape
        return jax.image.resize(h, (b, c, t * self.upsample_factor), method="linear")

    def _squeeze(self, x):
        b = x.shape[0]
        return x.reshape(b, -1, self.n_group).transpose(0, 2, 1)

    def _unsqueeze(self, x):
        b = x.shape[0]
        return x.transpose(0, 2, 1).reshape(b, -1)

    def forward_computation(self, params, x, h):
        y = self._upsample_h(h)
        x = self._squeeze(x)
        assert x.shape[2] <= y.shape[2]
        y = y[..., : x.shape[2]]

        output_audio = []
        logdet = jnp.zeros((x.shape[0],), x.dtype)
        for lvl in range(self.levels - 1):
            x0, x1 = x[:, ::2], x[:, 1::2]
            x_diff, x = x1 - x0, (x0 + x1) * 0.5
            cond = x if self.super_resolution else jnp.concatenate([x, y], 1)
            if self.scan_flows and self.flows:
                fwd_eff = self._level_group_fns[lvl][2]
                x_diff, ld = fwd_eff(self._level_params(params, lvl),
                                     x_diff, cond)
                logdet = logdet + ld
            else:
                for f in range(self.flows):
                    x_diff, log_det_w = self.invconv1x1_list[lvl][f].forward(
                        params["levels"][lvl]["invconv1x1"][f], x_diff)
                    x_diff, log_s = self.WNs_list[lvl][f].forward(
                        params["levels"][lvl]["WNs"][f], x_diff, cond)
                    logdet = logdet + log_det_w + log_s.sum((1, 2))
            output_audio.append(x_diff)

        if self.scan_flows and self.prior_flows:
            x, ld = self._prior_group_fn[2](self._prior_params(params), x, y)
            logdet = logdet + ld
        else:
            for f in range(self.prior_flows):
                x, log_det_w = self.prior_invconv1x1[f].forward(
                    params["prior_invconv1x1"][f], x)
                x, log_s = self.prior_WNs[f].forward(params["prior_WNs"][f], x, y)
                logdet = logdet + log_det_w + log_s.sum((1, 2))

        output_audio.append(x)
        return self._unsqueeze(jnp.concatenate(output_audio, 1)), logdet

    def reverse_computation(self, params, z, h):
        y = self._upsample_h(h)
        z = self._squeeze(z)
        assert z.shape[2] <= y.shape[2]
        y = y[..., : z.shape[2]]
        b, _, t = z.shape

        remained_z = []
        for _ in range(self.levels - 1):
            c = z.shape[1]
            remained_z.append(z[:, : c // 2])
            z = z[:, c // 2 :]

        logdet = jnp.zeros((b,), z.dtype)
        if self.scan_flows and self.prior_flows:
            z, ld = self._prior_group_fn[3](self._prior_params(params), z, y)
            logdet = logdet + ld
        else:
            for f in range(self.prior_flows - 1, -1, -1):
                z, log_s = self.prior_WNs[f].reverse(params["prior_WNs"][f], z, y)
                z, log_det_w = self.prior_invconv1x1[f].reverse(
                    params["prior_invconv1x1"][f], z)
                logdet = logdet + log_det_w + log_s.sum((1, 2))

        for lvl in range(self.levels - 2, -1, -1):
            z_diff = remained_z.pop()
            cond = z if self.super_resolution else jnp.concatenate([z, y], 1)
            if self.scan_flows and self.flows:
                rev_eff = self._level_group_fns[lvl][3]
                z_diff, ld = rev_eff(self._level_params(params, lvl),
                                     z_diff, cond)
                logdet = logdet + ld
            else:
                for f in range(self.flows - 1, -1, -1):
                    z_diff, log_s = self.WNs_list[lvl][f].reverse(
                        params["levels"][lvl]["WNs"][f], z_diff, cond)
                    z_diff, log_det_w = self.invconv1x1_list[lvl][f].reverse(
                        params["levels"][lvl]["invconv1x1"][f], z_diff)
                    logdet = logdet + log_det_w + log_s.sum((1, 2))
            z0, z1 = z - z_diff * 0.5, z + z_diff * 0.5
            z = jnp.stack([z0, z1], 2).reshape(b, -1, t)

        return self._unsqueeze(z), logdet

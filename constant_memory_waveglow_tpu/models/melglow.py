"""MelGlow — WaveGlow topology with location-variable convolutions (LVC).

TPU-native re-design of reference ``MelGlow`` (``model/melglow.py:13-258``):
the coupling network's dilated conv kernels are *predicted per mel frame* by a
BatchNorm/Tanh residual Predictor.  The reference applies them with an
``unfold`` + one giant grouped ``F.conv1d`` with ``groups=batch*steps``
(``model/melglow.py:75-90``) — a pattern with no efficient XLA lowering.
Here each layer is instead a per-(batch, frame) windowed contraction: gather
the time windows once, then ``radix`` batched GEMMs
``[2*dil, res] @ [res, offset]`` over the (B, frames) batch — exactly the
shape the MXU wants.

BatchNorm is functional: batch statistics inside the (recomputed) coupling
transform during training, running statistics for inference; running-stat
updates happen once per step outside autodiff (``train_forward``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import FlowBase
from ..flows.invconv import InvertibleConv1x1
from ..flows.coupling import AffineCouplingBlock
from ..ops.convs import conv1x1, torch_conv_uniform_init
from ..ops.gate import gated_tanh
from .wn import _conv_param, _apply_conv1x1

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


def _bn_init(c):
    params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return params, state


def _bn_apply(params, state, x, train):
    """BatchNorm1d on [B, C, T] (torch semantics)."""
    if train:
        mean = jnp.mean(x, axis=(0, 2))
        var = jnp.var(x, axis=(0, 2))
    else:
        mean, var = state["mean"], state["var"]
    inv = jax.lax.rsqrt(var + _BN_EPS)
    return (x - mean[None, :, None]) * (inv * params["scale"])[None, :, None] \
        + params["bias"][None, :, None]


def _bn_new_state(state, x):
    n = x.shape[0] * x.shape[2]
    mean = jnp.mean(x, axis=(0, 2))
    var = jnp.var(x, axis=(0, 2)) * n / max(n - 1, 1)  # unbiased for running
    m = _BN_MOMENTUM
    return {"mean": (1 - m) * state["mean"] + m * mean,
            "var": (1 - m) * state["var"] + m * var}


def _grouped_1x1(key, groups, c_in_pg, c_out_pg, bias):
    kw, kb = jax.random.split(key)
    w = torch_conv_uniform_init(kw, (groups * c_out_pg, c_in_pg, 1))
    p = {"w": w}
    if bias:
        bound = 1.0 / np.sqrt(c_in_pg)
        p["b"] = jax.random.uniform(kb, (groups * c_out_pg,), minval=-bound, maxval=bound)
    return p


def _apply_grouped_1x1(p, x, groups):
    """x: [B, g*c_in, T], w: [g*c_out, c_in, 1] -> [B, g*c_out, T]."""
    b, _, t = x.shape
    w = p["w"][..., 0]
    c_out = w.shape[0] // groups
    c_in = w.shape[1]
    xg = x.reshape(b, groups, c_in, t)
    wg = w.reshape(groups, c_out, c_in)
    y = jnp.einsum("goi,bgit->bgot", wg, xg).reshape(b, groups * c_out, t)
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


class Predictor:
    """Per-frame LVC kernel predictor (reference ``Predictor``,
    ``model/melglow.py:13-49``): 1x1 conv + BN + Tanh resblocks grouped by
    flow depth."""

    def __init__(self, in_channels, out_channels, hidden_channels, layers, bias, groups):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.hidden = hidden_channels
        self.layers = layers
        self.bias = bias
        self.groups = groups

    def init(self, key):
        g, h = self.groups, self.hidden
        keys = jax.random.split(key, 2 + 2 * self.layers)
        p_start = _conv_param(keys[0], (h * g, self.in_channels, 1), self.bias, wnorm=False)
        bn_p, bn_s = _bn_init(h * g)
        params = {"start": p_start, "start_bn": bn_p, "blocks": [],
                  "end": _grouped_1x1(keys[1], g, h, self.out_channels, self.bias)}
        state = {"start_bn": bn_s, "blocks": []}
        for i in range(self.layers):
            k1, k2 = keys[2 + 2 * i], keys[3 + 2 * i]
            bp1, bs1 = _bn_init(h * g)
            bp2, bs2 = _bn_init(h * g)
            params["blocks"].append({
                "conv1": _grouped_1x1(k1, g, h, h, self.bias), "bn1": bp1,
                "conv2": _grouped_1x1(k2, g, h, h, self.bias), "bn2": bp2,
            })
            state["blocks"].append({"bn1": bs1, "bn2": bs2})
        return params, state

    def apply(self, params, state, x, train):
        x = _apply_conv1x1(params["start"], x)
        x = jnp.tanh(_bn_apply(params["start_bn"], state["start_bn"], x, train))
        for bp, bs in zip(params["blocks"], state["blocks"]):
            h = _apply_grouped_1x1(bp["conv1"], x, self.groups)
            h = jnp.tanh(_bn_apply(bp["bn1"], bs["bn1"], h, train))
            h = _apply_grouped_1x1(bp["conv2"], h, self.groups)
            h = jnp.tanh(_bn_apply(bp["bn2"], bs["bn2"], h, train))
            x = h + x
        # final kernel projection: one einsum PER flow-depth group, each
        # emitting a frame-major [B, F, out_pg] tensor.  A single stacked
        # output tensor (~930 MB/flow of predicted kernels at the shipped
        # config) forced the backward to concatenate+relayout the per-layer
        # kernel gradients into one monster tensor (round-5 trace:
        # ~12 ms/step of 266 MB copies); per-layer outputs keep each
        # gradient inside its own GEMM
        b, _, t = x.shape
        g = self.groups
        w = params["end"]["w"][..., 0]
        c_out, c_in = w.shape[0] // g, w.shape[1]
        wg = w.reshape(g, c_out, c_in)
        xg = x.reshape(b, g, c_in, t)
        outs = []
        for i in range(g):
            y = jnp.einsum("oi,bit->bto", wg[i], xg[:, i])
            if "b" in params["end"]:
                y = y + params["end"]["b"].reshape(g, c_out)[i][None, None]
            outs.append(y)
        return outs  # list of g x [B, F, out_pg]

    def new_state(self, params, state, x):
        """Running-stat update pass (torch BN side-effect, done explicitly)."""
        new = {"start_bn": None, "blocks": []}
        x = _apply_conv1x1(params["start"], x)
        new["start_bn"] = _bn_new_state(state["start_bn"], x)
        x = jnp.tanh(_bn_apply(params["start_bn"], state["start_bn"], x, True))
        for bp, bs in zip(params["blocks"], state["blocks"]):
            h = _apply_grouped_1x1(bp["conv1"], x, self.groups)
            s1 = _bn_new_state(bs["bn1"], h)
            h = jnp.tanh(_bn_apply(bp["bn1"], bs["bn1"], h, True))
            h2 = _apply_grouped_1x1(bp["conv2"], h, self.groups)
            s2 = _bn_new_state(bs["bn2"], h2)
            h2 = jnp.tanh(_bn_apply(bp["bn2"], bs["bn2"], h2, True))
            new["blocks"].append({"bn1": s1, "bn2": s2})
            x = h2 + x
        return new


class WN_LVC:
    """Location-variable-conv WaveNet (reference ``WN_LVC``,
    ``model/melglow.py:93-159``).  ``apply`` takes variables
    ``{"p": params, "s": bn_state}`` so it can live inside the coupling
    custom_vjp (predictor recomputed in backward, reference-style)."""

    def __init__(self, in_channels, aux_channels, depth, dilation_channels,
                 residual_channels, skip_channels, predict_channels,
                 predict_layers, radix, bias, zero_init=True, train=False):
        self.in_channels = in_channels
        self.aux_channels = aux_channels
        self.depth = depth
        self.dil = dilation_channels
        self.res = residual_channels
        self.skip = skip_channels
        self.radix = radix
        self.bias = bias
        self.zero_init = zero_init
        self.train = train
        self.dilations = [2**i for i in range(depth)]
        self.r_field = sum(self.dilations) + 1
        self.pred = Predictor(
            aux_channels, 2 * dilation_channels * residual_channels * radix,
            predict_channels, predict_layers, bias, depth)

    def init(self, key):
        keys = jax.random.split(key, 3 + self.depth)
        params = {
            "start": _conv_param(keys[0], (self.res, self.in_channels, 1), self.bias),
            "layers": [],
        }
        for i in range(self.depth):
            last = i == self.depth - 1
            out_ch = self.skip if last else self.res + self.skip
            params["layers"].append({
                "W_o": _conv_param(keys[3 + i], (out_ch, self.dil, 1), self.bias),
            })
        end_w = (jnp.zeros((2 * self.in_channels, self.skip, 1)) if self.zero_init
                 else torch_conv_uniform_init(keys[1], (2 * self.in_channels, self.skip, 1)))
        params["end"] = {"w": end_w}
        if self.bias:
            params["end"]["b"] = jnp.zeros((2 * self.in_channels,))
        pred_p, pred_s = self.pred.init(keys[2])
        params["pred"] = pred_p
        return {"p": params, "s": pred_s}

    def _lvc_layer(self, x, w, dilation):
        """x: [B, res, T], w: [B, steps, 2*dil, res, radix] -> [B, 2*dil, T].

        The unfold+grouped-conv trick (``model/melglow.py:80-86``) as
        ``radix`` batched GEMMs over (batch, frame) windows.

        Windows are built from ``ceil(L/offset)`` shifted strided reshapes
        (slice + reshape + concat), NOT an index gather: the gather's
        transpose is a scatter-add which the round-5 trace measured at
        ~97 GB/s (~13 ms/step over the 7 layers); slice transposes are
        pad+add at full bandwidth.  Equivalence: window s covers padded
        positions [s*offset, s*offset + L), and part_j[s, q] =
        xp[s*offset + j*offset + q] tiles exactly that range."""
        b, r, t = x.shape
        steps = w.shape[1]
        offset = t // steps
        pad = dilation * (self.radix - 1) // 2
        L = offset + 2 * pad  # window length
        n_parts = -(-L // offset)  # ceil
        # pad so every shifted slice [j*offset, j*offset + t) exists
        tail = (n_parts - 1) * offset - 2 * pad
        xp = jnp.pad(x, [(0, 0), (0, 0), (pad, pad + max(tail, 0))])
        parts = [
            xp[:, :, j * offset : j * offset + t].reshape(b, r, steps, offset)
            for j in range(n_parts)
        ]
        win = jnp.concatenate(parts, axis=-1)[..., :L]  # [B, res, steps, L]
        z = 0.0
        for k in range(self.radix):
            z = z + jnp.einsum("bsor,brst->bsot", w[..., k],
                               win[..., k * dilation : k * dilation + offset])
        # [B, steps, 2*dil, offset] -> [B, 2*dil, T]
        return z.transpose(0, 2, 1, 3).reshape(b, -1, t)

    def apply(self, variables, x, y):
        params, bn_state = variables["p"], variables["s"]
        x = _apply_conv1x1(params["start"], x)
        # list of depth x [B, F, out_pg] frame-major kernel tensors
        weights = self.pred.apply(params["pred"], bn_state, y, self.train)
        b, steps = weights[0].shape[0], weights[0].shape[1]

        cum_skip = 0.0
        for i, (lp, d) in enumerate(zip(params["layers"], self.dilations)):
            w = weights[i].reshape(
                b, steps, 2 * self.dil, self.res, self.radix)
            z = self._lvc_layer(x, w, d)
            zw, zv = jnp.split(z, 2, axis=1)
            z = gated_tanh(zw, zv)
            out = _apply_conv1x1(lp["W_o"], z)
            if i == self.depth - 1:
                skip = out
            else:
                x = x + out[:, : self.res]
                skip = out[:, self.res :]
            cum_skip = cum_skip + skip
        out = _apply_conv1x1(params["end"], cum_skip)
        log_s, t = jnp.split(out, 2, axis=1)
        return log_s, t


class MelGlow(FlowBase):
    has_state = True

    def __init__(self, flows, n_group, n_early_every, n_early_size, hop_size,
                 n_mels, memory_efficient, reverse_mode=False, scan_flows=True,
                 **lvc_kwargs):
        super().__init__(hop_size, reverse_mode)
        self.flows = flows
        self.n_group = n_group
        self.n_early_every = n_early_every
        self.n_early_size = n_early_size
        self.n_mels = n_mels
        self.mem_efficient = memory_efficient
        # same structural constant-memory engine as WaveGlow: equal-width
        # flow runs scan as one group-level custom_vjp (flows/scan_group.py).
        # The LVC coupling fits the same contract — f_apply is
        # WN_LVC.apply({"p": params, "s": bn_state}, xa, y); the BN state
        # rides the stacked "WN" pytree (its cotangents are zeros: training
        # couplings use batch stats) — the reference gives MelGlow the
        # identical AffineCouplingFunc guarantee (model/melglow.py:203-258).
        self.scan_flows = scan_flows and memory_efficient
        self.upsample_factor = hop_size // n_group

        self.invconv1x1 = []
        self.wn_cfgs = []
        self.couplings = {True: [], False: []}  # train -> blocks
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
            self.invconv1x1.append(InvertibleConv1x1(
                n_remaining, memory_efficient=memory_efficient,
                reverse_mode=reverse_mode))
            cfg = dict(in_channels=n_remaining // 2, aux_channels=n_mels, **lvc_kwargs)
            self.wn_cfgs.append(cfg)
            for train in (False, True):
                self.couplings[train].append(AffineCouplingBlock(
                    WN_LVC(train=train, **cfg),
                    memory_efficient=memory_efficient, reverse_mode=reverse_mode))
        self.z_split_sizes.append(n_remaining)
        from ..flows.scan_group import make_flow_group
        # (forward, reverse, fwd_eff, rev_eff) per group, per BN mode
        self._group_fns = {
            train: [make_flow_group(self.couplings[train][g[0]].F.apply,
                                    reverse_mode=reverse_mode)
                    for g in self.flow_groups]
            for train in (False, True)}

    def init(self, key):
        keys = jax.random.split(key, 2 * self.flows)
        params = {"invconv1x1": [], "WNs": []}
        state = {"WNs": []}
        for k in range(self.flows):
            params["invconv1x1"].append(self.invconv1x1[k].init(keys[2 * k]))
            v = self.couplings[False][k].init(keys[2 * k + 1])
            params["WNs"].append(v["F"]["p"])
            state["WNs"].append(v["F"]["s"])
        if self.scan_flows:
            # native layout is flow-stacked per group (zero per-step
            # restacking copies — MelGlow predictor params are ~25 MB/flow
            # at the LJ config, so lazy stacking would show up as a
            # params-sized temp slope); canonical on-disk layout stays
            # per-flow lists (Experiment.canonical_state)
            params = self.stack_param_layout(params)
            state = self.stack_param_layout(state)
        return {"params": params, "state": state}

    # ------------------------------------------------------- layout conversion
    @staticmethod
    def canonical_root(d):
        """Canonical (per-flow list) roots inside a train-state tree: the
        params root {"invconv1x1", "WNs"} (Adam moments mirror it) and the
        BN-state root {"WNs"} alone."""
        return ("invconv1x1" in d and "WNs" in d) or set(d) == {"WNs"}

    def _stack_lists(self, inv_list, wn_list):
        groups = []
        for g in self.flow_groups:
            gp = {"WN": jax.tree_util.tree_map(
                lambda *a: jnp.stack(a), *[wn_list[k] for k in g])}
            if inv_list is not None:
                gp["invconv"] = jax.tree_util.tree_map(
                    lambda *a: jnp.stack(a), *[inv_list[k] for k in g])
            groups.append(gp)
        return groups

    def stack_param_layout(self, legacy):
        """Per-flow list layout -> flow-stacked scan-group layout (params-
        shaped and state-shaped trees both)."""
        if "groups" in legacy:
            return legacy
        out = {k: v for k, v in legacy.items() if k not in ("invconv1x1", "WNs")}
        out["groups"] = self._stack_lists(legacy.get("invconv1x1"),
                                          legacy["WNs"])
        return out

    def unstack_param_layout(self, params):
        """Flow-stacked layout -> per-flow list layout (tooling/export)."""
        if "groups" not in params:
            return params
        inv, wns = [], []
        for gp in params["groups"]:
            n = jax.tree_util.tree_leaves(gp["WN"])[0].shape[0]
            for i in range(n):
                take = lambda a, i=i: a[i]
                wns.append(jax.tree_util.tree_map(take, gp["WN"]))
                if "invconv" in gp:
                    inv.append(jax.tree_util.tree_map(take, gp["invconv"]))
        out = {k: v for k, v in params.items() if k != "groups"}
        out["WNs"] = wns
        if inv:
            out["invconv1x1"] = inv
        return out

    # ----------------------------------------------------------------- common
    def _squeeze(self, x):
        b = x.shape[0]
        t = x.shape[1] // self._hop_length * self._hop_length
        return x[:, :t].reshape(b, -1, self.n_group).transpose(0, 2, 1)

    def _unsqueeze(self, x):
        b = x.shape[0]
        return x.transpose(0, 2, 1).reshape(b, -1)

    def _flow_vars(self, params, state, k):
        return {"F": {"p": params["WNs"][k], "s": state["WNs"][k]}}

    def _group_vars(self, params, state, gi):
        """Stacked scan-group variables for group gi: native when the trees
        carry the scan-group layout, lazily stacked otherwise (torch
        imports, parity tooling).  BN state rides the "WN" pytree as
        ``{"p": params, "s": state}`` — exactly what WN_LVC.apply eats."""
        if "groups" in params:
            return {"invconv": params["groups"][gi]["invconv"],
                    "WN": {"p": params["groups"][gi]["WN"],
                           "s": state["groups"][gi]["WN"]}}
        g = self.flow_groups[gi]
        stk = lambda *a: jnp.stack(a)
        return {
            "invconv": jax.tree_util.tree_map(
                stk, *[params["invconv1x1"][k] for k in g]),
            "WN": {"p": jax.tree_util.tree_map(
                       stk, *[params["WNs"][k] for k in g]),
                   "s": jax.tree_util.tree_map(
                       stk, *[state["WNs"][k] for k in g])}}

    def _run_forward(self, params, state, x, h, train):
        x = self._squeeze(x)
        y = h[..., : x.shape[2] // self.upsample_factor]

        output_audio = []
        logdet = jnp.zeros((x.shape[0],), x.dtype)
        if self.scan_flows:
            for gi in range(len(self.flow_groups)):
                if gi:
                    output_audio.append(x[:, : self.n_early_size])
                    x = x[:, self.n_early_size :]
                fwd_eff = self._group_fns[train][gi][2]
                x, ld = fwd_eff(self._group_vars(params, state, gi), x, y)
                logdet = logdet + ld
        else:
            couplings = self.couplings[train]
            for k in range(self.flows):
                if k % self.n_early_every == 0 and k:
                    output_audio.append(x[:, : self.n_early_size])
                    x = x[:, self.n_early_size :]
                x, log_det_w = self.invconv1x1[k].forward(params["invconv1x1"][k], x)
                x, log_s = couplings[k].forward(self._flow_vars(params, state, k), x, y)
                logdet = logdet + log_det_w + log_s.sum((1, 2))
        output_audio.append(x)
        return self._unsqueeze(jnp.concatenate(output_audio, 1)), logdet

    def _run_reverse(self, params, state, z, h, train):
        z = self._squeeze(z)
        y = h[..., : z.shape[2] // self.upsample_factor]

        splits = np.cumsum(self.z_split_sizes)[:-1]
        *remained_z, z = jnp.split(z, splits, axis=1)

        logdet = jnp.zeros((z.shape[0],), z.dtype)
        if self.scan_flows:
            for gi in range(len(self.flow_groups) - 1, -1, -1):
                rev_eff = self._group_fns[train][gi][3]
                z, ld = rev_eff(self._group_vars(params, state, gi), z, y)
                logdet = logdet + ld
                if gi:
                    z = jnp.concatenate([remained_z.pop(), z], 1)
        else:
            couplings = self.couplings[train]
            for k in range(self.flows - 1, -1, -1):
                z, log_s = couplings[k].reverse(self._flow_vars(params, state, k), z, y)
                z, log_det_w = self.invconv1x1[k].reverse(params["invconv1x1"][k], z)
                logdet = logdet + log_det_w + log_s.sum((1, 2))
                if k % self.n_early_every == 0 and k:
                    z = jnp.concatenate([remained_z.pop(), z], 1)
        return self._unsqueeze(z), logdet

    # --------------------------------------------------------- public surface
    def forward_computation(self, variables, x, h):
        return self._run_forward(variables["params"], variables["state"], x, h, False)

    def reverse_computation(self, variables, z, h):
        return self._run_reverse(variables["params"], variables["state"], z, h, False)

    def train_forward(self, params, state, x, h):
        """Training step direction with batch-stat BN + running-stat update."""
        if self._reverse_mode:
            z, logdet = self._run_reverse(params, state, x, h, True)
        else:
            z, logdet = self._run_forward(params, state, x, h, True)
        xs = self._squeeze(x)
        y = h[..., : xs.shape[2] // self.upsample_factor]
        new_state = jax.lax.stop_gradient(self._update_bn(params, state, y))
        return z, logdet, new_state

    def _update_bn(self, params, state, y):
        if "groups" in state:
            # native stacked layout: one vmapped running-stat pass per
            # group over the flow axis (the Predictor config is identical
            # across flows — only the coupling's in_channels varies, and
            # the predictor never sees it)
            pred = self.couplings[True][0].F.pred
            upd = jax.vmap(pred.new_state, in_axes=(0, 0, None))
            return {"groups": [
                {"WN": upd(params["groups"][gi]["WN"]["pred"],
                           state["groups"][gi]["WN"], y)}
                for gi in range(len(self.flow_groups))]}
        new = {"WNs": []}
        for k in range(self.flows):
            pred = self.couplings[True][k].F.pred
            new["WNs"].append(pred.new_state(params["WNs"][k]["pred"],
                                             state["WNs"][k], y))
        return new

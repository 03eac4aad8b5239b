"""Import reference PyTorch-Lightning checkpoints into our param pytrees.

The reference trains with Lightning and ships ``.ckpt`` files whose
``state_dict`` holds the ``LightModel``'s weights under a ``model.`` prefix
(``model/lightning.py:16-39``) and whose ``hyper_parameters`` is the full
experiment config (``model/lightning.py:30-31``).  The models here are
weight-compatible by design (same shapes/layouts, weight-norm kept as
``{v, g}`` pairs), so a reference-trained model can be converted and served
by this framework directly.

Covers all five reference families: WaveGlow, WSRGlow (extra embeddings),
WaveFlow, MRWaveGlow, and MelGlow — whose LVC-predictor BatchNorm splits
into affine params and a running-stats model_state tree here
(:func:`torch_state_dict_to_variables` returns both).
"""

from __future__ import annotations

import re

import numpy as np


def _nest(state_dict, prefix=""):
    """Dotted torch keys -> nested dict of numpy arrays (lists for digits)."""
    root = {}
    for key, val in state_dict.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(val.detach().cpu().numpy()
                                     if hasattr(val, "detach") else val)
    return root


def _listify(node):
    """Convert {'0': ..., '1': ...} dicts into ordered lists, recursively."""
    if isinstance(node, dict):
        if node and all(re.fullmatch(r"\d+", k) for k in node):
            # nn.Sequential indices can be sparse in the state_dict when some
            # members are parameter-free (e.g. the reference WaveFlow upsampler
            # Sequential(ReplicationPad1d, ConvTranspose1d, LeakyReLU) only
            # stores index 1) — keep positions, fill gaps with {}
            n = max(int(k) for k in node) + 1
            return [_listify(node.get(str(i), {})) for i in range(n)]
        return {k: _listify(v) for k, v in node.items()}
    return node


def _conv(node):
    """torch conv entry (weight-normed or plain) -> our conv param dict."""
    p = {}
    if "weight_v" in node:
        p["w"] = {"v": node["weight_v"], "g": node["weight_g"]}
    else:
        p["w"] = node["weight"]
    if "bias" in node:
        p["b"] = node["bias"]
    return p


def _wn(node):
    """Reference WN (1-D or 2-D) subtree -> our WN param dict."""
    out = {
        "V": _conv(node["V"]),
        "start": _conv(node["start"]),
        "layers": [{"W": _conv(l["W"]), "W_o": _conv(l["W_o"])}
                   for l in node["layers"]],
        "end": {"w": node["end"]["weight"]},
    }
    if "bias" in node["end"]:
        out["end"]["b"] = node["end"]["bias"]
    return out


def _bn(node):
    """torch BatchNorm entry -> (affine params, running-stats state)."""
    return ({"scale": node["weight"], "bias": node["bias"]},
            {"mean": node["running_mean"], "var": node["running_var"]})


def _predictor(node):
    """Reference MelGlow LVC ``Predictor`` (``model/melglow.py:13-49``):
    Sequential(conv, BN, tanh) start, res_blocks of
    Sequential(conv, BN, tanh, conv, BN, tanh), plain end conv."""
    sp, ss = _bn(node["start"][1])
    params = {"start": _conv(node["start"][0]), "start_bn": sp,
              "blocks": [], "end": _conv(node["end"])}
    state = {"start_bn": ss, "blocks": []}
    for blk in node["res_blocks"]:
        b1p, b1s = _bn(blk[1])
        b2p, b2s = _bn(blk[4])
        params["blocks"].append({"conv1": _conv(blk[0]), "bn1": b1p,
                                 "conv2": _conv(blk[3]), "bn2": b2p})
        state["blocks"].append({"bn1": b1s, "bn2": b2s})
    return params, state


def torch_state_dict_to_params(state_dict, arch_type, prefix="model."):
    """Map a reference checkpoint ``state_dict`` to our parameter pytree.

    For stateless families only; MelGlow carries BatchNorm running stats,
    use :func:`torch_state_dict_to_variables` to get (params, model_state).
    """
    params, _ = torch_state_dict_to_variables(state_dict, arch_type, prefix)
    return params


def torch_state_dict_to_variables(state_dict, arch_type, prefix="model."):
    """Map a reference checkpoint to ``(params, model_state)``.

    ``model_state`` is ``{}`` for every family except MelGlow, whose LVC
    predictors' BatchNorm running stats live in the functional state tree
    (updated outside autodiff during training, frozen at inference).
    """
    tree = _listify(_nest(state_dict, prefix))

    if arch_type == "MelGlow":
        params = {"invconv1x1": [{"W": c["weight"][..., 0]}
                                 for c in tree["invconv1x1"]],
                  "WNs": []}
        state = {"WNs": []}
        for b in tree["WNs"]:
            wn = b["F"]
            wp = {
                "start": _conv(wn["start"]),
                "layers": [{"W_o": _conv(l["W_o"])} for l in wn["layers"]],
                "end": {"w": wn["end"]["weight"]},
            }
            if "bias" in wn["end"]:
                wp["end"]["b"] = wn["end"]["bias"]
            pp, ps = _predictor(wn["pred"])
            wp["pred"] = pp
            params["WNs"].append(wp)
            state["WNs"].append(ps)
        return params, state

    if arch_type in ("WaveGlow", "WSRGlow"):
        params = {
            "upsampler": _conv(tree["upsampler"]),
            "invconv1x1": [{"W": c["weight"][..., 0]}
                           for c in tree["invconv1x1"]],
            "WNs": [{"F": _wn(b["F"])} for b in tree["WNs"]],
        }
        if arch_type == "WSRGlow":
            params["mu_embed"] = tree["mu_enc"][1]["weight"]
            params["angle_embed"] = tree["angle_embed"]["embed"]["weight"]
        return params, {}

    if arch_type == "WaveFlow":
        params = {
            # reference upsampler = Sequential(ReplicationPad, ConvTranspose)
            "upsampler": _conv(tree["upsampler"][1]),
            "WNs": [_wn(wn) for wn in tree["WNs"]],
        }
        if "invconv1x1" in tree:
            params["invconv1x1"] = [{"W": c["weight"][..., 0]}
                                    for c in tree["invconv1x1"]]
        return params, {}

    if arch_type == "MRWaveGlow":
        params = {"levels": [], "prior_invconv1x1": [], "prior_WNs": []}
        for inv_lvl, wn_lvl in zip(tree["invconv1x1_list"], tree["WNs_list"]):
            params["levels"].append({
                "invconv1x1": [{"W": c["weight"][..., 0]} for c in inv_lvl],
                "WNs": [{"F": _wn(b["F"])} for b in wn_lvl],
            })
        params["prior_invconv1x1"] = [{"W": c["weight"][..., 0]}
                                      for c in tree["prior_invconv1x1"]]
        params["prior_WNs"] = [{"F": _wn(b["F"])} for b in tree["prior_WNs"]]
        return params, {}

    raise NotImplementedError(
        f"torch import not supported for arch {arch_type!r}")


def import_lightning_checkpoint(ckpt_path):
    """Load a reference Lightning ``.ckpt`` -> (params, model_state, config).

    The embedded hyper_parameters config is normalized to our schema; pass
    everything to ``training.checkpoint.save_checkpoint`` for a servable
    export.  ``model_state`` is non-empty only for MelGlow (BN stats).
    """
    import torch

    from .config import normalize_config

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    config = ckpt.get("hyper_parameters") or {}
    config = dict(config.get("config", config))  # Lightning may nest kwargs
    arch_type = config.get("arch", {}).get("type")
    if arch_type is None:
        raise ValueError("checkpoint has no embedded arch config; pass one")
    params, model_state = torch_state_dict_to_variables(
        ckpt["state_dict"], arch_type)
    return params, model_state, normalize_config(config)

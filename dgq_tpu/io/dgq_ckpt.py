"""Bit-compatible readers/writers for DGQ .pth checkpoint formats.

Formats (SURVEY.md §2.3, reference quant/calibration.py:192-205,
calibration_group_quantization.py:102-128, results/merge.py:13-18):

  weight-only `cali_ckpt.pth_weight_only`:
      {'weight': {'model.<path>.w', 'model.<path>.b',
                  'model.<path>.wqtizer.delta/zero_point[/alpha]',
                  'model.<norm path>.weight/bias', ...}}
  activation `cali_ckpt_activation_w{W}a{A}g{G}.pth`:
      {'act_0': {'model.<path>.aqtizer*.delta/zero_point'}, ..., 'act_{T-1}'}
  merged `*_merged`: activation dict + 'weight' key injected.

torch (CPU) is used for serialization parity; tensors cross through numpy.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from dgq_tpu.io.convert import channel_qp_to_jax, conv_w_to_jax, conv_w_to_torch, linear_w_to_jax
from dgq_tpu.models.qconfig import GroupQParams, QState
from dgq_tpu.quant.affine import QParams


def _torch():
    import torch

    return torch


def load_pth(path: str) -> dict:
    torch = _torch()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(x):
        if torch.is_tensor(x):
            return x.detach().cpu().float().numpy()
        return x

    def rec(d):
        if isinstance(d, dict):
            return {k: rec(v) for k, v in d.items()}
        return to_np(d)

    return rec(ckpt)


def save_pth(obj: dict, path: str) -> None:
    torch = _torch()

    def rec(d):
        if isinstance(d, dict):
            return {k: rec(v) for k, v in d.items()}
        if isinstance(d, (np.ndarray, jnp.ndarray)):
            return torch.from_numpy(np.asarray(d))
        return d

    torch.save(rec(obj), path)


# ----------------------------------------------------------- weight side ----
def weight_ckpt_to_params(
    state: Dict[str, np.ndarray],
    spec,
) -> tuple[dict, Dict[str, QParams], Dict[str, "np.ndarray"]]:
    """Parse the reference weight dict into (params, wqp, alphas).

    params carry the FP weights ('model.<path>.w'); fold_weight_quant
    reproduces the quantized weights exactly (same math as the reference's
    wqtizer forward / AdaRound hard rounding)."""
    params: dict = {}
    wqp: Dict[str, QParams] = {}
    alphas: Dict[str, np.ndarray] = {}
    prefix = "model."
    for name, kind, meta in spec:
        if kind in ("conv", "linear"):
            w = state[f"{prefix}{name}.w"]
            b = state.get(f"{prefix}{name}.b")
            if kind == "conv":
                params[name] = {"w": conv_w_to_jax(w),
                                "b": jnp.asarray(b) if b is not None else None}
            else:
                params[name] = {"w": linear_w_to_jax(w),
                                "b": jnp.asarray(b) if b is not None else None}
            dk = f"{prefix}{name}.wqtizer.delta"
            if dk in state:
                delta = state[dk]
                zp = state.get(f"{prefix}{name}.wqtizer.zero_point", np.zeros(()))
                wqp[name] = QParams(
                    channel_qp_to_jax(delta, kind), channel_qp_to_jax(zp, kind)
                )
            ak = f"{prefix}{name}.wqtizer.alpha"
            if ak in state:
                a = state[ak]
                if kind == "conv":
                    alphas[name] = conv_w_to_jax(a)
                else:
                    alphas[name] = linear_w_to_jax(a)
        else:
            params[name] = {
                "scale": jnp.asarray(state[f"{prefix}{name}.weight"]),
                "bias": jnp.asarray(state[f"{prefix}{name}.bias"]),
            }
    return params, wqp, alphas


def params_to_weight_ckpt(
    params: dict,
    wqp: Dict[str, QParams],
    spec,
    alphas: Optional[Dict] = None,
) -> Dict[str, np.ndarray]:
    """Build the reference weight dict from our structures (for torch.save).

    original_w/original_b are deliberately NOT written: the reference keeps
    them as plain tensors (quant_layer.py:604-610, no register_buffer), so
    they never appear in a real reference state_dict and load_state_dict
    reports them as unexpected keys."""
    out: Dict[str, np.ndarray] = {}
    pre = "model."
    for name, kind, meta in spec:
        p = params[name]
        if kind in ("conv", "linear"):
            if kind == "conv":
                w = conv_w_to_torch(p["w"])
            else:
                w = np.asarray(p["w"]).T
            out[f"{pre}{name}.w"] = w
            if p.get("b") is not None:
                out[f"{pre}{name}.b"] = np.asarray(p["b"])
            if name in wqp:
                qp = wqp[name]
                d = np.asarray(qp.delta).reshape(-1)
                z = np.asarray(qp.zero_point).reshape(-1)
                if kind == "conv":
                    out[f"{pre}{name}.wqtizer.delta"] = d.reshape(-1, 1, 1, 1)
                    out[f"{pre}{name}.wqtizer.zero_point"] = z.reshape(-1, 1, 1, 1)
                else:
                    out[f"{pre}{name}.wqtizer.delta"] = d.reshape(-1, 1)
                    out[f"{pre}{name}.wqtizer.zero_point"] = z.reshape(-1, 1)
            if alphas and name in alphas:
                a = alphas[name]
                if kind == "conv":
                    out[f"{pre}{name}.wqtizer.alpha"] = conv_w_to_torch(a)
                else:
                    out[f"{pre}{name}.wqtizer.alpha"] = np.asarray(a).T
        else:
            out[f"{pre}{name}.weight"] = np.asarray(p["scale"])
            out[f"{pre}{name}.bias"] = np.asarray(p["bias"])
    return out


# ------------------------------------------------------- activation side ----
def _act_key_to_name(key: str) -> Optional[str]:
    """'model.<path>.aqtizer[_q/k/v/w].delta' -> our quant-point name."""
    if not key.startswith("model.") or not key.endswith(".delta"):
        return None
    body = key[len("model."):-len(".delta")]
    if body.endswith(".aqtizer"):
        return body[: -len(".aqtizer")]
    for suf in ("_q", "_k", "_v", "_w"):
        if body.endswith(f".aqtizer{suf}"):
            return body  # attention points keep the aqtizer_x suffix
    return None


def _name_to_act_key(name: str) -> str:
    if ".aqtizer_" in name:
        return f"model.{name}"
    return f"model.{name}.aqtizer"


def act_dict_to_qstate(act: Dict[str, np.ndarray], spec) -> tuple[QState, tuple]:
    """One 'act_{t}' dict -> qstate {'a': {...}} (+ group conv layer names).

    Rank-3 deltas are group params: (1,C,1) -> mid-axis clusters, (1,1,C) ->
    last-axis clusters (reference quant_layer.py:391-402); both canonicalize
    to GroupQParams. Scalars stay per-tensor QParams."""
    conv_names = {n for n, k, _ in spec if k == "conv"}
    a: dict = {}
    sm: dict = {}
    group_layers = []
    for key in act:
        name = _act_key_to_name(key)
        if name is None:
            continue
        delta = np.asarray(act[key])
        zp_key = _name_to_act_key(name) + ".zero_point"
        if zp_key not in act:
            # delta-only key: a calibrated log2 softmax delta (the log2
            # quantizer has no zero point). The reference's own saver drops
            # these (its len==2 filter, calibration_group_quantization.py:104)
            # — we persist them so static-log2 configs survive a round-trip.
            sm[name] = jnp.asarray(delta).reshape(())
            continue
        zp = np.asarray(act[zp_key])
        if delta.ndim >= 3:
            if delta.shape[-1] == 1:  # (1, C, 1): mid axis
                a[name] = GroupQParams(
                    delta_mid=jnp.asarray(delta.reshape(-1)),
                    zp_mid=jnp.asarray(zp.reshape(-1)),
                    delta_last=jnp.ones((1,)), zp_last=jnp.zeros((1,)),
                )
            else:  # (1, 1, C): last axis
                a[name] = GroupQParams(
                    delta_mid=jnp.ones((1,)), zp_mid=jnp.zeros((1,)),
                    delta_last=jnp.asarray(delta.reshape(-1)),
                    zp_last=jnp.asarray(zp.reshape(-1)),
                )
            if name in conv_names:
                group_layers.append(name)
        else:
            a[name] = QParams(jnp.asarray(delta).reshape(()),
                              jnp.asarray(zp).reshape(()))
    return {"a": a, "sm": sm}, tuple(sorted(group_layers))


def qstate_to_act_dict(qstate: QState, spec) -> Dict[str, np.ndarray]:
    """Inverse of act_dict_to_qstate, producing reference-shaped arrays."""
    out: Dict[str, np.ndarray] = {}
    for name, qp in qstate.get("a", {}).items():
        base = _name_to_act_key(name)
        if isinstance(qp, GroupQParams):
            dm = np.asarray(qp.delta_mid)
            dl = np.asarray(qp.delta_last)
            if dm.size > 1 and np.all(np.asarray(dl) == 1.0):
                out[f"{base}.delta"] = dm.reshape(1, -1, 1)
                out[f"{base}.zero_point"] = np.asarray(qp.zp_mid).reshape(1, -1, 1)
            else:
                out[f"{base}.delta"] = dl.reshape(1, 1, -1)
                out[f"{base}.zero_point"] = np.asarray(qp.zp_last).reshape(1, 1, -1)
        else:
            out[f"{base}.delta"] = np.asarray(qp.delta)
            out[f"{base}.zero_point"] = np.asarray(qp.zero_point)
    for name, delta in qstate.get("sm", {}).items():
        # calibrated log2 softmax deltas: delta-only (no zero point), a key
        # the reference loader tolerates (strict=False) and its saver omits.
        # A point present in BOTH 'a' and 'sm' is ill-formed (a softmax
        # quantizer is either uniform or log2) and would clobber the 'a'
        # delta under the shared key — reject it rather than save silently.
        if name in qstate.get("a", {}):
            raise ValueError(
                f"{name} has both a uniform ('a') and a log2 ('sm') "
                f"quantizer state; the checkpoint key can hold only one")
        out[f"{_name_to_act_key(name)}.delta"] = np.asarray(delta)
    return out


# --------------------------------------------------------------- loaders ----
def load_weight_only(path: str, spec):
    ckpt = load_pth(path)
    state = ckpt["weight"] if "weight" in ckpt else ckpt
    return weight_ckpt_to_params(state, spec)


def load_merged(path: str, spec):
    """Load a merged (or activation-only) ckpt: returns
    (params|None, wqp|None, alphas|None, {'act_t': qstate}, group_layers)."""
    ckpt = load_pth(path)
    params = wqp = alphas = None
    if "weight" in ckpt:
        params, wqp, alphas = weight_ckpt_to_params(ckpt["weight"], spec)
    per_t = {}
    group_layers: tuple = ()
    for key in ckpt:
        if key.startswith("act_"):
            qs, gl = act_dict_to_qstate(ckpt[key], spec)
            per_t[key] = qs
            group_layers = tuple(sorted(set(group_layers) | set(gl)))
    return params, wqp, alphas, per_t, group_layers


def save_weight_only(path: str, params, wqp, spec, alphas=None) -> None:
    save_pth({"weight": params_to_weight_ckpt(params, wqp, spec, alphas)}, path)


def save_act_ckpt(path: str, per_t: Dict[str, QState], spec,
                  weight_dict: Optional[dict] = None) -> None:
    obj = {k: qstate_to_act_dict(v, spec) for k, v in per_t.items()}
    if weight_dict is not None:
        obj["weight"] = weight_dict
    save_pth(obj, path)


def save_merged(path: str, params, wqp, spec, per_t: Dict[str, QState],
                alphas=None) -> None:
    """Write a merged checkpoint ({'weight': ..., 'act_t': ...}) in one shot —
    the cali_model use_aq tail (calibration.py:199-206) + results/merge.py."""
    save_act_ckpt(path, per_t, spec,
                  weight_dict=params_to_weight_ckpt(params, wqp, spec, alphas))


def merge_ckpts(weight_path: str, act_path: str, out_path: str) -> None:
    """results/merge.py equivalent: activation dict + injected 'weight'.

    Pure dict-level injection on the raw torch objects — load_pth/save_pth
    would force-cast every tensor to float32, rewriting an fp16/bf16
    reference checkpoint at 2x the size and breaking dtype-level
    comparability with the reference tooling."""
    torch = _torch()
    w = torch.load(weight_path, map_location="cpu", weights_only=False)
    a = torch.load(act_path, map_location="cpu", weights_only=False)
    a["weight"] = w["weight"] if isinstance(w, dict) and "weight" in w else w
    torch.save(a, out_path)

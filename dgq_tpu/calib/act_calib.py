"""Activation calibration: lazy scale init, EMA running stats, and DGQ
group-wise (k-means) quantization, per denoising-timestep chunk.

Mirrors /root/reference/quant/calibration.py:45-97 (vanilla) and
calibration_group_quantization.py:44-129 (group), re-designed for jit:

  * activation tensors are observed through trace-time taps
    (models/qconfig.collect_act_taps); a jitted collector returns only the
    requested taps (or their reductions), so memory stays bounded and XLA
    prunes the rest of the graph;
  * scale init preserves the reference's sequential lazy-init semantics
    (earlier quantizers are live while later ones initialize) via chunked
    passes — chunk size 1 reproduces it exactly, larger chunks trade passes
    for fidelity;
  * group statistics are jnp reductions folded into the forward; only the
    k-means itself runs host-side (sklearn, random_state=0 for checkpoint
    parity).

Output format: {"act_{t}": qstate} where qstate = {"a": {name: QParams |
GroupQParams}, "sm": {name: delta}} — convertible to/from the reference's
checkpoint dicts (dgq_tpu/io/dgq_ckpt.py) and stackable on a leading [T] axis
for the scanned sampler.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.qconfig import (
    GroupQParams,
    QConfig,
    QState,
    collect_act_taps,
)
from dgq_tpu.models.unet_sd import unet_sd_apply
from dgq_tpu.quant.affine import QParams, minmax_qparams_from_range
from dgq_tpu.quant.groups import (
    GroupStats,
    init_group_stats,
    kmeans_group_qparams,
    update_group_stats,
)
from dgq_tpu.quant.log2 import log2_ema_update, log2_init_delta
from dgq_tpu.quant.scalers import Scaler, init_scale


def attention_prefixes(spec) -> list[str]:
    """Attention module prefixes (e.g. '....attn1') from the layer spec."""
    return [n[: -len(".to_q")] for n, k, _ in spec if n.endswith(".to_q")]


def act_qpoint_names(spec) -> list[str]:
    """All activation-quantizer names: every conv/linear input aqtizer plus
    the attention aqtizer_q/k/v. (aqtizer_w is handled via softmax points.)

    conv_in/conv_out are excluded: the reference's disable_out_quantization
    sets disable_aq on them, so their aqtizers never initialize and never
    appear in activation checkpoints (quant_model.py:118-124)."""
    names = [
        n for n, k, _ in spec
        if k in ("conv", "linear") and n not in ("conv_in", "conv_out")
    ]
    for p in attention_prefixes(spec):
        names += [f"{p}.aqtizer_q", f"{p}.aqtizer_k", f"{p}.aqtizer_v"]
    return names


def softmax_qpoint_names(spec) -> list[str]:
    return [f"{p}.aqtizer_w" for p in attention_prefixes(spec)]


def conv_meta_by_name(spec) -> dict:
    return {n: m for n, k, m in spec if k == "conv"}


# ------------------------------------------------------------ collectors ----
# A calibration batch is the tuple of positional UNet conditioning tensors
# after `params`: SD is (sample, t, ehs); SDXL-turbo is
# (sample, t, ehs, text_embeds, time_ids) — the counterpart of the
# reference's added_cond_kwargs plumbing (src/quantize_act.py:35-167).
@partial(jax.jit, static_argnames=("names", "cfg", "unet_apply"))
def _collect_taps(params, qstate, batch, names: tuple, cfg: QConfig, unet_apply):
    """Full tensors for `names` (everything else DCE'd)."""
    taps: dict = {}
    with collect_act_taps(taps):
        unet_apply(params, *batch, qstate=qstate, cfg=cfg)
    return {n: taps[n] for n in names}


@partial(jax.jit, static_argnames=("names", "cfg", "unet_apply"))
def _collect_minmax(params, qstate, batch, names: tuple, cfg: QConfig, unet_apply):
    """Global (min, max) per tap, stacked [len(names), 2] so the host pulls
    one array per batch instead of 2×len(names) scalars."""
    taps: dict = {}
    with collect_act_taps(taps):
        unet_apply(params, *batch, qstate=qstate, cfg=cfg)
    return jnp.stack([
        jnp.stack([jnp.min(taps[n]), jnp.max(taps[n])]) for n in names
    ])


@partial(jax.jit, static_argnames=("names", "cfg", "unet_apply"))
def _collect_group_stats(params, qstate, stats, batch, names: tuple,
                         cfg: QConfig, unet_apply):
    """Fold one batch into running per-axis GroupStats (vector outputs)."""
    taps: dict = {}
    with collect_act_taps(taps):
        unet_apply(params, *batch, qstate=qstate, cfg=cfg)
    return {n: update_group_stats(stats[n], taps[n]) for n in names}


def tap_execution_order(params, cali_batch, cfg, unet_apply=unet_sd_apply) -> list[str]:
    """Execution order of all aq points (dict insertion order during tracing)."""
    taps: dict = {}

    def f(*batch):
        with collect_act_taps(taps):
            unet_apply(params, *batch, qstate=None, cfg=cfg)
        return 0

    jax.eval_shape(f, *cali_batch)
    return list(taps.keys())


# ------------------------------------------------------------------ init ----
def init_act_qstate(
    params: dict,
    init_batch: tuple,
    spec,
    cfg: QConfig,
    scaler: Scaler = Scaler.MINMAX,
    chunk: int = 32,
    unet_apply=unet_sd_apply,
) -> tuple[QState, Dict[str, tuple]]:
    """Lazy-init equivalent: initialize every activation quantizer's scale
    from one batch, sequentially (earlier quantizers active while later ones
    initialize — reference UniformAffineQuantizer.forward:271-283).

    Returns (qstate, ranges) where ranges[name] = (x_min, x_max) floats for
    subsequent EMA updates (leaf_param seeding, quant_layer.py:266-267).
    """
    sm_names = set(softmax_qpoint_names(spec))
    order = tap_execution_order(params, init_batch, cfg, unet_apply)
    qstate: QState = {"a": {}, "sm": {}}
    ranges: Dict[str, tuple] = {}
    run_cfg = cfg.replace(use_aq=True)
    for i in range(0, len(order), chunk):
        chunk_names = tuple(order[i : i + chunk])
        taps = _collect_taps(
            params, qstate, tuple(init_batch), names=chunk_names, cfg=run_cfg,
            unet_apply=unet_apply,
        )
        for n in chunk_names:
            x = taps[n]
            if n in sm_names:
                if cfg.t2i_log_quant:
                    if not cfg.t2i_real_time:
                        qstate["sm"][n] = log2_init_delta(x, cfg.softmax_bits)
                else:
                    qp = init_scale(x, cfg.softmax_bits, scaler, always_zero=True)
                    qstate["a"][n] = qp
                    ranges[n] = (float(jnp.min(x)), float(jnp.max(x)))
            else:
                qp = init_scale(x, cfg.a_bits, scaler)
                qstate["a"][n] = qp
                ranges[n] = (float(jnp.min(x)), float(jnp.max(x)))
    return qstate, ranges


# --------------------------------------------------------- running stats ----
def ema_update_qstate(
    params: dict,
    qstate: QState,
    ranges: Dict[str, tuple],
    batches: list,
    cfg: QConfig,
    spec,
    momentum: float = 0.95,
    unet_apply=unet_sd_apply,
) -> tuple[QState, Dict[str, tuple]]:
    """Running-stat passes: EMA the global min/max per point and re-derive
    minmax scales (reference act_momentum_update, quant_layer.py:431-446).
    Batch-level granularity (quantizers update between batches, not within).

    Static-log2 softmax points (qstate["sm"], present when t2i_log_quant
    without real_time) EMA their delta directly with the batch max —
    the reference's T2ILogQuantizer.act_momentum_update
    (quant_layer_text.py:109-117, gated `running_stat and not real_time`)."""
    run_cfg = cfg.replace(use_aq=True)
    names = tuple(n for n in qstate["a"] if n in ranges)
    sm_static = (tuple(sorted(qstate["sm"]))
                 if cfg.t2i_log_quant and not cfg.t2i_real_time else ())
    sm_names = set(softmax_qpoint_names(spec))
    for batch in batches:
        # one [len(names), 2] device->host pull per batch (not per tap)
        mm = np.asarray(_collect_minmax(
            params, qstate, tuple(batch), names=names + sm_static, cfg=run_cfg,
            unet_apply=unet_apply,
        ))
        if sm_static:
            new_sm = dict(qstate["sm"])
            for j, n in enumerate(sm_static, start=len(names)):
                new_sm[n] = log2_ema_update(
                    new_sm[n], jnp.asarray(mm[j, 1]), momentum)
            qstate = {**qstate, "sm": new_sm}
        new_a = dict(qstate["a"])
        new_ranges = dict(ranges)
        for j, n in enumerate(names):
            bmin, bmax = float(mm[j, 0]), float(mm[j, 1])
            x_min = ranges[n][0] * momentum + bmin * (1 - momentum)
            x_max = ranges[n][1] * momentum + bmax * (1 - momentum)
            new_ranges[n] = (x_min, x_max)
            # softmax (aqtizer_w) points use softmax bits + always_zero
            # (reference act_momentum_update passes self.always_zero)
            bits = cfg.softmax_bits if n in sm_names else cfg.a_bits
            new_a[n] = minmax_qparams_from_range(
                jnp.asarray(x_min), jnp.asarray(x_max), bits,
                always_zero=n in sm_names,
            )
        qstate = {**qstate, "a": new_a}
        ranges = new_ranges
    return qstate, ranges


# ------------------------------------------------------------ group path ----
def group_calibrate_qstate(
    params: dict,
    qstate: QState,
    batches: list,
    cfg: QConfig,
    spec,
    group_num: int,
    mode: str = "minmax",
    unet_apply=unet_sd_apply,
) -> tuple[QState, tuple]:
    """DGQ group quantization for one timestep chunk: record per-axis min/max
    over the batches (convs on their im2col-unfolded input), k-means the
    channels, expand per-cluster scales back to per-channel GroupQParams.

    Points whose activations are rank < 3 keep their initialized per-tensor
    scales (reference record_min_max_ema only handles rank 3/4).

    Returns (qstate, group_conv_layer_names) — the conv names must go into
    QConfig.group_conv_layers (static) so those convs trace the im2col path."""
    conv_names = tuple(n for n, k, _ in spec if k == "conv")
    group_cfg = cfg.replace(use_aq=True, group_conv_layers=conv_names)

    # determine tap shapes/ranks via one eval_shape
    names = tuple(n for n in act_qpoint_names(spec))
    taps_shape: dict = {}

    def f(*batch):
        with collect_act_taps(taps_shape):
            unet_apply(params, *batch, qstate=qstate, cfg=group_cfg)
        return 0

    jax.eval_shape(f, *batches[0])
    groupable = tuple(n for n in names if taps_shape[n].ndim >= 3)

    stats = {n: init_group_stats(taps_shape[n].shape) for n in groupable}
    for batch in batches:
        stats = _collect_group_stats(
            params, qstate, stats, tuple(batch), names=groupable, cfg=group_cfg,
            unet_apply=unet_apply,
        )
    stats = jax.device_get(stats)

    level = 2 ** cfg.a_bits
    new_a = dict(qstate["a"])
    group_layers = []
    for n in groupable:
        qp, labels, in_wise = kmeans_group_qparams(
            GroupStats(*[jnp.asarray(v) for v in stats[n]]), group_num, level, mode
        )
        d = np.asarray(qp.delta).ravel()
        z = np.asarray(qp.zero_point).ravel()
        # The unused axis is canonicalized to size-(1,) ones — the same
        # convention io/dgq_ckpt.act_dict_to_qstate produces on load, so
        # fresh and round-tripped qstates have identical leaf shapes (and
        # fused_eligible's scalar-delta_last gate accepts both).
        if in_wise:
            g = GroupQParams(
                delta_mid=jnp.ones((1,)), zp_mid=jnp.zeros((1,)),
                delta_last=jnp.asarray(d), zp_last=jnp.asarray(z),
            )
        else:
            g = GroupQParams(
                delta_mid=jnp.asarray(d), zp_mid=jnp.asarray(z),
                delta_last=jnp.ones((1,)), zp_last=jnp.zeros((1,)),
            )
        new_a[n] = g
        if n in conv_names:
            group_layers.append(n)
    return {**qstate, "a": new_a}, tuple(sorted(group_layers))


# ------------------------------------------------------------- driver -------
def calibrate_activations(
    params_wq: dict,
    spec,
    cfg: QConfig,
    a_cali_data: tuple,
    interval: int,
    group_num: int = 0,
    group_mode: str = "minmax",
    running_stat: bool = True,
    batch_size: int = 8,
    scaler: Scaler = Scaler.MINMAX,
    init_chunk: int = 32,
    seed: int = 0,
    unet_apply=unet_sd_apply,
    progress=None,
) -> tuple[Dict[str, QState], tuple]:
    """Per-timestep-chunk activation calibration (the reference's
    cali_model_aq loop). group_num > 1 selects the DGQ group path.

    a_cali_data: (samples, timesteps, ehs) arrays ordered so that samples
    [t*interval : (t+1)*interval] belong to denoising step t.
    """
    rng = np.random.RandomState(seed)
    n_total = a_cali_data[0].shape[0]
    out: Dict[str, QState] = {}
    group_layers: tuple = ()
    for tslot in range(n_total // interval):
        if progress:
            progress(f"activation calibration: timestep chunk {tslot}")
        sl = slice(tslot * interval, (tslot + 1) * interval)
        chunk_data = tuple(x[sl] for x in a_cali_data)
        bs = min(batch_size, chunk_data[0].shape[0])
        inds = rng.choice(chunk_data[0].shape[0], bs, replace=False)
        init_batch = tuple(jnp.asarray(x[inds]) for x in chunk_data)
        qstate, ranges = init_act_qstate(
            params_wq, init_batch, spec, cfg, scaler, init_chunk, unet_apply
        )
        order = rng.permutation(chunk_data[0].shape[0])
        batches = [
            tuple(jnp.asarray(x[order[i : i + bs]]) for x in chunk_data)
            for i in range(0, chunk_data[0].shape[0], bs)
        ]
        if group_num and group_num > 1:
            qstate, gl = group_calibrate_qstate(
                params_wq, qstate, batches, cfg, spec, group_num,
                mode=group_mode, unet_apply=unet_apply,
            )
            group_layers = tuple(sorted(set(group_layers) | set(gl)))
        elif running_stat:
            qstate, ranges = ema_update_qstate(
                params_wq, qstate, ranges, batches, cfg, spec,
                unet_apply=unet_apply,
            )
        out[f"act_{tslot}"] = qstate
    return out, group_layers


def stack_time_qstates(per_t: Dict[str, QState]) -> QState:
    """Stack {'act_0': qs, 'act_1': qs, ...} into one qstate whose leaves have
    a leading [T] axis, for in-scan per-timestep selection (the counterpart of
    the reference's per-step load_state_dict hot swap, calibration.py:297-312).

    Leaves are broadcast to their common shape before stacking: the k-means
    spread heuristic may pick the mid axis at one timestep and the last axis
    at another for the same layer (reference quant_layer.py:352-360 does so
    per-call), leaving the UNUSED GroupQParams axis as size-(1,) ones on one
    side and full-length values on the other — ones broadcast losslessly.
    Such mixed-axis layers are logged: the broadcast gives every slot a
    full-length delta_last, which disqualifies the layer from the fused
    group-conv kernel's scalar-last gate (--group_impl fused falls back to
    taps for it at every timestep, not just the mixed one)."""
    n = len(per_t)
    ordered = [per_t[f"act_{i}"] for i in range(n)]

    def stack(*xs):
        shape = np.broadcast_shapes(*[jnp.shape(x) for x in xs])
        return jnp.stack([jnp.broadcast_to(x, shape) for x in xs])

    from dgq_tpu.models.qconfig import GroupQParams

    mixed = sorted(
        name
        for name in ordered[0].get("a", {})
        if isinstance(ordered[0]["a"][name], GroupQParams)
        and len({
            int(np.asarray(q["a"][name].delta_last).size > 1) for q in ordered
        }) > 1
    )
    if mixed:
        import logging

        logging.getLogger("dgq_tpu").info(
            "mixed-axis group layers (k-means picked different axes across "
            "timesteps; fused kernel ineligible, taps path used): %s", mixed)

    return jax.tree.map(stack, *[
        {k: v for k, v in q.items() if k in ("a", "sm")} for q in ordered
    ])

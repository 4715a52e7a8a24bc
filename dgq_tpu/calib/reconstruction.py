"""AdaRound block/layer reconstruction (BRECQ-style weight calibration).

Mirrors /root/reference/quant/reconstruction.py + calibration.py:100-206:
walk the UNet's reconstruction units (ResnetBlock2D / BasicTransformerBlock as
blocks, standalone conv/linear as layers), and for each unit optimize AdaRound
alphas for `iters` Adam steps against the FP unit outputs, inputs taken from
the quantized prefix network (asym mode, data_utill.py:146-157).

TPU-native re-design:
  * capture-by-DCE: a jitted forward that returns only `record[unit]` lets XLA
    dead-code-eliminate everything downstream — the compiled analogue of the
    reference's StopForwardException early exit. Captures run per unit (FP
    targets included): holding every unit's cached activations at once would
    cost O(units x samples x activation) host memory (tens of GB at full
    width), so the FP sweep is repeated per unit just like the reference's
    hook pass, and the quantized-prefix pass is re-run per unit as earlier
    units' alphas freeze (hard rounding), preserving the reference's
    sequential semantics;
  * the inner optimization is an optax Adam step under `lax.scan` — 20k iters
    compile to one XLA while-loop instead of 20k Python steps;
  * data parallelism: shard the cached activations over a mesh 'dp' axis and
    jit does the gradient averaging via GSPMD (replaces linklink allreduce,
    reconstruction.py:73-77).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dgq_tpu.models.layers import basic_transformer_block, quant_conv2d, quant_linear, resnet_block
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.models.unet_sd import NUM_HEADS, unet_sd_apply
from dgq_tpu.quant.adaround import (
    adaround_init_alpha,
    adaround_quant,
    linear_temp_decay,
    rounding_reg_loss,
)
from dgq_tpu.quant.affine import QParams
from dgq_tpu.calib.weight_calib import EXCLUDED_LAYERS, fold_weight_quant


@dataclasses.dataclass(frozen=True)
class ReconUnit:
    kind: str          # 'resnet' | 'transformer' | 'layer'
    name: str          # record key / layer name
    layers: tuple      # quantizable sublayer names
    meta: tuple = ()   # for 'layer': (layer_kind, conv meta)
    sum_axis: int = -1  # reference lp_loss sums torch-axis 1; see recon_units
    heads: int = NUM_HEADS  # attention heads (SDXL: channels / min(64, base))


def recon_units(spec) -> list[ReconUnit]:
    """Enumerate reconstruction units in forward-execution order.

    (The reference walks module-definition order, reconstructing a block's
    attentions before its resnets — quality-equivalent; execution order keeps
    the asym quantized-prefix semantics cleanest.)
    """
    qlayers = [(n, k, m) for n, k, m in spec if k in ("conv", "linear")]
    units: list[ReconUnit] = []
    seen = set()

    # SDXL uses per-block head counts (inner_dim / min(64, base),
    # reference sdxl.py:268); SD v1.4 uses 8 everywhere (sd.py:101).
    is_sdxl = any(n == "add_embedding.linear_1" for n, _, _ in spec)
    base = next(m[1] for n, k, m in spec if n == "conv_in")
    to_q_dim = {
        n[: -len(".attn1.to_q")]: m[0]
        for n, k, m in qlayers if n.endswith(".attn1.to_q")
    }

    def heads_for(prefix: str) -> int:
        if not is_sdxl:
            return NUM_HEADS
        return to_q_dim[prefix] // min(64, base)

    def block_prefix(name):
        for marker in (".resnets.", ".transformer_blocks."):
            if marker in name:
                head, tail = name.split(marker, 1)
                idx = tail.split(".", 1)[0]
                return head + marker + idx, ("resnet" if marker == ".resnets." else "transformer")
        return None, None

    for name, kind, meta in qlayers:
        prefix, bkind = block_prefix(name)
        if prefix is None:
            if name in EXCLUDED_LAYERS:
                continue  # conv_in/conv_out: quantization disabled, skip recon
            sum_axis = 1 if kind == "linear" else -1
            # time-embedding linears act on 2D (B,C): torch sum(1) == ours -1
            if name.startswith("time_embedding"):
                sum_axis = -1
            units.append(ReconUnit("layer", name, (name,), (kind, meta), sum_axis))
        elif prefix not in seen:
            seen.add(prefix)
            sub = [n for n, k, m in qlayers if n.startswith(prefix + ".")]
            # resnet NCHW: torch sum(1)=C -> ours -1; transformer (B,T,C):
            # torch sum(1)=T -> ours 1
            sum_axis = -1 if bkind == "resnet" else 1
            heads = heads_for(prefix) if bkind == "transformer" else NUM_HEADS
            units.append(ReconUnit(bkind, prefix, tuple(sub), (), sum_axis, heads))
    return units


def make_unit_apply(unit: ReconUnit, cfg: QConfig, with_qstate: bool = False) -> Callable:
    """Pure apply fn (params, *inputs) -> output for one unit.

    with_qstate=True returns (params, qstate, *inputs) -> output, for the
    activation-delta reconstruction mode."""
    if unit.kind == "resnet":
        has_shortcut = any(l.endswith("conv_shortcut") for l in unit.layers)
        fn = lambda p, qs, x, temb: resnet_block(
            p, unit.name, x, temb, qs, cfg, has_shortcut)
    elif unit.kind == "transformer":
        fn = lambda p, qs, x, ehs: basic_transformer_block(
            p, unit.name, x, ehs, unit.heads, qs, cfg)
    else:
        lkind, meta = unit.meta
        if lkind == "conv":
            _, _, k, stride, pad = meta
            fn = lambda p, qs, x, _s=stride, _pd=pad: quant_conv2d(
                p[unit.name], x, unit.name, qs, cfg, _s, _pd)
        else:
            fn = lambda p, qs, x: quant_linear(p[unit.name], x, unit.name, qs, cfg)
    if with_qstate:
        return fn
    return lambda p, *inputs: fn(p, None, *inputs)


def reconstruct_unit_act_deltas(
    key: jax.Array,
    unit: ReconUnit,
    params_q: dict,
    qstate_unit: dict,
    cached_inputs: tuple,
    cached_outputs: jax.Array,
    cfg: QConfig,
    iters: int = 20000,
    batch_size: int = 32,
    p_norm: float = 2.0,
    lr: float = 4e-5,
):
    """Activation-delta reconstruction (the reference's use_aq branch,
    reconstruction.py:45-48,137-159): Adam on the unit's activation-quantizer
    deltas with cosine-annealed lr, Lp reconstruction loss against FP outputs.

    params_q: weight-quantized (folded) params. qstate_unit: {'a': {...}}
    restricted to this unit's activation quantizers (per-tensor QParams).
    Returns the optimized qstate subset.
    """
    apply_fn = make_unit_apply(unit, cfg.replace(use_aq=True), with_qstate=True)
    sub = _sub_params(params_q, unit)
    opt = optax.adam(optax.cosine_decay_schedule(lr, iters))
    deltas = {n: qp.delta for n, qp in qstate_unit["a"].items()}
    zps = {n: qp.zero_point for n, qp in qstate_unit["a"].items()}
    opt_state = opt.init(deltas)
    n_samples = cached_outputs.shape[0]

    def loss_fn(deltas, binputs, bout):
        qs = {"a": {n: QParams(deltas[n], zps[n]) for n in deltas},
              "sm": qstate_unit.get("sm", {})}
        pred = apply_fn(sub, qs, *binputs)
        return jnp.mean(jnp.sum(jnp.abs(pred - bout) ** p_norm, axis=unit.sum_axis))

    @jax.jit
    def run(key, deltas, opt_state, inputs, outputs):
        def step_fn(carry, step):
            deltas, opt_state = carry
            k = jax.random.fold_in(key, step)
            idx = jax.random.randint(k, (batch_size,), 0, n_samples)
            loss, grads = jax.value_and_grad(loss_fn)(
                deltas, tuple(x[idx] for x in inputs), outputs[idx])
            updates, opt_state = opt.update(grads, opt_state)
            deltas = optax.apply_updates(deltas, updates)
            return (deltas, opt_state), loss

        return jax.lax.scan(step_fn, (deltas, opt_state), jnp.arange(iters))

    (deltas, _), losses = run(key, deltas, opt_state, cached_inputs, cached_outputs)
    return {"a": {n: QParams(deltas[n], zps[n]) for n in deltas},
            "sm": qstate_unit.get("sm", {})}, losses


@partial(jax.jit,
         static_argnames=("unit_name", "cfg", "unet_apply", "want_inputs"))
def _capture_jit(params, batch, unit_name: str, cfg: QConfig, unet_apply,
                 want_inputs: bool = True):
    rec: dict = {}
    unet_apply(params, *batch, qstate=None, cfg=cfg, record=rec)
    ins, out = rec[unit_name]
    # want_inputs=False returns the output alone so XLA DCEs the input
    # collection too (the asym path replaces inputs with the quantized-prefix
    # capture, so transferring the FP inputs to host is pure waste)
    return (ins, out) if want_inputs else ((), out)


def capture_unit_io(
    params: dict,
    cali_batch: tuple,
    unit_name: str,
    cfg: QConfig,
    unet_apply=unet_sd_apply,
    want_inputs: bool = True,
):
    """Run the UNet on one calibration batch and return (inputs, output) of
    `unit_name`. Everything after the unit is DCE'd by XLA (the compiled
    analogue of the reference's StopForwardException early exit);
    want_inputs=False additionally DCEs the inputs (inputs come back ()).

    cali_batch: positional UNet conditioning tensors after `params` — SD is
    (sample, t, ehs); SDXL is (sample, t, ehs, text_embeds, time_ids)."""
    return _capture_jit(params, tuple(cali_batch), unit_name=unit_name,
                        cfg=cfg, unet_apply=unet_apply,
                        want_inputs=want_inputs)


def _sub_params(params: dict, unit: ReconUnit) -> dict:
    """All param entries a unit's apply touches (incl. its norms)."""
    if unit.kind == "layer":
        return {unit.name: params[unit.name]}
    return {k: v for k, v in params.items() if k.startswith(unit.name + ".")}


@partial(jax.jit, static_argnames=("unit_name", "cfg", "unet_apply"))
def _grad_jit(params_fp, params_q, batch, unit_name: str,
              cfg: QConfig, unet_apply):
    """dKL/d(unit output): KL(softmax(fp) || softmax(quant-prefix)) over the
    channel axis, batchmean (reference GetLayerGrad, data_utill.py:191-256).
    The quant prefix runs with weights quantized up to and including the unit."""
    from dgq_tpu.models.unet_sd import inject_at

    out_fp = unet_apply(params_fp, *batch, qstate=None, cfg=cfg)
    rec: dict = {}
    unet_apply(params_q, *batch, qstate=None, cfg=cfg, record=rec)
    unit_out_shape = rec[unit_name][1].shape

    def loss_fn(d):
        with inject_at({unit_name: d}):
            out_q = unet_apply(params_q, *batch, qstate=None, cfg=cfg)
        p_fp = jax.nn.softmax(out_fp.astype(jnp.float32), axis=-1)
        logq = jax.nn.log_softmax(out_q.astype(jnp.float32), axis=-1)
        logp = jnp.log(p_fp + 1e-12)
        return jnp.sum(p_fp * (logp - logq)) / batch[0].shape[0]

    return jax.grad(loss_fn)(jnp.zeros(unit_out_shape, jnp.float32))


def capture_unit_grad(params_fp, params_q_prefix, cali_batch, unit_name, cfg,
                      unet_apply=unet_sd_apply):
    """|dKL/d(unit out)| + 1, the Fisher weighting (data_utill.py:68-69)."""
    g = _grad_jit(params_fp, params_q_prefix, tuple(cali_batch),
                  unit_name=unit_name, cfg=cfg, unet_apply=unet_apply)
    return jnp.abs(g) + 1.0


def reconstruct_unit(
    key: jax.Array,
    unit: ReconUnit,
    params: dict,
    wqp: Dict[str, QParams],
    cached_inputs: tuple,
    cached_outputs: jax.Array,
    cfg: QConfig,
    iters: int = 20000,
    batch_size: int = 32,
    w: float = 0.01,
    warmup: float = 0.2,
    p_norm: float = 2.0,
    lr: float = 1e-3,
    opt_mode: str = "mse",
    cached_grads: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Optimize AdaRound alphas for one unit. Returns {layer_name: alpha}.

    Loss = reconstruction loss + temperature-annealed rounding regularizer
    active after `warmup * iters` steps (reference reconstruction_util.py:63-83).
    opt_mode: 'mse' (Lp, sum over unit.sum_axis then mean — :52),
    'fisher_diag' / 'fisher_full' (:53-59, need cached_grads from
    capture_unit_grad).
    """
    apply_fn = make_unit_apply(unit, cfg)
    sub = _sub_params(params, unit)
    alphas = {
        n: adaround_init_alpha(params[n]["w"], wqp[n].delta) for n in unit.layers
    }
    opt = optax.adam(lr)
    opt_state = opt.init(alphas)
    n_samples = cached_outputs.shape[0]
    if opt_mode != "mse":
        assert cached_grads is not None, "fisher modes need cached_grads"

    def rec_loss(pred, bout, bgrad):
        if opt_mode == "mse":
            return jnp.mean(jnp.sum(jnp.abs(pred - bout) ** p_norm, axis=unit.sum_axis))
        if opt_mode == "fisher_diag":
            return jnp.mean(jnp.sum((pred - bout) ** 2 * bgrad ** 2, axis=unit.sum_axis))
        # fisher_full (reference reconstruction_util.py:56-59)
        a = jnp.abs(pred - bout)
        g = jnp.abs(bgrad)
        red_axes = tuple(range(1, pred.ndim))
        dot = jnp.sum(a * g, axis=red_axes).reshape((-1,) + (1,) * (pred.ndim - 1))
        return jnp.mean(dot * a * g) / 100.0

    def loss_fn(alphas, binputs, bout, bgrad, step):
        pq = dict(sub)
        for n in unit.layers:
            pq[n] = dict(sub[n])
            pq[n]["w"] = adaround_quant(
                params[n]["w"], wqp[n], alphas[n], cfg.w_bits, soft=True
            )
        pred = apply_fn(pq, *binputs)
        rec = rec_loss(pred, bout, bgrad)
        b = linear_temp_decay(step.astype(jnp.float32), iters, warmup)
        reg = sum(rounding_reg_loss(a, b) for a in alphas.values())
        round_on = step >= (warmup * iters)
        return rec + jnp.where(round_on, w * reg, 0.0)

    @jax.jit
    def run(key, alphas, opt_state, inputs, outputs, grads_c):
        def step_fn(carry, step):
            alphas, opt_state = carry
            k = jax.random.fold_in(key, step)
            idx = jax.random.randint(k, (batch_size,), 0, n_samples)
            binputs = tuple(x[idx] for x in inputs)
            bout = outputs[idx]
            bgrad = grads_c[idx] if grads_c is not None else None
            loss, grads = jax.value_and_grad(loss_fn)(alphas, binputs, bout, bgrad, step)
            updates, opt_state = opt.update(grads, opt_state)
            alphas = optax.apply_updates(alphas, updates)
            return (alphas, opt_state), loss

        (alphas, opt_state), losses = jax.lax.scan(
            step_fn, (alphas, opt_state), jnp.arange(iters)
        )
        return alphas, losses

    alphas, losses = run(key, alphas, opt_state, cached_inputs, cached_outputs,
                         cached_grads)
    return alphas, losses


def tib_unit(spec) -> ReconUnit:
    """Temporal-information block (TFMQ-style, reference quant_block.py:35-77 +
    reconstruction.py:205-301): the time-embedding MLP plus every resnet's
    time_emb_proj, reconstructed jointly against the FP tuple of all temb
    projections."""
    layers = ["time_embedding.linear_1", "time_embedding.linear_2"] + [
        n for n, k, _ in spec if k == "linear" and n.endswith(".time_emb_proj")
    ]
    return ReconUnit("tib", "time_embedding", tuple(layers), (), -1)


def make_tib_apply(spec, cfg: QConfig) -> Callable:
    """(params, timesteps) -> tuple of every time_emb_proj output.

    Mirrors QuantTemporalInformationBlock.forward (quant_block.py:52-65):
    t -> sinusoidal proj -> embedding MLP -> silu -> each proj."""
    from dgq_tpu.models.layers import quant_linear, silu, timestep_embedding

    proj_names = [n for n, k, _ in spec if k == "linear" and n.endswith(".time_emb_proj")]

    def apply_fn(p, timesteps):
        base = p["time_embedding.linear_1"]["w"].shape[0]
        t_emb = timestep_embedding(timesteps, base)
        emb = quant_linear(p["time_embedding.linear_1"], t_emb, "time_embedding.linear_1", None, cfg)
        emb = silu(emb)
        emb = quant_linear(p["time_embedding.linear_2"], emb, "time_embedding.linear_2", None, cfg)
        temb = silu(emb)
        return tuple(
            quant_linear(p[n], temb, n, None, cfg) for n in proj_names
        )

    return apply_fn


def reconstruct_tib(
    key: jax.Array,
    params: dict,
    spec,
    wqp: Dict[str, QParams],
    timesteps: jax.Array,
    cfg: QConfig,
    iters: int = 20000,
    batch_size: int = 32,
    w: float = 0.01,
    warmup: float = 0.2,
    p_norm: float = 2.0,
    lr: float = 1e-3,
) -> Dict[str, jax.Array]:
    """tib_reconstruction (reference reconstruction.py:205-301): joint AdaRound
    over the temporal-information block, loss summed over the output tuple
    (LossFuncTimeEmbedding, reconstruction_util.py:94-173)."""
    unit = tib_unit(spec)
    apply_fn = make_tib_apply(spec, cfg)
    sub = {n: params[n] for n in unit.layers}
    alphas = {n: adaround_init_alpha(params[n]["w"], wqp[n].delta) for n in unit.layers}
    opt = optax.adam(lr)
    opt_state = opt.init(alphas)
    fp_outs = apply_fn(sub, timesteps)
    n_samples = timesteps.shape[0]

    def loss_fn(alphas, bt, bouts, step):
        pq = {n: dict(sub[n]) for n in unit.layers}
        for n in unit.layers:
            pq[n]["w"] = adaround_quant(params[n]["w"], wqp[n], alphas[n], cfg.w_bits, soft=True)
        preds = apply_fn(pq, bt)
        rec = sum(
            jnp.mean(jnp.sum(jnp.abs(pr - tg) ** p_norm, axis=-1))
            for pr, tg in zip(preds, bouts)
        )
        b = linear_temp_decay(step.astype(jnp.float32), iters, warmup)
        reg = sum(rounding_reg_loss(a, b) for a in alphas.values())
        return rec + jnp.where(step >= warmup * iters, w * reg, 0.0)

    @jax.jit
    def run(key, alphas, opt_state):
        def step_fn(carry, step):
            alphas, opt_state = carry
            k = jax.random.fold_in(key, step)
            idx = jax.random.randint(k, (batch_size,), 0, n_samples)
            bouts = tuple(o[idx] for o in fp_outs)
            loss, grads = jax.value_and_grad(loss_fn)(alphas, timesteps[idx], bouts, step)
            updates, opt_state = opt.update(grads, opt_state)
            alphas = optax.apply_updates(alphas, updates)
            return (alphas, opt_state), loss

        return jax.lax.scan(step_fn, (alphas, opt_state), jnp.arange(iters))

    (alphas, _), losses = run(key, alphas, opt_state)
    return alphas, losses


def calibrate_weights(
    params: dict,
    spec,
    cfg: QConfig,
    wqp: Dict[str, QParams],
    cali_data: tuple,
    iters: int = 20000,
    batch_size: int = 32,
    w: float = 0.01,
    warmup: float = 0.2,
    asym: bool = True,
    capture_batch: int = 8,
    seed: int = 0,
    unet_apply=unet_sd_apply,
    progress: Optional[Callable[[str], None]] = None,
    max_units: Optional[int] = None,
    partial_dir: Optional[str] = None,
    tib_recon: bool = False,
    opt_mode: str = "mse",
    mesh=None,
) -> Dict[str, jax.Array]:
    """Full weight-reconstruction pass (reference cali_model weight phase,
    calibration.py:100-197). Returns AdaRound alphas per quantized layer.

    cali_data: (samples NHWC, timesteps, encoder_hidden_states) stacked arrays.
    max_units limits the walk (debug/tests only). partial_dir saves one .pth
    per unit as it completes (reference calibration.py:456-466), enabling
    crash recovery via ckpt_tools check. tib_recon reconstructs the
    temporal-information block jointly (TFMQ) and excludes its layers from
    the per-block walks (reference quant_emb, quant_model.py:75-78).

    mesh: a (dp, tp) jax.sharding.Mesh — each unit's captured activations
    are dp-sharded on the batch axis before the optimization scan, so GSPMD
    averages the AdaRound gradients across devices (the in-process
    counterpart of the reference's per-rank allreduce,
    reconstruction.py:73-77). Pass params already tp-sharded
    (parallel.mesh.shard_params_tp) for channel parallelism.
    """
    units = recon_units(spec)
    if max_units is not None:
        units = units[:max_units]
    key = jax.random.PRNGKey(seed)
    all_alphas: Dict[str, jax.Array] = {}
    n = cali_data[0].shape[0]

    tib_layers: set = set()
    params_units = params
    if tib_recon:
        if progress:
            progress("reconstructing temporal information block (TFMQ)")
        tu = tib_unit(spec)
        tib_layers = set(tu.layers)
        tib_alphas, _ = reconstruct_tib(
            jax.random.fold_in(key, 987), params, spec, wqp, cali_data[1],
            cfg, iters=iters, batch_size=batch_size, w=w, warmup=warmup,
        )
        all_alphas.update(tib_alphas)
        units = [
            dataclasses.replace(
                u, layers=tuple(l for l in u.layers if l not in tib_layers)
            )
            for u in units
        ]
        units = [u for u in units if u.layers]
        # tib layers are calibrated & frozen here: the per-unit walks must
        # see them hard-quantized INSIDE each unit's forward too (a resnet's
        # time_emb_proj behaves quantized at deploy; leaving it FP while its
        # conv1/conv2 alphas optimize would bias the learned rounding), not
        # just in the asym prefix.
        # reconstruct_tib indexed wqp[n] for every tib layer, so all are
        # present by construction
        params_units = fold_weight_quant(
            params, {k: wqp[k] for k in tib_layers}, spec, cfg,
            alphas=tib_alphas, soft=False,
        )

    def batched_capture(p, unit_name, want_inputs=True):
        ins, outs = None, None
        for i in range(0, n, capture_batch):
            batch = tuple(x[i : i + capture_batch] for x in cali_data)
            (bi, bo) = capture_unit_io(p, batch, unit_name, cfg, unet_apply,
                                       want_inputs=want_inputs)
            bi = tuple(np.asarray(x) for x in bi)
            bo = np.asarray(bo)
            if ins is None:
                ins, outs = [list(bi)], [bo]
            else:
                ins.append(list(bi))
                outs.append(bo)
        inputs = tuple(
            jnp.concatenate([chunk[j] for chunk in ins]) for j in range(len(ins[0]))
        )
        outs = jnp.concatenate(outs)
        if mesh is not None and outs.shape[0] % mesh.shape["dp"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec

            dp_sh = NamedSharding(mesh, PartitionSpec("dp"))
            inputs = tuple(jax.device_put(x, dp_sh) for x in inputs)
            outs = jax.device_put(outs, dp_sh)
        return inputs, outs

    for u_idx, unit in enumerate(units):
        if partial_dir:
            # crash recovery: a unit whose partial save exists is loaded and
            # skipped — the asym prefix then quantizes with the loaded
            # alphas, identical to a continuous run (reference per-block
            # saves, calibration.py:456-466)
            import os

            ppath = os.path.join(partial_dir, f"{unit.name}.pth")
            if os.path.exists(ppath):
                from dgq_tpu.io.dgq_ckpt import load_pth

                part = load_pth(ppath)
                for k, v in part.items():
                    rel = k[: -len(".wqtizer.alpha")]
                    name = unit.name if rel == "layer" else f"{unit.name}.{rel}"
                    all_alphas[name] = jnp.asarray(v)
                if progress:
                    progress(f"[{u_idx + 1}/{len(units)}] {unit.name}: "
                             f"resumed from partial save ({len(part)} layers)")
                continue
        if progress:
            progress(f"[{u_idx + 1}/{len(units)}] reconstructing {unit.name}")
        # the asym path replaces the FP inputs with the quantized-prefix
        # capture below — skip collecting them (XLA DCEs the collection,
        # saving one full device->host input transfer per unit)
        replace_inputs = asym and all_alphas
        fp_inputs, fp_out = batched_capture(
            params, unit.name, want_inputs=not replace_inputs)
        if replace_inputs:
            # inputs from the quantized prefix (hard rounding for frozen units)
            pq = fold_weight_quant(
                params, {k: wqp[k] for k in all_alphas}, spec, cfg,
                alphas=all_alphas, soft=False,
            )
            q_inputs, _ = batched_capture(pq, unit.name)
        else:
            q_inputs = fp_inputs
        cached_grads = None
        if opt_mode != "mse":
            # Fisher weighting: |dKL/d(unit out)| + 1 with the prefix AND the
            # current unit hard-quantized (reference save_grad runs the quant
            # model, data_utill.py:54-73,191-256)
            fold_names = set(all_alphas) | set(unit.layers)
            pq_g = fold_weight_quant(
                params, {k: wqp[k] for k in fold_names if k in wqp}, spec, cfg,
                alphas=all_alphas, soft=False,
            )
            gs = []
            for i in range(0, n, capture_batch):
                batch = tuple(x[i : i + capture_batch] for x in cali_data)
                gs.append(np.asarray(capture_unit_grad(
                    params, pq_g, batch, unit.name, cfg, unet_apply)))
            cached_grads = jnp.concatenate([jnp.asarray(g) for g in gs])
        alphas, _ = reconstruct_unit(
            jax.random.fold_in(key, u_idx), unit, params_units, wqp,
            q_inputs, fp_out, cfg, iters=iters, batch_size=batch_size,
            w=w, warmup=warmup, opt_mode=opt_mode, cached_grads=cached_grads,
        )
        all_alphas.update(alphas)
        if partial_dir:
            import os

            from dgq_tpu.io.dgq_ckpt import save_pth

            os.makedirs(partial_dir, exist_ok=True)
            save_pth(
                {f"{n[len(unit.name) + 1:] if n != unit.name else 'layer'}"
                 f".wqtizer.alpha": np.asarray(alphas[n]) for n in alphas},
                os.path.join(partial_dir, f"{unit.name}.pth"),
            )
    return all_alphas

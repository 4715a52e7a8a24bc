"""Distribution-aware group quantization (the "G" in DGQ).

Mirrors /root/reference/quant/quant_layer.py:301-429:
  * per-axis min/max statistics are recorded over calibration batches for two
    candidate axes ("in-channel" = last axis, "out-channel" = second-to-last),
  * a spread heuristic picks the axis,
  * channels are k-means clustered (k = group size) on their (min, max) pairs,
  * each cluster gets one affine scale, expanded back to per-channel
    delta/zero_point of shape (1,1,C) (last axis) or (1,C,1) (middle axis).

Stat reduction runs on-device as jnp reductions folded into the calibration
forward pass; the k-means itself runs host-side via sklearn with
random_state=0 for bit-compatible group assignments with reference
checkpoints (quant_layer.py:357).

For conv layers the statistics are taken on the im2col-unfolded input
(patches axis = "out-channel" candidate, spatial axis = "in-channel"
candidate), matching the reference's unfold+matmul group path
(quant_layer.py:630-657).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.quant.affine import QParams


class GroupStats(NamedTuple):
    """Running per-axis min/max over calibration batches.

    in_min/in_max: per-last-axis, shape (C_last,)
    out_min/out_max: per-second-to-last-axis, shape (C_mid,)
    """

    in_min: jax.Array
    in_max: jax.Array
    out_min: jax.Array
    out_max: jax.Array


def init_group_stats(x_shape: tuple[int, ...], dtype=jnp.float32) -> GroupStats:
    c_last = x_shape[-1]
    c_mid = x_shape[-2]
    big = jnp.asarray(jnp.inf, dtype)
    return GroupStats(
        in_min=jnp.full((c_last,), big),
        in_max=jnp.full((c_last,), -big),
        out_min=jnp.full((c_mid,), big),
        out_max=jnp.full((c_mid,), -big),
    )


def update_group_stats(stats: GroupStats, x: jax.Array) -> GroupStats:
    """Fold one batch into the running stats (reference record_min_max_ema,
    quant_layer.py:301-313, combined with the cross-batch min/max reduction of
    done_group_num :331-332 — so no list of per-batch stats is materialized).

    Works for any rank >= 3: reduces all axes except the candidate axis.
    """
    ndim = x.ndim
    in_axes = tuple(i for i in range(ndim) if i != ndim - 1)
    out_axes = tuple(i for i in range(ndim) if i != ndim - 2)
    return GroupStats(
        in_min=jnp.minimum(stats.in_min, jnp.min(x, axis=in_axes)),
        in_max=jnp.maximum(stats.in_max, jnp.max(x, axis=in_axes)),
        out_min=jnp.minimum(stats.out_min, jnp.min(x, axis=out_axes)),
        out_max=jnp.maximum(stats.out_max, jnp.max(x, axis=out_axes)),
    )


def kmeans_group_qparams(
    stats: GroupStats,
    group_num: int,
    level: int,
    mode: str = "minmax",
    in_channel_wise: bool | None = None,
) -> tuple[QParams, np.ndarray, bool]:
    """Cluster channels and derive per-channel-expanded group qparams
    (reference done_group_num, quant_layer.py:315-429).

    Returns (qparams, labels, in_channel_wise). qparams delta/zero_point have
    shape (1,1,C) when the last axis was grouped, (1,C,1) for the middle axis.
    """
    in_min = np.asarray(stats.in_min).ravel()
    in_max = np.asarray(stats.in_max).ravel()
    out_min = np.asarray(stats.out_min).ravel()
    out_max = np.asarray(stats.out_max).ravel()

    if in_channel_wise is None:
        in_spread = in_max.max() - in_max.min() + in_min.max() - in_min.min()
        out_spread = out_max.max() - out_max.min() + out_min.max() - out_min.min()
        in_channel_wise = bool(in_spread > out_spread) or bool(
            os.environ.get("IN_CHANNEL_WISE", False)
        )

    if in_channel_wise:
        channel_data = np.column_stack((in_min, in_max))
    else:
        channel_data = np.column_stack((out_min, out_max))

    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=group_num, random_state=0).fit(channel_data)
    labels = km.labels_

    if mode == "mean":
        # cluster center = (mean min, mean max) of the cluster's channels
        # (reference done_group_num 'mean' branch, quant_layer.py:371-373)
        centers = km.cluster_centers_
    elif mode == "minmax":
        centers = []
        for i in range(group_num):
            cluster = channel_data[labels == i]
            if cluster.size:
                # Reference takes global min/max over BOTH (min,max) coords
                # of the cluster (quant_layer.py:374-384).
                centers.append([cluster.min(), cluster.max()])
            else:
                centers.append([0.0, 1.0])
        centers = np.asarray(centers)
    else:
        raise NotImplementedError(mode)

    n = channel_data.shape[0]
    delta = np.empty((n,), np.float32)
    zp = np.empty((n,), np.float32)
    for i in range(group_num):
        d = (centers[i, 1] - centers[i, 0]) / (level - 1)
        d = max(float(d), 1e-8)
        delta[labels == i] = d
        zp[labels == i] = np.round(-centers[i, 0] / d)

    shape = (1, 1, n) if in_channel_wise else (1, n, 1)
    qp = QParams(
        delta=jnp.asarray(delta.reshape(shape)),
        zero_point=jnp.asarray(zp.reshape(shape)),
    )
    return qp, labels, in_channel_wise

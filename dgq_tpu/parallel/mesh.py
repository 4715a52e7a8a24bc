"""Device mesh + sharding helpers.

The reference's parallelism (SURVEY.md §2.2) is all data parallelism over
NCCL via the linklink alias layer: gradient allreduce during reconstruction
(quant/reconstruction.py:73-77), `allaverage` of activation deltas
(linklink/dist_helper.py:33-36), and hand-rolled prompt-list slicing for
eval generation (src/gen4eval_SD.py:235).

TPU-native design: one `jax.sharding.Mesh` with a 'dp' axis (batch /
calibration data / eval prompts) and a 'tp' axis (out-channel weight
sharding for models too large per chip). Collectives are inserted by GSPMD:
a jitted loss whose batch is dp-sharded already averages gradients globally —
no explicit allreduce calls exist anywhere in this codebase. `sync_mean` is
provided for host-driven EMA statistics (the allaverage counterpart).

Multi-host (DCN) scaling uses the standard `jax.distributed.initialize()`
before mesh construction; the mesh spans all processes' devices and the same
code runs unchanged — collectives ride ICI within a slice and DCN across.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host (multi-process) JAX init — the counterpart of the
    reference's linklink SLURM/TCP init (/root/reference/linklink/__init__.py:21-59).

    Resolution order mirrors linklink's two paths:
      * explicit args or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
        JAX_PROCESS_ID env vars (the reference's dist_init_slurm MASTER
        addr/port equivalent),
      * otherwise `jax.distributed.initialize()` auto-detection (SLURM_*,
        OMPI_* — the reference's dist_init path).

    Returns True when a multi-process runtime was initialized; False for the
    single-host no-op (no coordinator configured anywhere). After a True
    return, `jax.devices()` spans all processes and `make_mesh` builds a
    global mesh — the same model code runs unchanged, with GSPMD collectives
    riding ICI within a slice and DCN across.
    """
    import os

    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None)
    pid = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)
    if coord is not None:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid)
        return True
    if any(v in os.environ for v in ("SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE")):
        jax.distributed.initialize()  # auto-detected cluster environment
        return True
    return False


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[list] = None,
              multihost: bool = False) -> Mesh:
    """Build the (dp, tp) mesh. With multihost=True, initialize the
    multi-process runtime first (env-configured; see init_multihost) so the
    mesh spans every process's devices."""
    if multihost:
        init_multihost()
    devs = np.asarray(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devs) // tp
    return Mesh(devs[: dp * tp].reshape(dp, tp), ("dp", "tp"))


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) axis over dp; replicate over tp."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_params_tp(mesh: Mesh, params: dict) -> dict:
    """Shard weight out-channels (last axis) over tp; replicate the rest.

    Works for our layouts: conv HWIO and linear (I, O) both have out channels
    last. GSPMD then partitions each matmul/conv over tp and inserts the
    reduce-scatter/all-gather pattern it deems best.
    """
    tp = mesh.shape["tp"]
    out = {}
    for name, p in params.items():
        q = {}
        for k, v in p.items():
            if v is None:
                q[k] = None
            elif hasattr(v, "ndim") and v.ndim >= 2 and v.shape[-1] % tp == 0:
                spec = P(*([None] * (v.ndim - 1) + ["tp"]))
                q[k] = jax.device_put(v, NamedSharding(mesh, spec))
            else:
                q[k] = jax.device_put(v, NamedSharding(mesh, P()))
        out[name] = q
    return out


def shard_prompts(prompts: list, rank: int, world_size: int) -> list:
    """Embarrassingly-parallel eval sharding (reference gen4eval_SD.py:235):
    process `rank` handles its contiguous slice of the prompt list."""
    n = len(prompts)
    per = (n + world_size - 1) // world_size
    return prompts[rank * per : (rank + 1) * per]


def sync_mean(mesh: Optional[Mesh], tree):
    """Mean each leaf of a per-PROCESS pytree across processes — the
    linklink `allaverage` counterpart (dist_helper.py:33-36: divide by
    world_size, allreduce) for host-driven calibration statistics. Every
    process passes its own local stat (any shape, scalars included) and
    receives the global mean. Single-process: identity (the jit'd
    calibration path already averages globally through dp-sharded data, so
    nothing needs syncing). `mesh` is accepted for signature stability and
    unused — process_allgather spans all processes by construction."""
    del mesh
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda v: jnp.mean(
            multihost_utils.process_allgather(jnp.asarray(v)), axis=0),
        tree)

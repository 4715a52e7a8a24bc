"""Multi-host distributed init (parallel/mesh.init_multihost): two OS
processes, one JAX coordinator, a global dp mesh spanning both, and one
jitted cross-process reduction — the TPU-native counterpart of the
reference's linklink SLURM/TCP init + allreduce
(/root/reference/linklink/__init__.py:21-59, dist_helper.py:33-36).
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from dgq_tpu.parallel.mesh import init_multihost, make_mesh, shard_batch

assert init_multihost(), "coordinator env set but init returned False"
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()  # global dp mesh over both processes' devices
ndev = len(jax.devices())
assert ndev == 2 * jax.local_device_count(), (ndev, jax.local_device_count())

# one jitted global reduction over a dp-sharded batch (GSPMD inserts the
# cross-process psum — the linklink allaverage counterpart)
batch = jnp.arange(ndev * 4, dtype=jnp.float32).reshape(ndev, 4)
with mesh:
    b = jax.device_put(batch, NamedSharding(mesh, P("dp")))
    total = jax.jit(
        lambda x: jnp.sum(x),
        out_shardings=NamedSharding(mesh, P()),
    )(b)
got = float(np.asarray(jax.device_get(total)))
want = float(batch.sum())
assert got == want, (got, want)

# sync_mean: each process contributes its OWN local stat; every process
# receives the cross-process mean (linklink allaverage semantics)
from dgq_tpu.parallel.mesh import sync_mean

rank = jax.process_index()
local = {"delta": jnp.full((3,), float(rank + 1)), "zp": jnp.asarray(10.0 * rank)}
synced = sync_mean(mesh, local)
assert np.allclose(np.asarray(synced["delta"]), 1.5), synced["delta"]
assert np.isclose(float(synced["zp"]), 5.0), synced["zp"]
print(f"RANK{jax.process_index()} OK {got}")
"""


def test_two_process_cpu_psum(tmp_path):
    # free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    procs = []
    for rank in range(2):
        env = os.environ.copy()
        env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in workers
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(rank)
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} OK" in out, out

"""Multi-device scaling over jax.sharding meshes (the TPU-native replacement
for the reference's linklink/torch.distributed shim)."""

from dgq_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_params_tp,
    shard_prompts,
    sync_mean,
)

"""Device-mesh parallelism utilities (the NCCL/DDP replacement)."""

from mri2speech_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    host_is_primary,
)

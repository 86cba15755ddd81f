from glimpseprune_tpu.parallel.mesh import (
    enable_sequence_parallel,
    make_mesh,
    param_sharding_rules,
    sequence_parallel,
    shard_batch,
    shard_params,
)

__all__ = [
    "enable_sequence_parallel",
    "make_mesh",
    "param_sharding_rules",
    "sequence_parallel",
    "shard_batch",
    "shard_params",
]

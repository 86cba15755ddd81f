from glimpseprune_tpu.parallel.mesh import (
    make_mesh,
    shard_params,
    shard_batch,
    param_sharding_rules,
)

__all__ = ["make_mesh", "shard_params", "shard_batch", "param_sharding_rules"]

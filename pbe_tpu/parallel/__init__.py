from pbe_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    zero_shard_opt_state,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "zero_shard_opt_state"]

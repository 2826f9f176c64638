from pbe_tpu.parallel.distributed import (
    host_local_to_global,
    is_main_process,
    maybe_initialize,
    per_process_batch_size,
)
from pbe_tpu.parallel.mesh import (
    make_mesh,
    make_multislice_mesh,
    multislice_batch_sharding,
    batch_sharding,
    replicated,
    zero_shard_opt_state,
)

__all__ = ["make_mesh", "make_multislice_mesh", "batch_sharding",
           "multislice_batch_sharding", "replicated", "zero_shard_opt_state",
           "maybe_initialize", "host_local_to_global", "is_main_process",
           "per_process_batch_size"]

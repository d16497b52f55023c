from .bootstrap import device_info, setup_dist
from .mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    batch_sharding,
    batch_spec,
    host_to_mesh,
    is_fsdp_sharded,
    make_mesh,
    params_shardings,
    process_data_shard,
    replicated,
    shard_batch,
    state_shardings,
)

__all__ = [
    "device_info",
    "setup_dist",
    "DATA_AXIS",
    "FSDP_AXIS",
    "batch_sharding",
    "batch_spec",
    "host_to_mesh",
    "is_fsdp_sharded",
    "make_mesh",
    "params_shardings",
    "process_data_shard",
    "replicated",
    "shard_batch",
    "state_shardings",
]

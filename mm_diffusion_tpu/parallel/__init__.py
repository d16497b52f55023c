from .mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    batch_sharding,
    batch_spec,
    make_mesh,
    params_shardings,
    process_data_shard,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "FSDP_AXIS",
    "batch_sharding",
    "batch_spec",
    "make_mesh",
    "params_shardings",
    "process_data_shard",
    "replicated",
    "shard_batch",
]

from .mesh import (
    DATA_AXIS,
    PAIR_AXIS,
    activation_pair_sharding,
    batch_sharding,
    host_local_slice,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "PAIR_AXIS",
    "activation_pair_sharding",
    "batch_sharding",
    "host_local_slice",
    "make_mesh",
    "replicated",
    "shard_batch",
]

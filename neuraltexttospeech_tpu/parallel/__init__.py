"""Device-mesh parallelism: ('data','model') mesh + sharding helpers."""

from .mesh import (
    DATA_AXIS, MODEL_AXIS, P, data_sharding, make_mesh, replicated,
    shard_batch,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "P", "data_sharding", "make_mesh",
           "replicated", "shard_batch"]

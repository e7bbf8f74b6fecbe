"""Device-mesh utilities — the framework's single parallelism substrate.

The reference's only working distribution is single-host multi-GPU
``tf.distribute.MirroredStrategy`` (NCCL all-reduce) wired into one model
(``DiffWave_TF/train.py:336-613``), plus dead ``nccl``/``tcp://`` config
stubs elsewhere (SURVEY §2.4). The TPU-native replacement is one shared
mechanism for every model: a ``jax.sharding.Mesh`` whose ``data`` axis
shards the batch (DP over ICI, multi-slice over DCN via
``jax.distributed.initialize``), with a ``model`` axis reserved so tensor
parallelism can be added without re-plumbing.

No hand-written collectives: ``jit`` + ``NamedSharding`` constraints make
XLA insert ``all-reduce``/``all-gather`` on the right links.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch", "P"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh over available devices.

    Default: all devices on the data axis — the DP regime every model in the
    suite trains under (models are 10–50 M params; SURVEY §2.4).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with its leading axis sharded on ``data``.

    Works for pytrees of arrays with equal leading batch dim.
    """
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

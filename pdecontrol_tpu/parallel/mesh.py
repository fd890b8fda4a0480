"""Device mesh helpers.

The reference's only parallelism is a pool of env subprocesses
(``gym.vector.make(..., num_envs=cpus)``, mbrl.py:81-86).  Here the batch
axis of one jitted program is sharded over a ``jax.sharding.Mesh`` instead:
``data`` shards environments / training batches (DP), ``model`` shards
ensemble members (the EP analogue for the surrogate ensemble).  Collectives
ride ICI; there are no processes or pipes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/env) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ensemble-member) axis over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS))

"""Device-mesh construction and sharding specs.

The reference's only parallelism is an OpenMP `parallel for` over env objects
in one process (VectorizedEnvironment.hpp:273); its TPU-native replacement is
data parallelism over a `jax.sharding.Mesh`: the env/scenario batch axis is
sharded across chips, the 37k-param policy is replicated, and gradient/metric
reductions become XLA `psum`s riding ICI (SURVEY.md section 2.4). Multi-host
extends the same mesh across DCN via `jax.distributed.initialize`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env/scenario) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op single-host). Call before any jax op."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

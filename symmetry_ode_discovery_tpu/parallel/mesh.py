"""Device-mesh utilities: seed-axis sharding for sweeps, batch-axis sharding
for training.

The reference has no distributed layer at all (SURVEY.md §2: the only
"parallelism" is a sequential bash loop over seeds). The TPU-native design
makes the seed sweep a first-class mesh axis: `vmap` inside `shard_map` over
ICI, so a 50-seed discovery sweep is one SPMD program across the slice.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "seed") -> Mesh:
    """1-D mesh over the first n (default: all) local devices."""
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_sweep(run_one: Callable, mesh: Mesh, axis: str = "seed") -> Callable:
    """Lift a per-seed function to a sharded multi-seed sweep.

    run_one(seed_scalar) -> pytree of arrays. Returns f(seeds[(n,)]) with the
    seed axis sharded over the mesh: each device vmaps over its local shard,
    no collectives needed (embarrassingly parallel — the reference's bash loop
    expressed as one SPMD program).

    The number of seeds must be divisible by the mesh size; pad and slice at
    the call site otherwise.
    """
    local = jax.vmap(run_one)
    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis), out_specs=P(axis), check_vma=False
    )
    return jax.jit(sharded)

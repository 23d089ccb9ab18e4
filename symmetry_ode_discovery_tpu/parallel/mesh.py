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
    """1-D mesh over the first n (default: all) local devices.

    Raises when fewer than n_devices exist — silently degrading to a
    smaller (possibly 1-device) mesh would leave the caller believing the
    sharded path is active."""
    devices = jax.devices()
    if n_devices:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} jax devices exist")
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


def shard_stepper(prep_f: Callable, init_f: Callable, step_f: Callable,
                  extract_f: Callable, mesh: Mesh, axis: str = "seed"):
    """Mesh-sharded driver for the host-stepped L-BFGS sweep (EquivSINDy-r).

    Lifts training/siged.py::make_lbfgs_stepper's per-seed (init, step,
    extract) plus the per-seed data prep to seed-axis-sharded multi-seed
    programs: every leaf of the carry keeps its leading seed axis sharded
    over the mesh, each device vmaps its local shard, and no collectives are
    needed (the reference's sequential bash seed loop as one SPMD program per
    host step). The chunk size must be divisible by the mesh size — pad at
    the call site (cli/main.py does).

    Returns (prep_j, init_j, step_j, extract_j) — drop-in replacements for
    the single-device `jax.jit(jax.vmap(...))` wrappers.
    """
    seeded = dict(mesh=mesh, check_vma=False)
    prep_j = jax.jit(jax.shard_map(jax.vmap(prep_f),
                                   in_specs=P(axis), out_specs=P(axis), **seeded))
    init_j = jax.jit(jax.shard_map(jax.vmap(init_f),
                                   in_specs=P(axis), out_specs=P(axis), **seeded))
    # epoch0 is a replicated scalar (same epoch window on every device)
    step_j = jax.jit(jax.shard_map(jax.vmap(step_f, in_axes=(0, None)),
                                   in_specs=(P(axis), P()),
                                   out_specs=P(axis), **seeded))
    ext_j = jax.jit(jax.shard_map(jax.vmap(extract_f),
                                  in_specs=P(axis), out_specs=P(axis), **seeded))
    return prep_j, init_j, step_j, ext_j

"""Data layer: ODE system library, trajectory generation, dataset classes.

Counterpart of the reference's `data_utils/` + `dataset.py`
(reference data_utils/{ode,lotka,damped_oscillator,growth,selkov,smoothing}.py
and dataset.py). All generation is jax-native (lax.scan integrators, jax PRNG,
batched rejection sampling); datasets cache to .npy under DATA_PATH.

NOTE: this subpackage must never be gitignored — the repo-root `.gitignore`
entry for experiment caches is `/data/` (anchored), not `data/`.
"""

from .systems import SYSTEMS, System, dosc, growth, lv, selkov
from .generate import gen_data
from .datasets import (
    DATA_PATH,
    MTODEDataset,
    MultiTimestepReactionDiffusionDataset,
    ODEDataset,
    ReactionDiffusionDataset,
    SimpleLinear,
    get_dataset,
    ode_dt_dict,
)

__all__ = [
    "SYSTEMS", "System", "lv", "dosc", "growth", "selkov", "gen_data",
    "DATA_PATH", "ode_dt_dict", "get_dataset", "ODEDataset", "MTODEDataset",
    "ReactionDiffusionDataset", "MultiTimestepReactionDiffusionDataset",
    "SimpleLinear",
]

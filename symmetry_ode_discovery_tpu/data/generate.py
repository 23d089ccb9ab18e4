"""Trajectory generation: integrate, corrupt with noise, smooth/differentiate.

Counterpart of reference data_utils/ode.py::gen_data (ode.py:31-49), with the
same pipeline semantics:
  1. integrate the batch of ICs with RK4, recording dx at every sample;
  2. optional noise — additive (scaled by the per-dimension std of the CLEAN
     signal) or multiplicative (growth protocol);
  3. derivative recovery — forward finite differences when no smoothing is
     requested (the reference's dx[:-1] = diff(x)/dt quirk: the LAST row keeps
     the clean dx, ode.py:41), or GP smoothing of both x and dx ('gp');
  4. stride subsample, then transpose to (n_ics, num_steps, dim).

TPU-native: the integrator is a `lax.scan` (ops/integrators.py), the noise is
jax PRNG, and the GP smoother is the single-Cholesky engine in
ops/gp_smoothing.py (float64 host path below noise 0.15 — see CLAUDE.md).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.gp_smoothing import num_diff_gp
from ..ops.integrators import solve_ode_batch
from .systems import System

__all__ = ["gen_data"]


def gen_data(
    system: System,
    key: jax.Array,
    n_ics: Optional[int] = None,
    dt: Optional[float] = None,
    num_steps: Optional[int] = None,
    subsample_rate: Optional[int] = None,
    noise: float = 0.0,
    multiplicative_noise: bool = False,
    smoothing: Optional[str] = None,
    gp_sigma_in: Optional[float] = None,
    gp_engine: str = "auto",
):
    """Generate (x, dx) of shape (n_ics, num_steps/subsample_rate, dim).

    Arguments default to the system's reference protocol. `key` drives both
    the IC sampler and the noise draw (the reference uses the global numpy
    RNG; parity is distribution-level, SURVEY §7).
    """
    n_ics = system.default_n_train if n_ics is None else n_ics
    dt = system.default_dt if dt is None else dt
    num_steps = system.default_num_steps if num_steps is None else num_steps
    if subsample_rate is None:
        subsample_rate = system.default_subsample_rate
    if gp_sigma_in is None:
        gp_sigma_in = system.default_gp_sigma_in

    k_ic, k_noise = jax.random.split(key)
    x0 = system.sample_ics(k_ic, n_ics)
    x, dx = solve_ode_batch(system.f, x0, dt=dt, num_steps=num_steps)
    # (num_steps, n_ics, dim), dx exact at every sample (ode.py:13-15)

    if noise > 0:
        x_std = jnp.std(x, axis=(0, 1))  # per-dim std of the clean signal
        eps = jax.random.normal(k_noise, x.shape)
        if multiplicative_noise:
            x = x * (1.0 + eps * noise)  # ode.py:39
        else:
            x = x + eps * noise * x_std  # ode.py:37
        if smoothing is None:
            # finite-difference fallback; last row keeps clean dx (ode.py:41)
            dx = dx.at[:-1].set(jnp.diff(x, axis=0) / dt)
        elif smoothing == "gp":
            dx, x = num_diff_gp(x, dt, noise_level=noise, std_base=x_std,
                                sigma_in=gp_sigma_in, engine=gp_engine)
        else:
            raise ValueError(f"unknown smoothing mode: {smoothing!r}")

    x = x[::subsample_rate]
    dx = dx[::subsample_rate]
    x = jnp.transpose(x, (1, 0, 2))
    dx = jnp.transpose(dx, (1, 0, 2))
    return x, dx

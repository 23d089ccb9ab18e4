"""Differentiable ODE integrators as `lax.scan` loops.

TPU-native counterparts of:
- reference model_utils.py:223-255 (`odeint`, euler/rk4, used inside symmetry
  regularization losses and long-term-prediction evaluation), and
- reference data_utils/ode.py:7-28 (`solve_ode_batch`, the data-generation RK4
  that records x AND dx at every step).

Both are expressed as `lax.scan` over a fixed step count so the whole rollout
is a single compiled loop: jit-able, differentiable (jax.checkpoint-able for
long rollouts), and vmappable over initial conditions and over seeds.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _euler_step(f: Callable, x, dt):
    return x + dt * f(x)


def _rk4_step(f: Callable, x, dt):
    k1 = f(x)
    k2 = f(x + dt / 2 * k1)
    k3 = f(x + dt / 2 * k2)
    k4 = f(x + dt * k3)
    return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


def odeint(
    f: Callable,
    x0: jnp.ndarray,
    t: float,
    dt: float,
    method: str = "euler",
    full_traj: bool = False,
    num_steps: int | None = None,
):
    """Integrate dx/dt = f(x) from x0 for n_steps = int(t / dt) steps.

    Semantics match reference model_utils.py:223-255: returns the final state,
    or the stacked trajectory of the n_steps states AFTER each step (the
    initial state is not included) when full_traj=True.

    num_steps: explicit step count override. Callers that know the step
    count should pass it: deriving it from t = n*dt float-truncates for many
    (n, dt) pairs (e.g. int((43*0.2)/0.2) == 42).
    """
    n_steps = int(t / dt) if num_steps is None else num_steps
    step = _euler_step if method == "euler" else _rk4_step
    if method not in ("euler", "rk4"):
        raise ValueError("Unrecognized ODEInt method.")

    def body(x, _):
        x_next = step(f, x, dt)
        return x_next, x_next if full_traj else None

    x_final, traj = lax.scan(body, x0, None, length=n_steps)
    return traj if full_traj else x_final


def solve_ode_batch(
    ode: Callable,
    x0: jnp.ndarray,
    dt: float = 0.002,
    num_steps: int = 2000,
    solver: str = "rk4",
):
    """RK4 over a batch of initial conditions, recording x and the exact dx at
    every sample.

    Matches reference data_utils/ode.py:7-28: dx[i] = ode(x[i]) (the true
    derivative at the sample, not a finite difference), and the final step
    does not advance x. Returns (x, dx) with shape (num_steps, *x0.shape).
    """
    if solver != "rk4":
        raise NotImplementedError(solver)

    def body(x, _):
        dx = ode(x)
        k1 = dt * dx
        k2 = dt * ode(x + 0.5 * k1)
        k3 = dt * ode(x + 0.5 * k2)
        k4 = dt * ode(x + k3)
        x_next = x + (k1 + 2 * k2 + 2 * k3 + k4) / 6
        return x_next, (x, dx)

    _, (xs, dxs) = lax.scan(body, x0, None, length=num_steps)
    return xs, dxs

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


def make_euler_pair(f_of: Callable, n_steps: int, dt: float):
    """Fused Euler rollout + directional derivative with a memory-light VJP.

    For the EquivSINDy-r closure (training/symmreg.py make_symmreg_i_fast,
    reference model_utils.py:8-67 + train.py:667-673) the hot path computes
    BOTH `fx = odeint(f, x, t, dt)` and `iv = d/deps odeint(f, x + eps*v)`.
    Composing `odeint` + `jax.jvp(odeint)` under autodiff makes XLA store a
    per-step linearization of the whole rollout — (n_steps, batch, n_terms)
    tensors per seed per closure evaluation (the dominant HBM traffic of the
    flagship sweep, see tools/profile_symreg.py) — and runs the primal twice.

    `make_euler_pair(f_of, n, dt)(x0, v0, A)` returns (fx, iv) from ONE scan
    carrying (state, tangent), with a custom VJP that keeps only the
    (n_steps, batch, dim) state/tangent trajectories and re-linearizes each
    Euler step on the reverse sweep (jax.vjp of the step at the stored
    carry). Same math as the composed form — derivatives are exact, only the
    association order of float ops differs.

    f_of(A) must return the vector field x -> f(x; A) for parameters A (the
    masked SINDy coefficients); the VJP covers (x0, v0, A).
    """

    def pair_step(q, tq, A):
        f = f_of(A)
        q1 = _euler_step(f, q, dt)
        tq1 = tq + dt * jax.jvp(f, (q,), (tq,))[1]
        return q1, tq1

    @jax.custom_vjp
    def euler_pair(x0, v0, A):
        def body(carry, _):
            q, tq = carry
            return pair_step(q, tq, A), None

        (q, tq), _ = lax.scan(body, (x0, v0), None, length=n_steps)
        return q, tq

    def fwd(x0, v0, A):
        def body(carry, _):
            q, tq = carry
            return pair_step(q, tq, A), carry  # save the step INPUTS

        (q, tq), (qs, tqs) = lax.scan(body, (x0, v0), None, length=n_steps)
        return (q, tq), (qs, tqs, A)

    def bwd(res, cot):
        qs, tqs, A = res
        cq, ctq = cot
        cA0 = jax.tree_util.tree_map(jnp.zeros_like, A)

        def body(carry, step_in):
            cq, ctq, cA = carry
            q, tq = step_in
            _, vjp_fn = jax.vjp(pair_step, q, tq, A)
            dq, dtq, dA = vjp_fn((cq, ctq))
            return (dq, dtq, jax.tree_util.tree_map(jnp.add, cA, dA)), None

        (cq, ctq, cA), _ = lax.scan(body, (cq, ctq, cA0), (qs, tqs),
                                    reverse=True)
        return cq, ctq, cA

    euler_pair.defvjp(fwd, bwd)
    return euler_pair

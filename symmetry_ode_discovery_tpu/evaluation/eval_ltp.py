"""Long-term prediction accuracy of a discovered equation.

Counterpart of reference evaluation/eval_ltp.py: roll the learned dynamics out
with RK4 from each trajectory's initial state (optionally through the
autoencoder latent space) and report the per-step MSE against the ground-truth
trajectories. The rollout is the `lax.scan` odeint — one compiled program per
(n_steps, dt) shape, vmapped over initial conditions.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..data.datasets import ode_dt_dict
from ..ops.integrators import odeint


def eval_ltp_accuracy(
    forward_fn: Callable,
    x: jnp.ndarray,
    task: str,
    dt: Optional[float] = None,
    encode: Optional[Callable] = None,
    decode: Optional[Callable] = None,
):
    """x: (n_ics, n_steps, n_dim) ground-truth trajectories.

    forward_fn: the learned vector field (dz/dt or dx/dt).
    encode/decode: optional autoencoder maps for latent-space dynamics
    (reference eval_ltp.py:28-34).

    Returns {'x_pred', 't', 'error'} matching the reference's schema
    (eval_ltp.py:39-45).
    """
    x0 = x[:, 0]
    n_ics, n_steps, n_dim = x.shape
    n_steps -= 1
    if dt is None:
        dt = ode_dt_dict[task.split("_")[-1]]
    t_max = n_steps * dt

    if encode is not None:
        z0 = encode(x0)
        z_pred = odeint(forward_fn, z0, t_max, dt, method="rk4",
                        full_traj=True, num_steps=n_steps)
        # (n_steps, n_ics, latent) -> decode each step
        x_pred = decode(z_pred.reshape(-1, z_pred.shape[-1]))
        x_pred = x_pred.reshape(n_steps, n_ics, n_dim).transpose(1, 0, 2)
    else:
        x_pred = odeint(forward_fn, x0, t_max, dt, method="rk4",
                        full_traj=True, num_steps=n_steps)
        x_pred = x_pred.transpose(1, 0, 2)

    error = jnp.mean((x[:, 1:] - x_pred) ** 2, axis=-1)
    return {
        "x_pred": np.asarray(x_pred),
        "t": np.arange(1, n_steps + 1) * dt,
        "error": np.asarray(error),
    }

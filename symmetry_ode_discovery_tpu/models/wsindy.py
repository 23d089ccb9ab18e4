"""Weak SINDy: trigonometric test functions + weak-form regression.

TPU-native counterpart of reference sindy.py:327-395 (`WSINDyWrapper`). The
test-function matrices are built once; each solve is one masked ridge lstsq per
output dimension (fixed shapes, vmappable over seeds — the reference's 50-seed
WSINDy sweep becomes a single batched solve).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.linalg import masked_lstsq_per_dim
from .sindy import SINDyConfig, SINDyState, get_Xi, set_threshold


@struct.dataclass
class WSINDyMatrices:
    """Integration matrices V (test functions) and V_drv (their derivatives),
    both premultiplied by dt (reference sindy.py:332-350)."""

    V: jnp.ndarray  # (K, T)
    V_drv: jnp.ndarray  # (K, T)


def make_wsindy_matrices(t: jnp.ndarray, t_max: float, num_test_funcs: int = 50,
                         test_func_family: str = "trig") -> WSINDyMatrices:
    """g_k(t) = sqrt(2/t_max) sin(k pi t / t_max), k = 1..K, with analytic
    derivatives (reference sindy.py:336-348)."""
    if test_func_family != "trig":
        raise NotImplementedError(f"test_func_family={test_func_family} not implemented")
    dt = t[1] - t[0]
    k = jnp.arange(1, num_test_funcs + 1, dtype=jnp.float32)[:, None]
    g = math.sqrt(2 / t_max) * jnp.sin(k * jnp.pi * t[None, :] / t_max)
    g_drv = math.sqrt(2 / t_max) * k * jnp.pi / t_max * jnp.cos(k * jnp.pi * t[None, :] / t_max)
    return WSINDyMatrices(V=dt * g, V_drv=dt * g_drv)


def wsindy_solve_step(
    cfg: SINDyConfig,
    state: SINDyState,
    mats: WSINDyMatrices,
    x: jnp.ndarray,
    w_sindy_reg: float,
    st_threshold: float,
):
    """One weak-form solve + threshold (reference WSINDyWrapper.solve,
    sindy.py:352-395).

    x: (T, dim) single uniformly-sampled trajectory.
    Returns (new_state, residual, converged).
    """
    # this solver writes state.Xi directly; a constrained cfg would make
    # get_Xi/set_threshold re-derive Xi from the untouched beta and silently
    # report random-init coefficients — fail loudly instead
    assert not cfg.constraint, (
        "wsindy_solve_step solves unconstrained Xi; the equivariance "
        "constraint (beta parameterization) is not supported on the "
        "weak-form path (the reference never combines them either)")
    theta = cfg.library(x)  # (T, p)
    G = mats.V @ theta  # (K, p)
    b = -mats.V_drv @ x  # (K, dim)
    p = G.shape[1]
    sqrt_gamma_I = math.sqrt(w_sindy_reg) * jnp.eye(p, dtype=G.dtype) if w_sindy_reg > 0 else jnp.zeros((p, p), dtype=G.dtype)
    G_aug = jnp.concatenate([mats.V.T @ G, sqrt_gamma_I], axis=0)  # (T+p, p)
    b_aug = jnp.concatenate([mats.V.T @ b, jnp.zeros((p, b.shape[1]), dtype=b.dtype)], axis=0)

    Xi = masked_lstsq_per_dim(G_aug, b_aug, state.mask)
    new_state = state.replace(Xi=Xi)
    resid = jnp.mean((G_aug @ (Xi * state.mask).T - b_aug) ** 2)
    new_state = set_threshold(cfg, new_state, st_threshold)
    converged = jnp.all(new_state.mask == state.mask)
    return new_state, resid, converged


def solve_wsindy(
    cfg: SINDyConfig,
    state: SINDyState,
    mats: WSINDyMatrices,
    x: jnp.ndarray,
    w_sindy_reg: float,
    st_threshold: float,
    num_epochs: int = 10,
):
    """Iterate the weak solve to mask fixpoint (reference train.py:855-869).
    Fixed iteration count; each iteration is idempotent after convergence."""

    def body(carry, _):
        st, _ = carry
        st, resid, _ = wsindy_solve_step(cfg, st, mats, x, w_sindy_reg, st_threshold)
        return (st, resid), None

    (state, resid), _ = jax.lax.scan(body, (state, jnp.array(0.0)), None, length=num_epochs)
    return state, resid

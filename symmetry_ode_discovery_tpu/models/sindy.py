"""SINDy regressor: pure-pytree state + functional forward/solve.

TPU-native counterpart of reference sindy.py:33-324 (`SINDyRegression`,
`solve_SINDy[_one_step]`). The reference mutates `Xi.data` / `mask.data` /
`beta.data` in place; here every operation maps `SINDyState -> SINDyState`, so
the STLSQ loop is a `lax.scan`, jit-compiles once, and **vmaps over seeds** —
the 50-seed sweep that the reference runs as a sequential bash loop becomes a
single batched solve on one chip (or shard_map'd over the mesh).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.constraint import get_Q, q_row_major, xi_from_beta
from ..ops.library import FunctionLibrary
from ..ops.linalg import masked_lstsq_per_dim, min_norm_lstsq, ridge_augment


@dataclasses.dataclass(frozen=True)
class SINDyConfig:
    """Static configuration (hashable — safe as a jit static arg).

    Mirrors reference sindy.py:42-77: under the equivariance constraint the
    sine/exp terms are disabled (sindy.py:47-48) and `allow_constant` is the
    negation of --constrain_constant (sindy.py:60).
    """

    latent_dim: int
    poly_order: int = 2
    include_sine: bool = False
    include_exp: bool = False
    constraint: bool = False
    use_kron_product: bool = True
    allow_constant: bool = True
    # Bug-compat with reference sindy.py:59: under `constrain_constant` the
    # reference STILL registers `const` as an nn.Parameter, so it contributes
    # |const| to the L1 penalty and its update norm to the L-BFGS convergence
    # delta (train.py:681-690,705) even though get_Xi never reads it. Default
    # False = the mathematically clean behavior (const simply absent);
    # True reproduces the reference's dangling parameter for users combining
    # --constrain_constant with w_sindy_reg > 0.
    dangling_const: bool = False
    n_free: int = 0  # number of beta parameters (columns of Q); 0 if unconstrained
    threshold: float = 0.1

    @property
    def library(self) -> FunctionLibrary:
        return FunctionLibrary(
            dim=self.latent_dim,
            poly_order=self.poly_order,
            include_sine=self.include_sine and not self.constraint,
            include_exp=self.include_exp and not self.constraint,
        )

    @property
    def n_terms(self) -> int:
        return self.library.n_terms


@struct.dataclass
class SINDyState:
    """Learnable/derived state. For the unconstrained path `Xi` is the free
    parameter; for the constrained path (beta, const) are free and Xi is
    derived via Q (reference sindy.py:169-176)."""

    Xi: jnp.ndarray  # (d, p)
    mask: jnp.ndarray  # (d, p)
    beta: jnp.ndarray  # (q,) — zeros-size placeholder when unconstrained
    const: jnp.ndarray  # (d, 1)
    Q: jnp.ndarray  # (d*p, q) row-major vec convention — placeholder when unconstrained


def make_config(
    latent_dim: int,
    poly_order: int = 2,
    include_sine: bool = False,
    include_exp: bool = False,
    L_list: Sequence[np.ndarray] = (),
    constrain_constant: bool = False,
    threshold: float = 0.1,
    dangling_const: bool = False,
) -> tuple[SINDyConfig, Optional[np.ndarray]]:
    """Build the config (and the Q null-space basis when constrained).

    Returns (config, Q_row_major or None). Q is computed on host once
    (closed-form M + numpy SVD, reference sindy.py:85-115) and stored in the
    state so `update_Q` during joint training is just a state swap.
    """
    constraint = len(L_list) != 0
    if not constraint:
        cfg = SINDyConfig(
            latent_dim=latent_dim,
            poly_order=poly_order,
            include_sine=include_sine,
            include_exp=include_exp,
            constraint=False,
            threshold=threshold,
        )
        return cfg, None
    lib = FunctionLibrary(latent_dim, poly_order, False, False)
    Q, use_kron = get_Q(lib, L_list)
    Q_rm = q_row_major(Q, latent_dim, lib.n_terms, use_kron)
    cfg = SINDyConfig(
        latent_dim=latent_dim,
        poly_order=poly_order,
        include_sine=False,
        include_exp=False,
        constraint=True,
        use_kron_product=use_kron,
        allow_constant=not constrain_constant,
        dangling_const=dangling_const and constrain_constant,
        n_free=Q.shape[1],
        threshold=threshold,
    )
    return cfg, Q_rm


def init_sindy(key: jax.Array, cfg: SINDyConfig, Q: Optional[np.ndarray] = None) -> SINDyState:
    """Random-normal init, matching reference sindy.py:58-66."""
    d, p = cfg.latent_dim, cfg.n_terms
    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.constraint:
        assert Q is not None and Q.shape[1] == cfg.n_free
        beta = jax.random.normal(k1, (cfg.n_free,))
        const = jax.random.normal(k2, (d, 1))
        Qj = jnp.asarray(Q)
        Xi = xi_from_beta(Qj, beta, const, d, p, cfg.allow_constant)
    else:
        Xi = jax.random.normal(k3, (d, p))
        beta = jnp.zeros((0,))
        const = jnp.zeros((d, 1))
        Qj = jnp.zeros((d * p, 0))
    return SINDyState(Xi=Xi, mask=jnp.ones((d, p)), beta=beta, const=const, Q=Qj)


def get_Xi(cfg: SINDyConfig, state: SINDyState) -> jnp.ndarray:
    """Current coefficient matrix (reference sindy.py:169-176, 79-80)."""
    if cfg.constraint:
        return xi_from_beta(
            state.Q, state.beta, state.const, cfg.latent_dim, cfg.n_terms,
            cfg.allow_constant,
        )
    return state.Xi


def sindy_forward(cfg: SINDyConfig, state: SINDyState, x: jnp.ndarray) -> jnp.ndarray:
    """dx_pred = Theta(x) @ (Xi * mask)^T (reference sindy.py:79-82)."""
    theta = cfg.library(x)
    Xi = get_Xi(cfg, state)
    return theta @ (Xi * state.mask).T


def set_threshold(cfg: SINDyConfig, state: SINDyState, threshold: float) -> SINDyState:
    """Monotone mask update: mask &= |Xi| > threshold (reference sindy.py:192-195)."""
    Xi = get_Xi(cfg, state)
    new_mask = jnp.logical_and(jnp.abs(Xi) > threshold, state.mask > 0).astype(state.mask.dtype)
    return state.replace(mask=new_mask)


def reset_mask(state: SINDyState) -> SINDyState:
    return state.replace(mask=jnp.ones_like(state.mask))


# ---------------------------------------------------------------------------
# Direct STLSQ solvers (reference sindy.py:250-324)
# ---------------------------------------------------------------------------

def _augmented_Q(state: SINDyState, cfg: SINDyConfig) -> jnp.ndarray:
    """Append the free-constant columns to Q (reference sindy.py:277-280):
    column d*p+i has a single 1 at the row of dim i's constant term (row-major
    position i*p)."""
    d, p = cfg.latent_dim, cfg.n_terms
    cols = jnp.zeros((d * p, d), dtype=state.Q.dtype)
    rows = jnp.arange(d) * p
    cols = cols.at[rows, jnp.arange(d)].set(1.0)
    return jnp.concatenate([state.Q, cols], axis=1)


def solve_sindy_one_step(
    cfg: SINDyConfig,
    state: SINDyState,
    x: jnp.ndarray,
    y: jnp.ndarray,
    w_sindy_reg: float,
    st_threshold: float,
):
    """One STLSQ iteration: masked ridge lstsq + threshold.

    Matches reference solve_SINDy_one_step (sindy.py:250-315) with fixed
    shapes: masked columns are zeroed instead of pruned (min-norm lstsq pins
    them to exactly 0 — see ops/linalg.py). Returns (state, residual, converged).
    """
    d, p = cfg.latent_dim, cfg.n_terms
    theta = cfg.library(x)
    A, B = ridge_augment(theta, y, w_sindy_reg)

    if not cfg.constraint:
        Xi = masked_lstsq_per_dim(A, B, state.mask)
        new_state = state.replace(Xi=Xi)
    else:
        Qa = _augmented_Q(state, cfg) if cfg.allow_constant else state.Q
        mflat = state.mask.reshape(-1).astype(A.dtype)  # row-major
        Qm = Qa * mflat[:, None]
        # Block-diag(A) @ Qm without materializing the block diagonal:
        # rows for dim j are A @ Qm[j*p:(j+1)*p].
        Qm_blocks = Qm.reshape(d, p, -1)
        AQ = jnp.einsum("mp,dpq->dmq", A, Qm_blocks).reshape(d * A.shape[0], -1)
        b = B.T.reshape(-1)
        sol = min_norm_lstsq(AQ, b)
        if cfg.allow_constant:
            beta, const = sol[: cfg.n_free], sol[cfg.n_free:].reshape(d, 1)
            new_state = state.replace(beta=beta, const=const)
        else:
            new_state = state.replace(beta=sol)

    Xi = get_Xi(cfg, new_state)
    resid = jnp.mean((theta @ (Xi * state.mask).T - y) ** 2)
    new_state = set_threshold(cfg, new_state, st_threshold)
    converged = jnp.all(new_state.mask == state.mask)
    return new_state, resid, converged


def solve_sindy(
    cfg: SINDyConfig,
    state: SINDyState,
    x: jnp.ndarray,
    y: jnp.ndarray,
    w_sindy_reg: float,
    st_threshold: float,
    max_iter: int = 5,
):
    """Full STLSQ to (idempotent) convergence: reference solve_SINDy
    (sindy.py:318-324). Runs the fixed max_iter iterations — each iteration is
    idempotent once the mask stops changing, so this equals the reference's
    early-break loop while staying scan/vmap-friendly."""
    state = reset_mask(state)

    def body(carry, _):
        st, _ = carry
        st, resid, _ = solve_sindy_one_step(cfg, st, x, y, w_sindy_reg, st_threshold)
        return (st, resid), None

    (state, resid), _ = jax.lax.scan(body, (state, jnp.array(0.0)), None, length=max_iter)
    return state, resid


# ---------------------------------------------------------------------------
# Pretty-printing (reference sindy.py:206-247)
# ---------------------------------------------------------------------------

def equation_strings(cfg: SINDyConfig, state: SINDyState, var: str = "z") -> List[str]:
    Xi = np.asarray(get_Xi(cfg, state))
    mask = np.asarray(state.mask)
    names = cfg.library.term_names(var)
    eqs = []
    for i in range(cfg.latent_dim):
        eq = f"d{var}{i} ="
        for pos, name in enumerate(names):
            if mask[i, pos]:
                term = f" {Xi[i, pos]:.3f}" + ("" if name == "1" else f"*{name}") + " +"
                eq += term
        eqs.append(eq)
    return eqs


def print_equations(cfg: SINDyConfig, state: SINDyState, var: str = "z") -> None:
    for eq in equation_strings(cfg, state, var):
        print(eq)

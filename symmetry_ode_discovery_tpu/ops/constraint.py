"""Equivariance constraint for SINDy coefficients (EquivSINDy-c).

The constraint L_i Xi = Xi M_i for each Lie-algebra basis element L_i, where
M_i is the representation of L_i on the polynomial library: the unique matrix
with J_Theta(z) . L_i z = M_i Theta(z).

The reference builds M_i symbolically with sympy (reference sindy.py:123-144).
Here M_i is computed in closed form on monomial exponent vectors: for a
monomial theta_t(z) = z^{E_t},

    (J_Theta L z)_t = sum_{m,j} E_{tm} L_{mj} z^{E_t - e_m + e_j},

and E_t - e_m + e_j indexes another library monomial of the same degree. So
M_i[t, u] = sum over (m, j) with E_t - e_m + e_j = E_u of E_{tm} * L_i[m, j].
Exact integer combinatorics — no symbols, no Jacobians, microseconds.

The null space Q of the stacked constraint matrix C follows the reference
exactly (sindy.py:85-115): per-L branch on invertibility (det >= 1e-5 uses the
Kronecker form kron(L^-1, M^T) - I on the ROW-major vec of Xi; otherwise the
Sylvester form kron(-M^T, I) + kron(I, L) on the COLUMN-major vec), SVD with
the 5e-3 trailing-singular-value cutoff.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .library import FunctionLibrary, poly_exponent_table


def get_M_list(library: FunctionLibrary, L_list: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Representation matrices M_i of each L_i on the polynomial library.

    Matches the sympy construction of reference sindy.py:123-144 exactly
    (verified: M entries are linear in L with integer weights E_{tm}).
    """
    if library.include_sine or library.include_exp:
        raise ValueError("Equivariance constraint supports the polynomial library only "
                         "(the reference disables sine/exp under constraint, sindy.py:47-48).")
    E = poly_exponent_table(library.dim, library.poly_order)
    p, d = E.shape
    index = {tuple(row): t for t, row in enumerate(E.tolist())}
    M_list = []
    for L in L_list:
        L = np.asarray(L, dtype=np.float64)
        M = np.zeros((p, p), dtype=np.float64)
        for t in range(p):
            for m in range(d):
                if E[t, m] == 0:
                    continue
                for j in range(d):
                    v = E[t].copy()
                    v[m] -= 1
                    v[j] += 1
                    u = index[tuple(v)]
                    M[t, u] += E[t, m] * L[m, j]
        M_list.append(M)
    return M_list


def get_Q(
    library: FunctionLibrary,
    L_list: Sequence[np.ndarray],
    sv_cutoff: float = 5e-3,
) -> Tuple[np.ndarray, bool]:
    """Null-space basis Q of the stacked equivariance constraints.

    Returns (Q, use_kron_product). Q has shape (d*p, r); its columns span
    {vec(Xi) : L_i Xi = Xi M_i for all i}, in the vec convention picked by the
    (reference-faithful) invertibility branch of the LAST L (sindy.py:85-106).
    """
    M_list = get_M_list(library, L_list)
    d = library.dim
    p = M_list[0].shape[0]
    C_list = []
    use_kron = False
    for L, M in zip(L_list, M_list):
        L = np.asarray(L, dtype=np.float64)
        if np.linalg.det(L) < 1e-5:
            use_kron = False
            MT = M.T
            C = np.kron(-MT, np.eye(d)) + np.kron(np.eye(p), L)
        else:
            # "when L is invertible, this somehow leads to better stability in
            # equation discovery" (reference sindy.py:94)
            use_kron = True
            C = np.kron(np.linalg.inv(L), M.T)
            C = C - np.eye(C.shape[0])
        C_list.append(C)
    C_total = np.concatenate(C_list, axis=0)
    _, Sigma, Vt = np.linalg.svd(C_total)
    V = Vt.T
    # Count trailing singular values <= cutoff (reference sindy.py:101-104).
    r = 0
    for r in range(len(Sigma)):
        if abs(Sigma[-1 - r]) > sv_cutoff:
            break
    # r == 0 (full-rank constraint, no null space): the reference's
    # V[:, -0:] slice returns ALL of V — it proceeds effectively
    # unconstrained rather than collapsing Xi to zero; mirror that.
    Q = V if r == 0 else V[:, V.shape[1] - r:]
    return np.asarray(Q, dtype=np.float32), use_kron


def q_row_major(Q: np.ndarray, d: int, p: int, use_kron: bool) -> np.ndarray:
    """Re-index Q rows to the ROW-major vec(Xi) convention used by the direct
    STLSQ solver's mask flattening (reference sindy.py:273,282 uses
    mask.flatten(), which is row-major).

    The reference indexes Q[mask.flatten()] regardless of which vec convention
    get_Q produced; for the Sylvester (column-major) branch that mixes
    conventions. We normalize instead — identical to the reference on the
    Kronecker branch (the one exercised by every shipped config), well-defined
    on both.
    """
    if use_kron:
        return Q
    perm = np.arange(d * p).reshape(p, d).T.reshape(-1)  # row-major pos -> col-major row
    return Q[perm]


def xi_from_beta(
    Q: jnp.ndarray,
    beta: jnp.ndarray,
    const: jnp.ndarray,
    d: int,
    p: int,
    allow_constant: bool,
) -> jnp.ndarray:
    """Xi = unvec_row_major(Q beta) [+ constant column] (reference
    sindy.py:169-176).

    Q MUST be in the row-major vec(Xi) convention — which both producers
    guarantee (`q_row_major` normalizes the host get_Q output for either
    branch; `get_Q_padded_jnp` permutes its Sylvester branch on device), so
    there is exactly one unvec here. A second convention switch keyed on the
    branch (as the reference's mask.flatten() indexing effectively does,
    sindy.py:273,282) would scramble Xi for Sylvester-branch constraints."""
    v = Q @ beta
    Xi = v.reshape(d, p)
    if allow_constant:
        pad = jnp.zeros((d, p - 1), dtype=Xi.dtype)
        Xi = Xi + jnp.concatenate([const.reshape(d, 1), pad], axis=1)
    return Xi


# ---------------------------------------------------------------------------
# On-device dynamic constraint (live update_Q during joint training,
# reference sindy.py:117-120 + train.py:155-168)
# ---------------------------------------------------------------------------

def m_weight_tensor(library: FunctionLibrary) -> np.ndarray:
    """Weight tensor W with M(L) = einsum('tumj,mj->tu', W, L): because M is
    linear in L with integer coefficients (see get_M_list), it can be
    precomputed once and contracted on device — replacing the reference's
    sympy rebuild on every update_Q call."""
    E = poly_exponent_table(library.dim, library.poly_order)
    p, d = E.shape
    index = {tuple(row): t for t, row in enumerate(E.tolist())}
    W = np.zeros((p, p, d, d), dtype=np.float32)
    for t in range(p):
        for m in range(d):
            if E[t, m] == 0:
                continue
            for j in range(d):
                v = E[t].copy()
                v[m] -= 1
                v[j] += 1
                u = index[tuple(v)]
                W[t, u, m, j] += E[t, m]
    return W


def get_Q_padded_jnp(W: jnp.ndarray, L: jnp.ndarray, sv_cutoff: float = 5e-3):
    """jit-able Q computation with static shapes: returns Q of shape
    (d*p, d*p) in ROW-major vec(Xi) convention, with non-null-space columns
    zeroed (so the usable rank is data-dependent but the shape is not).

    L may be a single (d, d) generator or a (c, d, d) channel stack; the
    stacked constraint (null space of all channels simultaneously) matches
    host-side get_Q / reference sindy.py:85-106, where the per-channel C
    matrices are concatenated before the SVD. Branch selection on det(L_i)
    follows reference sindy.py:90-98 via lax.cond; the output vec convention
    follows the LAST channel's branch, as in get_Q.
    """
    from jax import lax

    if L.ndim == 2:
        L = L[None]
    p = W.shape[0]
    d = L.shape[-1]
    eye_dp = jnp.eye(d * p, dtype=L.dtype)

    def make_C(Li):
        M = jnp.einsum("tumj,mj->tu", W, Li)

        def kron_branch(_):
            return jnp.kron(jnp.linalg.inv(Li), M.T) - eye_dp

        def sylvester_branch(_):
            return (jnp.kron(-M.T, jnp.eye(d, dtype=L.dtype))
                    + jnp.kron(jnp.eye(p, dtype=L.dtype), Li))

        use_kron = jnp.linalg.det(Li) >= 1e-5
        return lax.cond(use_kron, kron_branch, sylvester_branch, operand=None), use_kron

    pieces = [make_C(L[i]) for i in range(L.shape[0])]
    C_total = jnp.concatenate([c for c, _ in pieces], axis=0)
    use_kron_last = pieces[-1][1]
    _, S, Vt = jnp.linalg.svd(C_total, full_matrices=False)
    V = Vt.T
    col_mask = (S <= sv_cutoff).astype(L.dtype)  # S sorted desc -> trailing cols
    # full-rank constraint (no null column): the reference's V[:, -0:] slice
    # keeps ALL of V (effectively unconstrained) — zeroing every column here
    # would instead silently collapse Xi to zero mid-training
    col_mask = jnp.where(jnp.any(S <= sv_cutoff), col_mask,
                         jnp.ones_like(col_mask))
    Q = V * col_mask[None, :]
    # Sylvester branch produced column-major rows; permute to row-major.
    perm = jnp.arange(d * p).reshape(p, d).T.reshape(-1)
    Q_rm = lax.cond(use_kron_last, lambda q: q, lambda q: q[perm], Q)
    return Q_rm

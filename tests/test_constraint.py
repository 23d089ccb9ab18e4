"""Tests for the closed-form equivariance constraint (ops/constraint.py)
against sympy ground truth and analytic expectations."""

import jax.numpy as jnp
import numpy as np
import pytest

from symmetry_ode_discovery_tpu.ops.constraint import get_M_list, get_Q, xi_from_beta
from symmetry_ode_discovery_tpu.ops.library import FunctionLibrary


def sympy_M_list(latent_dim, poly_order, L_list):
    """Reference construction (sindy.py:123-166), transcribed with sympy."""
    import sympy as sp

    z = sp.Matrix([sp.symbols(f"z{i}") for i in range(latent_dim)])
    rows = [sp.Integer(1)]
    for i in range(latent_dim):
        rows.append(z[i])
    if poly_order > 1:
        for i in range(latent_dim):
            for j in range(i, latent_dim):
                rows.append(z[i] * z[j])
    if poly_order > 2:
        for i in range(latent_dim):
            for j in range(i, latent_dim):
                for k in range(j, latent_dim):
                    rows.append(z[i] * z[j] * z[k])
    Theta = sp.Matrix(rows)
    J = Theta.jacobian(z)
    out = []
    for L in L_list:
        M_temp = J * sp.Matrix(L.tolist()) * z
        p = M_temp.shape[0]
        M = np.zeros((p, p))
        for j in range(p):
            expr = M_temp[j].expand()
            M[j, 0] = float(expr.subs({zi: 0 for zi in z}))
            for k in range(1, p):
                M[j, k] = float(expr.coeff(Theta[k]).subs({zi: 0 for zi in z}))
        out.append(M)
    return out


@pytest.mark.parametrize("poly_order", [1, 2, 3])
def test_M_matches_sympy(poly_order):
    rng = np.random.default_rng(0)
    L_list = [rng.standard_normal((2, 2)), np.array([[0.0, 1.0], [-1.0, 0.0]])]
    lib = FunctionLibrary(2, poly_order)
    got = get_M_list(lib, L_list)
    want = sympy_M_list(2, poly_order, L_list)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-10)


def test_M_matches_sympy_3d():
    rng = np.random.default_rng(1)
    L_list = [rng.standard_normal((3, 3))]
    lib = FunctionLibrary(3, 2)
    got = get_M_list(lib, L_list)
    want = sympy_M_list(3, 2, L_list)
    np.testing.assert_allclose(got[0], want[0], atol=1e-10)


def test_Q_so2_constraint_satisfied():
    """Every Xi in the span of Q must satisfy L Xi = Xi M for so(2)."""
    L = np.array([[0.0, 1.0], [-1.0, 0.0]])  # the reference's fixed so2 (gan.py:111)
    lib = FunctionLibrary(2, 2)
    Q, use_kron = get_Q(lib, [L])
    assert use_kron  # det = 1 > 1e-5
    M = get_M_list(lib, [L])[0]
    rng = np.random.default_rng(2)
    for _ in range(5):
        beta = rng.standard_normal(Q.shape[1]).astype(np.float32)
        Xi = np.asarray(xi_from_beta(jnp.asarray(Q), jnp.asarray(beta),
                                     jnp.zeros((2, 1)), 2, 6, False))
        np.testing.assert_allclose(L @ Xi, Xi @ M, atol=2e-3)


def test_Q_sylvester_branch_xi_equivariant():
    """Singular L forces the Sylvester branch (det < 1e-5); the row-major
    normalized Q + single row-major unvec in xi_from_beta must still produce
    Xi satisfying the Lie-derivative constraint L Xi = Xi M. Regression for
    the double-convention-switch bug (xi_from_beta used to re-apply a
    column-major unvec on this branch, scrambling Xi)."""
    from symmetry_ode_discovery_tpu.ops.constraint import q_row_major

    L = np.array([[1.0, 0.0], [0.0, 0.0]])  # scaling in x only, singular
    lib = FunctionLibrary(2, 2)
    Q, use_kron = get_Q(lib, [L])
    assert not use_kron
    Q_rm = q_row_major(Q, 2, lib.n_terms, use_kron)
    M = get_M_list(lib, [L])[0]
    rng = np.random.default_rng(3)
    for _ in range(5):
        beta = rng.standard_normal(Q.shape[1]).astype(np.float32)
        Xi = np.asarray(xi_from_beta(jnp.asarray(Q_rm), jnp.asarray(beta),
                                     jnp.zeros((2, 1)), 2, 6, False))
        np.testing.assert_allclose(L @ Xi, Xi @ M, atol=2e-3)


def test_Q_contains_dosc_truth():
    """The dosc ground-truth Xi (rotation + damping, eval_eq.py:98-101) must lie
    in the so(2)-constraint null space."""
    L = np.array([[0.0, 1.0], [-1.0, 0.0]])
    lib = FunctionLibrary(2, 2)
    Q, use_kron = get_Q(lib, [L])
    truth = np.array([
        [0.0, -0.1, -1, 0.0, 0.0, 0.0],
        [0.0, 1, -0.1, 0.0, 0.0, 0.0],
    ], dtype=np.float32)
    v = truth.reshape(-1) if use_kron else truth.T.reshape(-1)
    # project v onto span(Q); residual should vanish
    proj = Q @ (Q.T @ v)
    np.testing.assert_allclose(proj, v, atol=1e-4)


def test_Q_scaling2_constraint():
    L = np.array([[2.0, 0.0], [0.0, 1.0]])  # reference gan.py:127 'scaling2'
    lib = FunctionLibrary(2, 2)
    Q, use_kron = get_Q(lib, [L])
    assert use_kron
    # growth truth (constrained run uses constrain_constant): [[0,-.3,0,0,0,.1],[0,0,1,0,0,0]]
    truth = np.array([
        [0.0, -0.3, 0.0, 0.0, 0.0, 0.1],
        [0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
    ], dtype=np.float32)
    v = truth.reshape(-1)
    proj = Q @ (Q.T @ v)
    np.testing.assert_allclose(proj, v, atol=1e-4)


def test_Q_padded_jnp_multichannel():
    """Stacked (c, d, d) input must intersect the per-channel null spaces —
    the live update path for multi-channel learnable generators
    (reference train.py:160-165 constrains ALL channels)."""
    from symmetry_ode_discovery_tpu.ops.constraint import get_Q_padded_jnp, m_weight_tensor

    L_scale = np.array([[2.0, 0.0], [0.0, 1.0]], dtype=np.float32)  # scaling2
    L_rot = np.array([[0.0, 1.0], [-1.0, 0.0]], dtype=np.float32)   # so(2)
    lib = FunctionLibrary(2, 2)
    W = jnp.asarray(m_weight_tensor(lib))

    Q1 = np.asarray(get_Q_padded_jnp(W, jnp.asarray(L_scale)))
    Q2 = np.asarray(get_Q_padded_jnp(W, jnp.stack([jnp.asarray(L_scale),
                                                   jnp.asarray(L_rot)])))
    # the host solver on the same stacked list is the ground truth
    Q_host, use_kron = get_Q(lib, [L_scale, L_rot])
    assert use_kron
    r1 = np.sum(np.linalg.norm(Q1, axis=0) > 1e-6)
    r2 = np.sum(np.linalg.norm(Q2, axis=0) > 1e-6)
    assert r2 == Q_host.shape[1] < r1  # stacking strictly tightens the space

    # every surviving column of the stacked Q satisfies BOTH constraints
    M_list = get_M_list(lib, [L_scale, L_rot])
    for col in Q2.T:
        if np.linalg.norm(col) < 1e-6:
            continue
        Xi = col.reshape(2, 6)
        for L, M in zip([L_scale, L_rot], M_list):
            np.testing.assert_allclose(L @ Xi, Xi @ M, atol=2e-3)


def test_Q_full_rank_constraint_keeps_all_of_V():
    """A constraint with NO null space (every singular value above the
    cutoff): the reference's V[:, -0:] slice returns ALL of V — it proceeds
    effectively unconstrained. Collapsing Q to zero columns would silently
    zero Xi. A random dense 'generator' makes the stacked constraint full
    rank with overwhelming probability. Any generator keeps an exact
    commutant null space (span{I, L} on the linear block), so the branch is
    forced with sv_cutoff=0: numerically-zero singulars sit at ~1e-16 > 0."""
    from symmetry_ode_discovery_tpu.ops.constraint import (get_Q_padded_jnp,
                                                           m_weight_tensor)

    lib = FunctionLibrary(2, poly_order=2)
    rng = np.random.default_rng(0)
    L = rng.standard_normal((2, 2)) * 3.0 + np.eye(2) * 5.0
    Q, _ = get_Q(lib, [L], sv_cutoff=0.0)
    n = 2 * lib.n_terms
    assert Q.shape == (n, n), Q.shape  # all of V, not (n, 0)

    W = jnp.asarray(m_weight_tensor(lib))
    Qp = np.asarray(get_Q_padded_jnp(W, jnp.asarray(L, jnp.float32),
                                     sv_cutoff=0.0))
    # no column zeroed: every column keeps unit norm
    np.testing.assert_allclose(np.linalg.norm(Qp, axis=0), 1.0, atol=1e-4)

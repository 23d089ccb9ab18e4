"""Fixed-shape masked least-squares primitives for sparse regression.

The reference prunes library columns by boolean indexing and calls
`torch.linalg.lstsq` on the shrunken system (reference sindy.py:266-290).
Data-dependent shapes do not compile on XLA, so instead we *zero* masked
columns and compute the minimum-norm least-squares solution: zero columns lie
in the null space, hence the min-norm solution is exactly zero there and the
unmasked coefficients equal the solution of the pruned system. Same numbers,
static shapes, fully jit/vmap-able over output dimensions and over seeds.

The solve itself is QR reduction (tall-skinny, one pass over the data,
MXU-friendly) followed by an SVD pseudo-inverse of the small triangular factor
(rank-revealing, matching lstsq min-norm semantics).
"""

from __future__ import annotations

import jax.numpy as jnp


def min_norm_lstsq(A: jnp.ndarray, b: jnp.ndarray, rcond: float | None = None) -> jnp.ndarray:
    """Minimum-norm least-squares solution of A x = b with static shapes.

    A: (m, n), b: (m,) or (m, k). Rank-deficient A (e.g. zeroed columns) is
    handled by singular-value cutoff, like numpy/torch lstsq.
    """
    q, r = jnp.linalg.qr(A)  # reduced: q (m, n), r (n, n)
    c = q.T @ b
    u, s, vt = jnp.linalg.svd(r, full_matrices=False)
    if rcond is None:
        rcond = jnp.finfo(A.dtype).eps * max(A.shape)
    cutoff = rcond * jnp.max(s)
    s_inv = jnp.where(s > cutoff, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    if b.ndim == 1:
        return vt.T @ (s_inv * (u.T @ c))
    return vt.T @ (s_inv[:, None] * (u.T @ c))


def ridge_augment(theta: jnp.ndarray, y: jnp.ndarray, gamma: float):
    """Stack the ridge rows [Theta; gamma*I], [y; 0] (reference sindy.py:262-264;
    note the reference uses gamma, not sqrt(gamma), so the effective penalty is
    gamma^2 ||w||^2)."""
    p = theta.shape[-1]
    eye = gamma * jnp.eye(p, dtype=theta.dtype)
    A = jnp.concatenate([theta, eye], axis=0)
    zeros = jnp.zeros((p,) + y.shape[1:], dtype=y.dtype)
    B = jnp.concatenate([y, zeros], axis=0)
    return A, B


def masked_lstsq_per_dim(A: jnp.ndarray, B: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Solve, for each output dim d, min ||A diag(mask[d]) w - B[:, d]||^2 with
    masked coefficients pinned to zero.

    A: (m, p); B: (m, d); mask: (d, p) in {0,1}. Returns Xi: (d, p).
    Equivalent to the reference's per-dim column-pruned lstsq (the block-diag
    construction at sindy.py:270-274 is separable across dims when
    unconstrained).
    """

    def solve_one(mask_d, b_d):
        return min_norm_lstsq(A * mask_d[None, :], b_d)

    import jax

    Xi = jax.vmap(solve_one, in_axes=(0, 1))(mask.astype(A.dtype), B)
    return Xi * mask.astype(A.dtype)

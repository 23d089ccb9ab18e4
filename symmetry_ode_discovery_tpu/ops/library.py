"""SINDy function basis library Theta(x), TPU-native.

Reproduces the exact term ordering of the reference implementation
(reference: sindy.py:7-30 `SINDyConst/Poly1/Poly2/Poly3/Sine/Exp`, assembled at
sindy.py:68-77) so that the ground-truth coefficient tables
(reference: evaluation/eval_eq.py:88-105) carry over unchanged:

    [const, z_0..z_{n-1},
     z_i*z_j (i<=j),            if poly_order > 1
     z_i*z_j*z_k (i<=j<=k),     if poly_order > 2
     sin(z_0)..sin(z_{n-1}),    if include_sine
     exp(z_0)..exp(z_{n-1})]    if include_exp

Instead of the reference's per-term Python loop of tensor slices, the
polynomial block is evaluated as three gathers and two multiplies over a
precomputed index table: each monomial of order <= 3 is the product of three
entries of the augmented vector [1, z_0..z_{n-1}]. This keeps evaluation a
single fused XLA op chain (no data-dependent shapes, fully vmappable), and
avoids `pow` with float exponents (NaN for negative bases on XLA).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def poly_index_table(dim: int, poly_order: int) -> np.ndarray:
    """Index table (n_poly_terms, 3) into the augmented vector [1, z_0..z_{n-1}].

    Index 0 means the constant 1; index i+1 means z_i. Ordering matches
    reference sindy.py:7-24 exactly (const, poly1, poly2 with i<=j, poly3 with
    i<=j<=k).
    """
    rows: List[Tuple[int, int, int]] = [(0, 0, 0)]  # constant term
    for i in range(dim):
        rows.append((i + 1, 0, 0))
    if poly_order > 1:
        for i in range(dim):
            for j in range(i, dim):
                rows.append((i + 1, j + 1, 0))
    if poly_order > 2:
        for i in range(dim):
            for j in range(i, dim):
                for k in range(j, dim):
                    rows.append((i + 1, j + 1, k + 1))
    return np.asarray(rows, dtype=np.int32)


def poly_exponent_table(dim: int, poly_order: int) -> np.ndarray:
    """Exponent matrix E (n_poly_terms, dim): term t = prod_d z_d ** E[t, d].

    Used by the closed-form equivariance-constraint math (ops/constraint.py),
    replacing the reference's sympy jacobian (reference: sindy.py:123-144).
    """
    idx = poly_index_table(dim, poly_order)
    E = np.zeros((idx.shape[0], dim), dtype=np.int32)
    for t, row in enumerate(idx):
        for a in row:
            if a > 0:
                E[t, a - 1] += 1
    return E


@dataclasses.dataclass(frozen=True)
class FunctionLibrary:
    """Static (hashable) description of the SINDy function basis.

    Mirrors the configuration surface of reference sindy.py:42-77: the
    constraint path disables sine/exp exactly as the reference does
    (sindy.py:47-48).
    """

    dim: int
    poly_order: int = 2
    include_sine: bool = False
    include_exp: bool = False

    @property
    def n_poly_terms(self) -> int:
        n = self.dim + 1
        if self.poly_order > 1:
            n += self.dim * (self.dim + 1) // 2
        if self.poly_order > 2:
            n += (self.dim ** 3 + 3 * self.dim ** 2 + 2 * self.dim) // 6
        return n

    @property
    def n_terms(self) -> int:
        """Total number of basis functions (reference sindy.py:179-189)."""
        n = self.n_poly_terms
        if self.include_sine:
            n += self.dim
        if self.include_exp:
            n += self.dim
        return n

    def index_table(self) -> np.ndarray:
        return poly_index_table(self.dim, self.poly_order)

    def exponent_table(self) -> np.ndarray:
        return poly_exponent_table(self.dim, self.poly_order)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Evaluate Theta(x): (..., dim) -> (..., n_terms)."""
        idx = jnp.asarray(self.index_table())
        ones = jnp.ones(x.shape[:-1] + (1,), dtype=x.dtype)
        aug = jnp.concatenate([ones, x], axis=-1)  # (..., dim+1)
        cols = aug[..., idx[:, 0]] * aug[..., idx[:, 1]] * aug[..., idx[:, 2]]
        blocks = [cols]
        if self.include_sine:
            blocks.append(jnp.sin(x))
        if self.include_exp:
            blocks.append(jnp.exp(x))
        return jnp.concatenate(blocks, axis=-1)

    def term_names(self, var: str = "z") -> List[str]:
        """Human-readable term names in library order (for equation printing,
        reference sindy.py:206-247)."""
        names = ["1"]
        d = self.dim
        for i in range(d):
            names.append(f"{var}{i}")
        if self.poly_order > 1:
            for i in range(d):
                for j in range(i, d):
                    names.append(f"{var}{i}*{var}{j}")
        if self.poly_order > 2:
            for i in range(d):
                for j in range(i, d):
                    for k in range(j, d):
                        names.append(f"{var}{i}*{var}{j}*{var}{k}")
        if self.include_sine:
            for i in range(d):
                names.append(f"sin({var}{i})")
        if self.include_exp:
            for i in range(d):
                names.append(f"exp({var}{i})")
        return names

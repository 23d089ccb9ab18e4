"""Lie-algebra primitives: so(n) basis and batched matrix exponential.

TPU-native counterparts of reference utils.py:16-24 (`so`) and
`torch.matrix_exp` (the hot op of LaLiGAN training, reference gan.py:296),
which maps to `jax.scipy.linalg.expm`, vmapped over the batch; XLA fuses the
Pade/scaling-squaring chain of small matmuls onto the MXU. Coefficient
sampling (reference gan.py:350-365, incl. the sigma-binding subtlety of
gan.py:286) lives solely in models/lie_generator.py::sample_coefficient —
the one source of truth for those semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def so(n: int) -> jnp.ndarray:
    """Basis of the so(n) Lie algebra: (n(n-1)/2, n, n) skew-symmetric matrices.

    Ordering matches reference utils.py:16-24: for each i, for each j < i,
    L[k, i, j] = 1, L[k, j, i] = -1.
    """
    L = np.zeros((n * (n - 1) // 2, n, n), dtype=np.float32)
    k = 0
    for i in range(n):
        for j in range(i):
            L[k, i, j] = 1.0
            L[k, j, i] = -1.0
            k += 1
    return jnp.asarray(L)


def expm2x2(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form exponential of 2x2 matrices, batched over leading axes.

    For M = aI + B with B traceless, B^2 = Delta I where
    Delta = b00^2 + b01 b10, so
        exp(M) = e^a (C(Delta) I + S(Delta) B)
    with C = cosh(sqrt(Delta)) / S = sinh(sqrt(Delta))/sqrt(Delta) for
    Delta >= 0 and the cos/sinc analogues for Delta < 0. Fully elementwise —
    replaces the generic Pade-and-squaring `expm` (a chain of matmuls and
    conds) for the 2x2 blocks that dominate LaLiGAN's group sampling
    (reference gan.py:296 torch.matrix_exp on (batch, 2, 2)).
    """
    a = 0.5 * (A[..., 0, 0] + A[..., 1, 1])
    b00 = A[..., 0, 0] - a
    b01 = A[..., 0, 1]
    b10 = A[..., 1, 0]
    delta = b00 * b00 + b01 * b10
    # Double-where so value AND gradient are finite at delta == 0 (sqrt is
    # non-differentiable there, and the untaken cosh/sinh branch would leak
    # NaN through a single where): evaluate the closed form only on
    # delta_safe, and use 2nd-order Taylor (C = 1 + d/2, S = 1 + d/6) on the
    # small branch. Threshold 1e-6 keeps the Taylor error ~d^2/24 < 1e-13
    # while avoiding the r*cosh(r)-sinh(r) f32 cancellation in dS/dd.
    small = jnp.abs(delta) < 1e-6
    delta_safe = jnp.where(small, 1.0, delta)
    r = jnp.sqrt(jnp.abs(delta_safe))
    pos = delta_safe >= 0
    C_big = jnp.where(pos, jnp.cosh(r), jnp.cos(r))
    S_big = jnp.where(pos, jnp.sinh(r), jnp.sin(r)) / r
    C = jnp.where(small, 1.0 + delta / 2.0, C_big)
    S = jnp.where(small, 1.0 + delta / 6.0, S_big)
    ea = jnp.exp(a)
    e00 = ea * (C + S * b00)
    e01 = ea * S * b01
    e10 = ea * S * b10
    e11 = ea * (C - S * b00)
    return jnp.stack([jnp.stack([e00, e01], -1), jnp.stack([e10, e11], -1)], -2)


def expm(A: jnp.ndarray) -> jnp.ndarray:
    """Matrix exponential, batched over all leading axes. 2x2 inputs use the
    closed form (expm2x2); larger matrices fall back to scipy's Pade."""
    if A.shape[-2:] == (2, 2):
        return expm2x2(A)
    if A.ndim == 2:
        return jax.scipy.linalg.expm(A)
    flat = A.reshape((-1,) + A.shape[-2:])
    out = jax.vmap(jax.scipy.linalg.expm)(flat)
    return out.reshape(A.shape)

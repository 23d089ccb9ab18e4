"""Lie-algebra primitives: so(n) basis, batched matrix exponential, coefficient
sampling.

TPU-native counterparts of reference utils.py:16-24 (`so`) and the sampling
machinery in reference gan.py:278-365. `torch.matrix_exp` (the hot op of
LaLiGAN training, reference gan.py:296) maps to `jax.scipy.linalg.expm`,
vmapped over the batch; XLA fuses the Pade/scaling-squaring chain of small
matmuls onto the MXU.
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


def expm(A: jnp.ndarray) -> jnp.ndarray:
    """Matrix exponential, batched over all leading axes."""
    if A.ndim == 2:
        return jax.scipy.linalg.expm(A)
    flat = A.reshape((-1,) + A.shape[-2:])
    out = jax.vmap(jax.scipy.linalg.expm)(flat)
    return out.reshape(A.shape)


def sample_coefficients(
    key: jax.Array,
    batch_size: int,
    n_channels: int,
    coef_dist: str,
    sigma: jnp.ndarray,
    uniform_max: float,
) -> jnp.ndarray:
    """Sample Lie-algebra coefficients z: (batch_size, n_channels).

    Mirrors reference gan.py:350-365: 'normal' draws N(0, I) @ sigma,
    'uniform' draws U(-uniform_max, uniform_max), 'uniform_int_grid' draws
    integers in [-uniform_max, uniform_max).
    """
    if coef_dist == "normal":
        z = jax.random.normal(key, (batch_size, n_channels)) @ sigma
    elif coef_dist == "uniform":
        z = jax.random.uniform(key, (batch_size, n_channels)) * 2 * uniform_max - uniform_max
    elif coef_dist == "uniform_int_grid":
        z = jax.random.randint(
            key, (batch_size, n_channels), -int(uniform_max), int(uniform_max)
        ).astype(jnp.float32)
    else:
        raise ValueError(f"Unknown coef_dist: {coef_dist}")
    return z

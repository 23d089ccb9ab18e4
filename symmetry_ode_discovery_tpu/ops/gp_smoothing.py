"""Gaussian-process smoothing / numerical differentiation of noisy trajectories.

TPU-native counterpart of reference data_utils/smoothing.py (GPPCA0 /
num_diff_gp, "obtained from D-CODE").

Mathematical simplification (exact, not an approximation): the reference always
instantiates GPPCA0 with r = n_trajectories (smoothing.py:180 `r = Y.shape[1]`),
so the factor-loading matrix A (all eigenvectors of G, smoothing.py:95-99) is
orthogonal and cancels in the posterior mean:

    X_hat = K(t_new, t) (K + sigma^2 I)^{-1} Y A A^T = K(t_new, t) (K + sigma^2 I)^{-1} Y.

Furthermore the per-dimension kernels are all scalar multiples of one unit
kernel: K_d = std_d^2 * K_unit and sigma_d = noise * std_d (smoothing.py:182-184),
so (K_d + sigma_d^2 I)^{-1} K_d = (K_unit + noise^2 I)^{-1} K_unit for every
dimension. The whole smoother is therefore ONE T x T Cholesky factorization +
two triangular solves, shared across dimensions — versus the reference's ~3
O(T^3) dense inverses PER dimension (smoothing.py:55,106,135,150). Identical
output, ~10x less work, and expressed as XLA-friendly batched linear algebra.

The derivative is the same forward difference of posterior means at t and
t + 1e-3 used by the reference (smoothing.py:185-194).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def rbf_kernel(t, sigma_out, sigma_in, t2=None):
    """RBF kernel matrix (reference smoothing.py:6-13)."""
    tc = t[:, None]
    tr = t if t2 is None else t2
    return sigma_out ** 2 * jnp.exp(-1.0 / (2 * sigma_in ** 2) * (tc - tr[None, :]) ** 2)


def gp_smooth_apply(t, Y, noise_level, sigma_in, dtype=jnp.float32):
    """Apply the GP smoother and its forward-difference derivative to the data
    matrix Y (T, r): returns (S @ Y, (S2 - S) @ Y / 1e-3) where
    S = K(t,t)(K+noise^2 I)^{-1} and S2 = K(t+1e-3,t)(K+noise^2 I)^{-1}.

    The dense (T, T) smoother is never formed: one Cholesky factorization of
    (K + noise^2 I), a narrow-RHS triangular solve against Y, and two matmuls
    (MXU-friendly). Crucially the derivative is computed through the
    *difference kernel* D = (K2 - K)/1e-3 applied to the shared solve result
    Z: subtracting two O(1) smoothed signals that differ at the 1e-3 level
    (the reference's formulation, smoothing.py:185-194) is catastrophic
    cancellation in float32, while D @ Z is exact to working precision — the
    solve error in Z cancels identically between the two terms.
    """
    t = t.astype(dtype)
    Y = Y.astype(dtype)
    K = rbf_kernel(t, 1.0, sigma_in)
    K2 = rbf_kernel(t + 1e-3, 1.0, sigma_in, t)
    D = (K2 - K) / 1e-3
    A = K + noise_level ** 2 * jnp.eye(t.shape[0], dtype=dtype)
    L = jnp.linalg.cholesky(A)
    Z = jax.scipy.linalg.solve_triangular(L, Y, lower=True)
    Z = jax.scipy.linalg.solve_triangular(L.T, Z, lower=False)
    return K @ Z, D @ Z


def _gp_smooth_apply_f64_host(t, Y, noise_level, sigma_in):
    """float64 host (numpy/scipy) variant of gp_smooth_apply. The kernel
    condition number is ~(1 + lambda_max/noise^2); at low noise levels (e.g.
    growth's 0.05 -> cond ~2.5e4) float32 Cholesky visibly corrupts the
    derivative, so the precision-critical path runs in f64 like the
    reference's numpy pipeline (smoothing.py uses np.linalg.inv in f64)."""
    import scipy.linalg as sla

    t = np.asarray(t, np.float64)
    Y = np.asarray(Y, np.float64)
    d2 = (t[:, None] - t[None, :]) ** 2
    K = np.exp(-d2 / (2 * sigma_in ** 2))
    K2 = np.exp(-((t + 1e-3)[:, None] - t[None, :]) ** 2 / (2 * sigma_in ** 2))
    D = (K2 - K) / 1e-3
    A = K + noise_level ** 2 * np.eye(t.shape[0])
    cf = sla.cho_factor(A, lower=True)
    Z = sla.cho_solve(cf, Y)
    return K @ Z, D @ Z


def num_diff_gp(x, dt, noise_level, std_base, sigma_in=None, engine="auto"):
    """GP-smooth x and differentiate numerically.

    Args:
        x: (seq_len, n_trajs, input_dim) noisy trajectories.
        dt: time step.
        noise_level: overall relative noise level.
        std_base: (input_dim,) per-dimension std (scales both signal and noise
            kernels; cancels in the smoother, kept for signature parity with
            reference smoothing.py:157-196).
        sigma_in: kernel length scale; defaults to dt as in the reference
            (smoothing.py:30-33).
        engine: 'f64' (host numpy, exact parity with the reference's f64
            pipeline), 'f32' (on-device, fast but requires noise_level large
            enough that cond ~ noise^-2 stays within f32), or 'auto'
            (f32 on device when noise_level >= 0.15, else f64 host).

    Returns:
        (dxdt, x_smooth), matching the reference's (dX, X_sample) return order
        (smoothing.py:157-196).
    """
    seq_len, n_trajs, input_dim = x.shape
    if sigma_in is None:
        sigma_in = dt
    if engine == "auto":
        engine = "f32" if noise_level >= 0.15 else "f64"

    Y = x.reshape(seq_len, n_trajs * input_dim)
    if engine == "f64":
        t = np.arange(seq_len) * dt
        Ys, Yd = _gp_smooth_apply_f64_host(t, np.asarray(Y), noise_level, sigma_in)
        Ys, Yd = jnp.asarray(Ys, jnp.float32), jnp.asarray(Yd, jnp.float32)
    else:
        t = jnp.arange(seq_len) * dt
        Ys, Yd = gp_smooth_apply(t, Y, noise_level, sigma_in, dtype=jnp.float32)
    x_smooth = Ys.reshape(seq_len, n_trajs, input_dim)
    dxdt = Yd.reshape(seq_len, n_trajs, input_dim)
    return dxdt.astype(jnp.float32), x_smooth.astype(jnp.float32)


def fit_sigma_in(Y, t, noise_sigma, sigma_out, sigma_in0):
    """Marginal-likelihood fit of the kernel length scale (reference
    smoothing.py:39-63, Powell). Host-side scipy; optional — the pipeline
    passes an explicit gp_sigma_in everywhere (data_utils/ode.py:44)."""
    from scipy.optimize import minimize

    Y = np.asarray(Y, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    tau = sigma_out ** 2 / noise_sigma ** 2
    n, r = Y.shape[0] * Y.shape[1], Y.shape[1]

    def loss(logx):
        s_in = float(np.exp(logx[0]))
        # numpy f64 kernel: the jnp rbf_kernel would round to f32 on device
        # (exactly the cond ~ noise^-2 regime this host path exists to avoid)
        # and pay a host<->device round trip per Powell evaluation
        d2 = (t[:, None] - t[None, :]) ** 2
        K = sigma_out ** 2 * np.exp(-d2 / (2 * s_in ** 2))
        W = np.linalg.inv(1.0 / tau * np.linalg.inv(K) + np.eye(K.shape[0]))
        b = Y.T  # A orthogonal => Y @ A has the same row space; S below is invariant
        S = np.abs(np.sum(Y ** 2) - np.sum(np.diag(b @ W @ b.T)))
        f2 = np.log(S) * (-1 * n / 2)
        f1 = -0.5 * r * np.linalg.slogdet(tau * K + np.eye(K.shape[0]))[1]
        return -1 * (f1 + f2)

    res = minimize(loss, x0=np.log(np.array([sigma_in0])), method="Powell")
    return float(np.exp(res["x"][0]))

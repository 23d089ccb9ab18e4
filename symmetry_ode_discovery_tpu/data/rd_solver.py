"""Native lambda-omega reaction-diffusion solver.

The reference loads a pre-computed `reaction_diffusion.mat` from the SINDy-AE
project (reference dataset.py:60-75; the .mat itself ships with neither repo).
This module regenerates the same physical system from scratch so the RD
pipeline is self-contained:

    u_t = (1 - A^2) u + beta A^2 v + d1 lap(u)
    v_t = -beta A^2 u + (1 - A^2) v + d2 lap(v),   A^2 = u^2 + v^2

with d1 = d2 = 0.1, beta = 1 on the periodic square [-10, 10]^2, spiral-wave
initial condition u = tanh(r) cos(theta - r), v = tanh(r) sin(theta - r) —
the exact setup of the SINDy-AE reaction-diffusion example whose output the
reference consumes. Sampling grid t = 0:0.05:10 matches ode_dt_dict['rd']
(reference dataset.py:161-167).

TPU-native: spectral (FFT) Laplacian, RK4 in real space, the whole rollout
one `lax.scan`; `duf` is the exact RHS at each sample (not a finite
difference). See PARITY.md "RD dataset provenance" for the quantitative
characterization against the published SINDy-AE statistics.
"""

from __future__ import annotations

import numpy as np

__all__ = ["simulate_rd", "generate_rd_mat"]


def _rhs(u, v, k2, d1, d2, beta):
    import jax.numpy as jnp

    A2 = u * u + v * v
    lap_u = jnp.real(jnp.fft.ifft2(-k2 * jnp.fft.fft2(u)))
    lap_v = jnp.real(jnp.fft.ifft2(-k2 * jnp.fft.fft2(v)))
    du = (1.0 - A2) * u + beta * A2 * v + d1 * lap_u
    dv = -beta * A2 * u + (1.0 - A2) * v + d2 * lap_v
    return du, dv


def simulate_rd(n=100, T=10.0, dt=0.05, L=20.0, d1=0.1, d2=0.1, beta=1.0,
                substeps=4):
    """Simulate lambda-omega RD; returns (t, x, y, uf, duf).

    uf, duf: (n, n, n_samples) float32, sampled every `dt` (duf is the exact
    RHS at the sample). `substeps` inner RK4 steps per sample keep the
    explicit scheme inside its stability region for the spectral Laplacian.
    """
    import jax
    import jax.numpy as jnp

    n_samples = int(round(T / dt)) + 1
    t = np.arange(n_samples) * dt
    x = np.linspace(-L / 2, L / 2, n, endpoint=False)
    y = x.copy()

    k = 2.0 * jnp.pi / L * jnp.fft.fftfreq(n, d=1.0 / n)
    k2 = k[:, None] ** 2 + k[None, :] ** 2

    X, Y = jnp.meshgrid(jnp.asarray(x), jnp.asarray(y), indexing="ij")
    r = jnp.sqrt(X ** 2 + Y ** 2)
    theta = jnp.arctan2(Y, X)
    u0 = jnp.tanh(r) * jnp.cos(theta - r)
    v0 = jnp.tanh(r) * jnp.sin(theta - r)

    h = dt / substeps

    def rk4(state, _):
        u, v = state
        du1, dv1 = _rhs(u, v, k2, d1, d2, beta)
        du2, dv2 = _rhs(u + 0.5 * h * du1, v + 0.5 * h * dv1, k2, d1, d2, beta)
        du3, dv3 = _rhs(u + 0.5 * h * du2, v + 0.5 * h * dv2, k2, d1, d2, beta)
        du4, dv4 = _rhs(u + h * du3, v + h * dv3, k2, d1, d2, beta)
        u = u + h / 6.0 * (du1 + 2 * du2 + 2 * du3 + du4)
        v = v + h / 6.0 * (dv1 + 2 * dv2 + 2 * dv3 + dv4)
        return (u, v), None

    def sample_step(state, _):
        u, v = state
        du, dv = _rhs(u, v, k2, d1, d2, beta)
        new_state, _ = jax.lax.scan(rk4, state, None, length=substeps)
        return new_state, (u, du)

    _, (uf, duf) = jax.lax.scan(sample_step, (u0, v0), None, length=n_samples)
    # (n_samples, n, n) -> (n, n, n_samples), the .mat layout
    uf = np.asarray(jnp.transpose(uf, (1, 2, 0)), np.float32)
    duf = np.asarray(jnp.transpose(duf, (1, 2, 0)), np.float32)
    return t, x, y, uf, duf


def generate_rd_mat(path, n=100, T=10.0, dt=0.05, **kwargs):
    """Write a reference-compatible reaction_diffusion.mat (keys t/x/y/uf/duf,
    the layout ReactionDiffusionDataset indexes, reference dataset.py:62-95)."""
    import scipy.io as sio

    t, x, y, uf, duf = simulate_rd(n=n, T=T, dt=dt, **kwargs)
    sio.savemat(path, {
        "t": t.reshape(-1, 1),
        "x": x.reshape(-1, 1),
        "y": y.reshape(-1, 1),
        "uf": uf,
        "duf": duf,
    })
    return path

"""ODE system library: right-hand sides, IC samplers, per-system protocol
defaults.

Counterpart of reference data_utils/{lotka,damped_oscillator,growth,selkov}.py.
The physics (vector fields, IC distributions, Hamiltonian window) must match
the reference bit-for-bit in form; the implementation is jax-native:
- rhs functions are pure jnp functions usable directly inside `lax.scan`
  integrators, `vmap`, and `grad`;
- IC samplers draw from the jax PRNG;
- the Lotka-Volterra Hamiltonian rejection loop (reference lotka.py:10-23,
  one while-loop per IC) is a single batched `lax.while_loop` that resamples
  all out-of-window rows at once.

Per-system generation defaults mirror the reference data CLIs
(lotka.py:47-55, damped_oscillator.py:29-41, growth.py:27-40,
selkov.py:28-37) and dataset.py:180-182 (train/val IC counts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["System", "SYSTEMS", "lv", "dosc", "growth", "selkov", "H_lv"]


# ---------------------------------------------------------------------------
# Vector fields (reference data_utils/*.py; the physics, must match exactly)
# ---------------------------------------------------------------------------

def lv(x, a=2.0 / 3.0, b=4.0 / 3.0, c=1.0, d=1.0):
    """Lotka-Volterra in canonical (log) coordinates (lotka.py:33-42)."""
    dx0 = a - b * jnp.exp(x[..., 1])
    dx1 = c * jnp.exp(x[..., 0]) - d
    return jnp.stack([dx0, dx1], axis=-1)


def dosc(x, a=0.1):
    """Damped harmonic oscillator (damped_oscillator.py:20-25)."""
    dx0 = -a * x[..., 0] - x[..., 1]
    dx1 = x[..., 0] - a * x[..., 1]
    return jnp.stack([dx0, dx1], axis=-1)


def growth(x, a=0.1, b=0.3):
    """Growth system (growth.py:18-23)."""
    dx0 = a * x[..., 1] ** 2 - b * x[..., 0]
    dx1 = x[..., 1]
    return jnp.stack([dx0, dx1], axis=-1)


def selkov(x, a=0.75, b=0.1, c=0.1):
    """Selkov glycolytic oscillator (selkov.py:18-23)."""
    dx0 = a - b * x[..., 0] - x[..., 0] * x[..., 1] ** 2
    dx1 = -x[..., 1] + c * x[..., 0] + x[..., 0] * x[..., 1] ** 2
    return jnp.stack([dx0, dx1], axis=-1)


def H_lv(x, a=2.0 / 3.0, b=4.0 / 3.0, c=1.0, d=1.0):
    """Lotka-Volterra Hamiltonian, canonical coordinates (lotka.py:26-31)."""
    return (c * jnp.exp(x[..., 0]) - d * x[..., 0]
            + b * jnp.exp(x[..., 1]) - a * x[..., 1])


# ---------------------------------------------------------------------------
# IC samplers (jax PRNG; distributions match the reference samplers)
# ---------------------------------------------------------------------------

def sample_ics_lv(key, n, h_min=3.0, h_max=4.5):
    """log(U(0,1)^2) restricted to H in [h_min, h_max] (lotka.py:10-23).

    The reference rejects per-IC in a Python while loop; here ALL rows are
    resampled together in one batched `lax.while_loop` — each iteration draws
    a fresh candidate for every still-invalid row.
    """

    def cond(state):
        _, _, ok = state
        return ~jnp.all(ok)

    def body(state):
        key, x0, ok = state
        key, sub = jax.random.split(key)
        cand = jnp.log(jax.random.uniform(sub, (n, 2), minval=1e-12, maxval=1.0))
        h = H_lv(cand)
        cand_ok = (h >= h_min) & (h <= h_max)
        x0 = jnp.where((~ok & cand_ok)[:, None], cand, x0)
        return key, x0, ok | cand_ok

    x0 = jnp.zeros((n, 2))
    _, x0, _ = jax.lax.while_loop(cond, body, (key, x0, jnp.zeros(n, bool)))
    return x0


def sample_ics_dosc(key, n, r_min=0.5, r_max=2.0):
    """Uniform radius in [0.5, 2], uniform angle (damped_oscillator.py:10-17)."""
    kr, kt = jax.random.split(key)
    r = jax.random.uniform(kr, (n,), minval=r_min, maxval=r_max)
    theta = jax.random.uniform(kt, (n,), minval=0.0, maxval=2.0 * jnp.pi)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_ics_growth(key, n):
    """U(0.2, 1)^2 (growth.py:10-15)."""
    return jax.random.uniform(key, (n, 2), minval=0.2, maxval=1.0)


def sample_ics_selkov(key, n):
    """U(0.5, 1)^2 (selkov.py:10-15)."""
    return jax.random.uniform(key, (n, 2), minval=0.5, maxval=1.0)


# ---------------------------------------------------------------------------
# System registry with per-system protocol defaults
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class System:
    """One ODE system: vector field + IC sampler + generation protocol.

    Defaults come from the reference per-system data CLIs; `default_dt`,
    `default_num_steps`, `default_subsample_rate` describe the RAW simulation
    (the effective sample spacing of cached datasets is
    dt * subsample_rate = dataset.ode_dt_dict[name]).
    """

    name: str
    f: Callable = field(repr=False)
    sample_ics: Callable = field(repr=False)
    dim: int = 2
    default_dt: float = 0.002
    default_num_steps: int = 10000
    default_subsample_rate: int = 1
    default_gp_sigma_in: float = 0.1
    default_n_train: int = 200
    default_n_val: int = 20
    multiplicative_noise: bool = False


SYSTEMS = {
    # lotka.py:47-55 (n_ics 200, steps 10000, dt 0.002) + dataset.py:180-182
    "lv": System("lv", lv, sample_ics_lv,
                 default_n_train=200, default_n_val=20),
    # damped_oscillator.py:29-41 (n_ics 50, steps 10000, subsample 100)
    "dosc": System("dosc", dosc, sample_ics_dosc,
                   default_subsample_rate=100,
                   default_n_train=50, default_n_val=5),
    # growth.py:27-44 (n_ics 100, steps 1000, subsample 10, sigma_in 0.05,
    # multiplicative noise)
    "growth": System("growth", growth, sample_ics_growth,
                     default_num_steps=1000, default_subsample_rate=10,
                     default_gp_sigma_in=0.05,
                     default_n_train=100, default_n_val=10,
                     multiplicative_noise=True),
    # selkov.py:28-37 (n_ics 10, steps 10000)
    "selkov": System("selkov", selkov, sample_ics_selkov,
                     default_n_train=10, default_n_val=2),
}

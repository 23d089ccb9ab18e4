"""LTP sweep evaluator: perfect coefficients track the trajectory, spoiled
coefficients don't, and diverged rollouts don't poison the summary."""

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.cli.eval_ltp_sweep import ltp_sweep_errors
from symmetry_ode_discovery_tpu.data.systems import SYSTEMS
from symmetry_ode_discovery_tpu.evaluation.eval_eq import sindy_truth
from symmetry_ode_discovery_tpu.models.sindy import make_config
from symmetry_ode_discovery_tpu.ops.integrators import solve_ode_batch


def test_ltp_truth_vs_spoiled():
    sys_ = SYSTEMS["dosc"]
    x0 = sys_.sample_ics(jax.random.PRNGKey(0), 4)
    dt = 0.05
    x, _ = solve_ode_batch(sys_.f, x0, dt=dt, num_steps=60)
    x = jnp.transpose(x, (1, 0, 2))  # (n_ics, n_steps, d)

    cfg, _ = make_config(2, poly_order=2)
    truth = sindy_truth["dosc"]
    spoiled = truth.copy()
    spoiled[0, 2] = -truth[0, 2]  # flip the oscillator coupling sign

    rel = np.asarray(ltp_sweep_errors(cfg, np.stack([truth, spoiled]), x, dt))
    assert rel.shape == (2, 4, x.shape[1] - 1)
    per_seed = np.nanmean(rel.reshape(2, -1), axis=1)
    # truth floor: only RK4-at-dt discretization error vs the generator
    assert per_seed[0] < 1e-4
    assert per_seed[1] > 100 * per_seed[0]


def test_ltp_divergent_seed_is_isolated():
    cfg, _ = make_config(2, poly_order=2, include_exp=True)
    # dx = 5*exp(x) in both dims: rollout overflows to inf/nan fast
    p = cfg.n_terms
    blowup = np.zeros((2, p))
    blowup[:, -2:] = 5.0
    x = jnp.ones((2, 30, 2)) * 0.1
    rel = np.asarray(ltp_sweep_errors(cfg, blowup[None], x, 0.1))
    assert not np.isfinite(np.nanmean(rel)) or np.nanmean(rel) > 1e6


def test_ltp_step_count_not_float_truncated():
    """(n_steps-1)*dt followed by int(t/dt) drops a step for many valid
    (dt, n_steps) pairs (e.g. int((43*0.2)/0.2) == 42) — the rollout must
    pass the step count explicitly or the error computation shape-crashes."""
    sys_ = SYSTEMS["dosc"]
    cfg, _ = make_config(2, poly_order=2)
    truth = sindy_truth["dosc"]
    for dt, steps in [(0.2, 44), (0.02, 60), (0.002, 2002)]:
        x0 = sys_.sample_ics(jax.random.PRNGKey(1), 2)
        x, _ = solve_ode_batch(sys_.f, x0, dt=dt, num_steps=steps)
        x = jnp.transpose(x, (1, 0, 2))
        rel = np.asarray(ltp_sweep_errors(cfg, truth[None], x, dt))
        assert rel.shape == (1, 2, steps - 1), (dt, steps, rel.shape)


def test_eval_ltp_accuracy_step_count():
    """Same truncation hazard in evaluation/eval_ltp.py's t_max = n*dt."""
    from symmetry_ode_discovery_tpu.evaluation.eval_ltp import eval_ltp_accuracy

    sys_ = SYSTEMS["dosc"]
    cfg, _ = make_config(2, poly_order=2)
    truth = jnp.asarray(sindy_truth["dosc"])
    x0 = sys_.sample_ics(jax.random.PRNGKey(2), 2)
    x, _ = solve_ode_batch(sys_.f, x0, dt=0.2, num_steps=44)
    x = jnp.transpose(x, (1, 0, 2))

    def fwd(q):
        return cfg.library(q) @ truth.T

    out = eval_ltp_accuracy(fwd, np.asarray(x), task="dosc", dt=0.2)
    assert out["error"].shape == (2, x.shape[1] - 1)

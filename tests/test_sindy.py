"""Integration tests: STLSQ and WSINDy recover exact equations on clean data,
including vmapped multi-seed solving."""

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.data.systems import SYSTEMS
from symmetry_ode_discovery_tpu.models.sindy import (
    init_sindy, make_config, solve_sindy, get_Xi, sindy_forward, set_threshold,
    equation_strings,
)
from symmetry_ode_discovery_tpu.models.wsindy import make_wsindy_matrices, solve_wsindy
from symmetry_ode_discovery_tpu.ops.integrators import solve_ode_batch
from symmetry_ode_discovery_tpu.evaluation.eval_eq import eval_sindy_coefficients, sindy_truth


def _dosc_data(n_ics=20, steps=200, dt=0.01, seed=0):
    sys = SYSTEMS["dosc"]
    key = jax.random.PRNGKey(seed)
    x0 = sys.sample_ics(key, n_ics)
    x, dx = solve_ode_batch(sys.f, x0, dt=dt, num_steps=steps)
    return x.reshape(-1, 2), dx.reshape(-1, 2)


def test_stlsq_recovers_dosc():
    x, dx = _dosc_data()
    cfg, _ = make_config(2, poly_order=2, threshold=5e-2)
    state = init_sindy(jax.random.PRNGKey(0), cfg)
    state, _ = solve_sindy(cfg, state, x, dx, w_sindy_reg=0.0, st_threshold=5e-2)
    res = eval_sindy_coefficients(np.asarray(get_Xi(cfg, state)), np.asarray(state.mask),
                                  sindy_truth["dosc"])
    assert res["correct_form_all"]
    assert res["mse_all"] < 1e-6


def test_stlsq_constrained_recovers_dosc():
    x, dx = _dosc_data()
    L = np.array([[0.0, 1.0], [-1.0, 0.0]])
    cfg, Q = make_config(2, poly_order=2, L_list=[L], threshold=1e-2)
    assert cfg.constraint
    state = init_sindy(jax.random.PRNGKey(0), cfg, Q)
    state, _ = solve_sindy(cfg, state, x, dx, w_sindy_reg=0.0, st_threshold=1e-2)
    res = eval_sindy_coefficients(np.asarray(get_Xi(cfg, state)), np.asarray(state.mask),
                                  sindy_truth["dosc"])
    assert res["correct_form_all"], equation_strings(cfg, state)
    assert res["mse_all"] < 1e-6


def test_stlsq_vmapped_over_seeds():
    """Seeds as a batch axis: different data subsets, one compiled solve."""
    x, dx = _dosc_data(n_ics=30, steps=200)
    n = x.shape[0]
    cfg, _ = make_config(2, poly_order=2, threshold=5e-2)

    def solve_one(key):
        idx = jax.random.choice(key, n, shape=(n // 2,), replace=False)
        st = init_sindy(key, cfg)
        st, _ = solve_sindy(cfg, st, x[idx], dx[idx], 0.0, 5e-2)
        return get_Xi(cfg, st), st.mask

    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    Xis, masks = jax.jit(jax.vmap(solve_one))(keys)
    assert Xis.shape == (8, 2, 6)
    for i in range(8):
        res = eval_sindy_coefficients(np.asarray(Xis[i]), np.asarray(masks[i]),
                                      sindy_truth["dosc"])
        assert res["correct_form_all"]


def test_wsindy_recovers_dosc():
    """Recovery with settings where the reference's left-Riemann weak-form
    quadrature is accurate (k_max small vs sampling rate)."""
    sys = SYSTEMS["dosc"]
    dt, steps = 0.01, 2000
    x0 = sys.sample_ics(jax.random.PRNGKey(3), 1)
    x, _ = solve_ode_batch(sys.f, x0, dt=dt, num_steps=steps)
    traj = x[:, 0]  # (T, 2)
    t = jnp.arange(steps) * dt
    cfg, _ = make_config(2, poly_order=2, threshold=5e-2)
    state = init_sindy(jax.random.PRNGKey(0), cfg)
    mats = make_wsindy_matrices(t, float(steps * dt), num_test_funcs=25)
    state, _ = solve_wsindy(cfg, state, mats, traj, w_sindy_reg=0.0, st_threshold=5e-2)
    res = eval_sindy_coefficients(np.asarray(get_Xi(cfg, state)), np.asarray(state.mask),
                                  sindy_truth["dosc"])
    assert res["correct_form_all"], equation_strings(cfg, state)
    assert res["mse_all"] < 1e-4


def test_wsindy_matches_reference_transcription():
    """Parity: one solve step equals a literal numpy transcription of
    reference WSINDyWrapper.solve (sindy.py:352-395)."""
    import math
    sys = SYSTEMS["dosc"]
    dt, steps, K = 0.01, 300, 20
    x0 = sys.sample_ics(jax.random.PRNGKey(5), 1)
    x, _ = solve_ode_batch(sys.f, x0, dt=dt, num_steps=steps)
    traj = np.asarray(x[:, 0], dtype=np.float64)
    t = np.arange(steps) * dt
    t_max = steps * dt
    cfg, _ = make_config(2, poly_order=2)
    state = init_sindy(jax.random.PRNGKey(0), cfg)
    mats = make_wsindy_matrices(jnp.arange(steps) * dt, t_max, num_test_funcs=K)
    from symmetry_ode_discovery_tpu.models.wsindy import wsindy_solve_step
    st, _, _ = wsindy_solve_step(cfg, state, mats, jnp.asarray(traj, jnp.float32), 0.0, 5e-2)

    # numpy transcription
    k = np.arange(1, K + 1)[:, None]
    V = dt * math.sqrt(2 / t_max) * np.sin(k * np.pi * t[None, :] / t_max)
    Vd = dt * math.sqrt(2 / t_max) * k * np.pi / t_max * np.cos(k * np.pi * t[None, :] / t_max)
    theta = np.concatenate([np.ones((steps, 1)), traj,
                            np.stack([traj[:, 0] ** 2, traj[:, 0] * traj[:, 1], traj[:, 1] ** 2], 1)], 1)
    G = V @ theta
    b = -Vd @ traj
    sol, *_ = np.linalg.lstsq(V.T @ G, V.T @ b, rcond=None)
    np.testing.assert_allclose(np.asarray(st.Xi), sol.T, rtol=1e-3, atol=1e-4)


def test_mask_monotone():
    cfg, _ = make_config(2, poly_order=2)
    state = init_sindy(jax.random.PRNGKey(0), cfg)
    s1 = set_threshold(cfg, state, 0.5)
    s2 = set_threshold(cfg, s1, 0.1)  # lower threshold cannot resurrect terms
    assert np.all(np.asarray(s2.mask) <= np.asarray(s1.mask))


def test_forward_shape_and_masking():
    cfg, _ = make_config(2, poly_order=2)
    state = init_sindy(jax.random.PRNGKey(0), cfg)
    state = state.replace(mask=jnp.zeros_like(state.mask))
    out = sindy_forward(cfg, state, jnp.ones((5, 2)))
    np.testing.assert_allclose(np.asarray(out), 0.0)

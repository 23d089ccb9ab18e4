"""Unit tests for Lie basis, integrators, GP smoothing, masked lstsq."""

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.ops.lie import so, expm
from symmetry_ode_discovery_tpu.ops.integrators import odeint, solve_ode_batch
from symmetry_ode_discovery_tpu.ops.linalg import masked_lstsq_per_dim, min_norm_lstsq, ridge_augment
from symmetry_ode_discovery_tpu.ops.gp_smoothing import num_diff_gp, rbf_kernel


def test_so_basis():
    # reference utils.py:16-24 ordering
    L = np.asarray(so(2))
    assert L.shape == (1, 2, 2)
    np.testing.assert_allclose(L[0], [[0, -1], [1, 0]])
    L3 = np.asarray(so(3))
    assert L3.shape == (3, 3, 3)
    for Li in L3:
        np.testing.assert_allclose(Li, -Li.T)


def test_expm_rotation():
    theta = 0.7
    L = jnp.array([[0.0, -1.0], [1.0, 0.0]])
    R = expm(theta * L)
    want = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    np.testing.assert_allclose(np.asarray(R), want, atol=1e-6)


def test_expm2x2_grad_finite_at_zero_delta():
    """Gradients must stay finite when the traceless part vanishes (pure
    scaling / zero generator), the post-thresholding states LaLiGAN reaches.
    torch.matrix_exp has finite grads there; sqrt(|delta|) must not leak NaN."""
    from symmetry_ode_discovery_tpu.ops.lie import expm2x2

    def loss(A):
        return jnp.sum(expm2x2(A) ** 2)

    for A in (jnp.zeros((2, 2)), jnp.diag(jnp.array([0.5, 0.5])),
              jnp.array([[0.3, -1.0], [1.0, 0.3]])):
        g = jax.grad(loss)(A)
        assert np.all(np.isfinite(np.asarray(g))), (A, g)
    # values still match the generic Pade path near the branch point
    A = jnp.array([[0.5, 1e-4], [1e-4, 0.5]])
    np.testing.assert_allclose(np.asarray(expm2x2(A)),
                               np.asarray(jax.scipy.linalg.expm(A)), atol=1e-6)


def test_odeint_dosc_closed_form():
    """Damped oscillator dz = [[-a, -1], [1, -a]] z has closed form
    e^{-a t} R(t) z0."""
    a = 0.1

    def f(x):
        return jnp.stack([-a * x[..., 0] - x[..., 1], x[..., 0] - a * x[..., 1]], axis=-1)

    x0 = jnp.array([1.0, 0.5])
    t, dt = 1.0, 0.001
    xT = odeint(f, x0, t, dt, method="rk4")
    R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    want = np.exp(-a * t) * R @ np.asarray(x0)
    np.testing.assert_allclose(np.asarray(xT), want, rtol=1e-5, atol=1e-6)


def test_odeint_full_traj_shape():
    f = lambda x: -x
    traj = odeint(f, jnp.ones((4, 2)), 0.1, 0.01, method="euler", full_traj=True)
    assert traj.shape == (10, 4, 2)


def test_solve_ode_batch_records_true_dx():
    def f(x):
        return -x

    x0 = jnp.array([[1.0, 2.0], [3.0, -1.0]])
    x, dx = solve_ode_batch(f, x0, dt=0.01, num_steps=5)
    assert x.shape == (5, 2, 2)
    np.testing.assert_allclose(np.asarray(dx), -np.asarray(x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(x0))


def test_min_norm_lstsq_vs_numpy():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((30, 6)).astype(np.float32)
    b = rng.standard_normal((30, 2)).astype(np.float32)
    got = np.asarray(min_norm_lstsq(jnp.asarray(A), jnp.asarray(b)))
    want, *_ = np.linalg.lstsq(A, b, rcond=None)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_min_norm_lstsq_zero_columns():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((30, 6)).astype(np.float32)
    A[:, 2] = 0.0
    A[:, 5] = 0.0
    b = rng.standard_normal((30,)).astype(np.float32)
    got = np.asarray(min_norm_lstsq(jnp.asarray(A), jnp.asarray(b)))
    assert abs(got[2]) < 1e-6 and abs(got[5]) < 1e-6
    want, *_ = np.linalg.lstsq(A[:, [0, 1, 3, 4]], b, rcond=None)
    np.testing.assert_allclose(got[[0, 1, 3, 4]], want, rtol=1e-4, atol=1e-4)


def test_masked_lstsq_per_dim_matches_pruned():
    rng = np.random.default_rng(3)
    theta = rng.standard_normal((50, 6)).astype(np.float32)
    y = rng.standard_normal((50, 2)).astype(np.float32)
    mask = np.ones((2, 6), np.float32)
    mask[0, [1, 4]] = 0
    mask[1, [0, 2, 5]] = 0
    A, B = ridge_augment(jnp.asarray(theta), jnp.asarray(y), 0.1)
    Xi = np.asarray(masked_lstsq_per_dim(A, B, jnp.asarray(mask)))
    for d in range(2):
        keep = mask[d].astype(bool)
        want, *_ = np.linalg.lstsq(np.asarray(A)[:, keep], np.asarray(B)[:, d], rcond=None)
        np.testing.assert_allclose(Xi[d, keep], want, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(Xi[d, ~keep], 0.0, atol=1e-7)


def test_gp_smoothing_matches_reference_formula():
    """Parity with the reference GPPCA0 posterior-mean computation
    (smoothing.py:86-91,125-137 with r=n_traj, where the factor loading A is
    orthogonal and cancels), plus a loose derivative sanity check."""
    T = 200
    dt = 0.05
    t = np.arange(T) * dt
    rng = np.random.default_rng(4)
    clean = np.stack([np.sin(t + ph) for ph in [0.0, 0.5, 1.0]], axis=1)[:, :, None]
    noise_level = 0.1
    x = clean + noise_level * rng.standard_normal(clean.shape)
    std_base = np.std(clean, axis=(0, 1))

    def rbf(tt, so, si, t2=None):
        tr = tt if t2 is None else t2
        return so ** 2 * np.exp(-1 / (2 * si ** 2) * (tt[:, None] - tr[None, :]) ** 2)

    std = std_base[0]
    sigma = noise_level * std
    K = rbf(t, std, 0.5)
    Kinv = np.linalg.inv(K + sigma ** 2 * np.eye(T))
    xs_ref = rbf(t, std, 0.5) @ Kinv @ x[:, :, 0]
    dx_ref = (rbf(t + 1e-3, std, 0.5, t) @ Kinv @ x[:, :, 0] - xs_ref) / 1e-3

    dx, xs = num_diff_gp(jnp.asarray(x, dtype=jnp.float32), dt, noise_level,
                         std_base, sigma_in=0.5)
    np.testing.assert_allclose(np.asarray(xs)[:, :, 0], xs_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx)[:, :, 0], dx_ref, atol=5e-2)

    want = np.stack([np.cos(t + ph) for ph in [0.0, 0.5, 1.0]], axis=1)
    err = np.abs(np.asarray(dx)[20:-20, :, 0] - want[20:-20]).mean()
    assert err < 0.25, err

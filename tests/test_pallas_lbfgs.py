"""Tests for the fused Pallas L-BFGS discovery kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.data.systems import SYSTEMS
from symmetry_ode_discovery_tpu.models.sindy import make_config
from symmetry_ode_discovery_tpu.ops.integrators import solve_ode_batch
from symmetry_ode_discovery_tpu.ops.library import FunctionLibrary
from symmetry_ode_discovery_tpu.ops.pallas_lbfgs import PLBFGSConfig, pallas_lbfgs_sweep
from symmetry_ode_discovery_tpu.training.siged import LBFGSHParams
from symmetry_ode_discovery_tpu.training.sweep import _pallas_lbfgs_sweep
from symmetry_ode_discovery_tpu.evaluation import sindy_truth


def _dosc(n_ics=20, steps=200, dt=0.01):
    sys = SYSTEMS["dosc"]
    x0 = sys.sample_ics(jax.random.PRNGKey(0), n_ics)
    x, dx = solve_ode_batch(sys.f, x0, dt=dt, num_steps=steps)
    return x.reshape(-1, 2), dx.reshape(-1, 2)


def test_kernel_recovers_dosc_unconstrained():
    xf, dxf = _dosc()
    lib = FunctionLibrary(2, 2)
    theta = lib(xf)
    S = (theta.T @ theta)[None]
    B = (theta.T @ dxf).T[None]
    q = jnp.asarray([float(jnp.sum(dxf ** 2))])
    ne = jnp.asarray([float(dxf.size)])
    cfg = PLBFGSConfig(d=2, p=6, n_params=12, num_epochs=30, lr=1.0,
                       reg_l1=False, st_freq=30, threshold=5e-2)
    th0 = jax.random.normal(jax.random.PRNGKey(3), (1, 12))
    th, mask, stop = pallas_lbfgs_sweep(cfg, S, B, q, ne, th0, interpret=True)
    Xi = np.asarray(th).reshape(2, 6) * np.asarray(mask)[0]
    truth = sindy_truth["dosc"]
    np.testing.assert_allclose(Xi, truth, atol=1e-3)
    assert int(stop[0]) < 30  # converged early via double-convergence


def test_kernel_sweep_constrained_dosc():
    """Constrained (so2) path through the Mmap wiring, multi-seed."""
    xf, dxf = _dosc(n_ics=30)
    L = np.array([[0.0, 1.0], [-1.0, 0.0]])
    cfg, Q = make_config(2, poly_order=2, L_list=[L], threshold=1e-2)
    hp = LBFGSHParams(num_epochs=30, lr_sindy=1.0, w_sindy_reg=0.0,
                      sindy_reg_type="none", st_freq=30, threshold=1e-2)
    res = _pallas_lbfgs_sweep(cfg, Q, xf, dxf, sindy_truth["dosc"], hp,
                              np.arange(4), k=xf.shape[0] // 2, interpret=True)
    assert res.correct_form.all(), res.Xi
    assert (res.mse < 1e-5).all()


def test_kernel_matches_optax_masks():
    """Both backends should reach the same support on clean data."""
    from symmetry_ode_discovery_tpu.training.sweep import sweep_sindy_lbfgs

    xf, dxf = _dosc()
    cfg, _ = make_config(2, poly_order=2)
    hp = LBFGSHParams(num_epochs=20, lr_sindy=1.0, sindy_reg_type="none",
                      st_freq=20, threshold=5e-2)
    res_opt = sweep_sindy_lbfgs(cfg, None, xf, dxf, sindy_truth["dosc"], hp,
                                np.arange(2), lbfgs_subsample=0.5,
                                backend="optax", n_mesh_devices=1)
    res_pal = _pallas_lbfgs_sweep(cfg, None, xf, dxf, sindy_truth["dosc"], hp,
                                  np.arange(2), k=xf.shape[0] // 2, interpret=True)
    np.testing.assert_array_equal(res_opt.mask, res_pal.mask.reshape(res_opt.mask.shape))
    np.testing.assert_allclose(res_opt.Xi, res_pal.Xi, atol=1e-3)


def test_kernel_constrained_const_growth():
    """constrain_constant path: theta = [beta, const] are separate parameter
    groups, so the kernel's convergence delta must SUM the two norms
    (n_beta split) like the reference's per-Parameter sum. Exercises the
    growth scaling2 protocol end-to-end in interpret mode."""
    from symmetry_ode_discovery_tpu.data.systems import SYSTEMS
    from symmetry_ode_discovery_tpu.ops.integrators import solve_ode_batch

    sys_ = SYSTEMS["growth"]
    x0 = sys_.sample_ics(jax.random.PRNGKey(0), 30)
    x, dx = solve_ode_batch(sys_.f, x0, dt=0.02, num_steps=80)
    xf = jnp.transpose(x, (1, 0, 2)).reshape(-1, 2)
    dxf = jnp.transpose(dx, (1, 0, 2)).reshape(-1, 2)
    L = np.array([[2.0, 0.0], [0.0, 1.0]])
    cfg, Q = make_config(2, poly_order=2, L_list=[L], constrain_constant=True,
                         threshold=5e-2)
    hp = LBFGSHParams(num_epochs=40, lr_sindy=1.0, w_sindy_reg=0.0,
                      sindy_reg_type="none", st_freq=40, threshold=5e-2)
    res = _pallas_lbfgs_sweep(cfg, Q, xf, dxf, sindy_truth["growth"], hp,
                              np.arange(4), k=xf.shape[0] // 2, interpret=True)
    assert res.correct_form.all(), res.Xi
    assert (res.mse < 1e-4).all()

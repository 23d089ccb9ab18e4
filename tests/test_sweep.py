"""Sweep driver tests: vmapped and mesh-sharded multi-seed discovery."""

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.data.systems import SYSTEMS
from symmetry_ode_discovery_tpu.models.sindy import make_config
from symmetry_ode_discovery_tpu.ops.integrators import solve_ode_batch
from symmetry_ode_discovery_tpu.training.siged import LBFGSHParams
from symmetry_ode_discovery_tpu.training.sweep import (
    sweep_sindy_lbfgs, sweep_sindy_stlsq, sweep_wsindy, eval_coefficients_jnp,
)
from symmetry_ode_discovery_tpu.evaluation import sindy_truth, aggregate_results


def _dosc(n_ics=20, steps=200, dt=0.01):
    sys = SYSTEMS["dosc"]
    x0 = sys.sample_ics(jax.random.PRNGKey(0), n_ics)
    x, dx = solve_ode_batch(sys.f, x0, dt=dt, num_steps=steps)
    return x, dx


def test_eval_coefficients_jnp_matches_numpy():
    from symmetry_ode_discovery_tpu.evaluation.eval_eq import eval_sindy_coefficients

    rng = np.random.default_rng(0)
    coef = rng.standard_normal((2, 6)).astype(np.float32)
    mask = (rng.random((2, 6)) > 0.5).astype(np.float32)
    truth = sindy_truth["dosc"]
    cf, mse = eval_coefficients_jnp(jnp.asarray(coef), jnp.asarray(mask), jnp.asarray(truth))
    ref = eval_sindy_coefficients(coef, mask, truth)
    np.testing.assert_allclose(np.asarray(cf), ref["correct_form"])
    np.testing.assert_allclose(np.asarray(mse), ref["mse"], rtol=1e-5)


def test_stlsq_sweep_sharded_8dev():
    assert len(jax.devices()) == 8
    x, dx = _dosc()
    xf, dxf = x.reshape(-1, 2), dx.reshape(-1, 2)
    cfg, _ = make_config(2, poly_order=2)
    res = sweep_sindy_stlsq(cfg, None, xf, dxf, sindy_truth["dosc"],
                            seeds=np.arange(8), threshold=5e-2, subsample=0.5)
    assert res.correct_form.shape == (8, 2)
    assert res.correct_form.all(), res.Xi
    summary = aggregate_results(results_list=res.results_list(), verbose=False)
    assert summary["success_joint"] == 8


def test_lbfgs_sweep_vmapped():
    x, dx = _dosc()
    xf, dxf = x.reshape(-1, 2), dx.reshape(-1, 2)
    cfg, _ = make_config(2, poly_order=2)
    hp = LBFGSHParams(num_epochs=20, lr_sindy=1.0, sindy_reg_type="none",
                      st_freq=20, threshold=5e-2)
    res = sweep_sindy_lbfgs(cfg, None, xf, dxf, sindy_truth["dosc"], hp,
                            seeds=np.arange(4), lbfgs_subsample=0.5, n_mesh_devices=1)
    assert res.correct_form.all()
    assert (res.mse < 1e-4).all()


def test_wsindy_sweep():
    x, _ = _dosc(n_ics=8, steps=2000, dt=0.01)
    x = jnp.transpose(x, (1, 0, 2))  # (n_ics, n_steps, dim)
    cfg, _ = make_config(2, poly_order=2)
    res = sweep_wsindy(cfg, x, 0.01, sindy_truth["dosc"], seeds=np.arange(8),
                       threshold=5e-2, num_test_funcs=25)
    # all seeds should recover the form on clean data
    assert res.correct_form.all(), res.Xi

"""Golden statistical tier (SURVEY.md §4): seed-pinned noisy-protocol sweeps
whose success rates must not regress.

These are scaled-down (CPU-budget) versions of the full 50-seed protocols —
fewer ICs and 8 seeds — with thresholds set from observed margins:
  - growth noise05 EquivSINDy-c: full protocol is 50/50 (RESULTS.md, matches
    the reference notebook); the 8-seed reduced run must stay >= 7/8.
  - dosc noise20 EquivSINDy-c: full protocol is 32/50; the reduced run must
    stay >= 4/8.

The full-scale 50-seed growth invariant (must stay 50/50, CLAUDE.md) runs
only when SYMODE_GOLDEN_FULL=1 (TPU budget; bench.py also exercises it).
"""

import os

import jax
import numpy as np
import pytest

from symmetry_ode_discovery_tpu.data.generate import gen_data
from symmetry_ode_discovery_tpu.data.systems import SYSTEMS
from symmetry_ode_discovery_tpu.evaluation import sindy_truth
from symmetry_ode_discovery_tpu.models.sindy import make_config
from symmetry_ode_discovery_tpu.training.siged import LBFGSHParams
from symmetry_ode_discovery_tpu.training.sweep import sweep_sindy_lbfgs


def _noisy_flat(name, n_ics, noise, key=0):
    sys_ = SYSTEMS[name]
    x, dx = gen_data(sys_, jax.random.PRNGKey(key), n_ics=n_ics,
                     dt=sys_.default_dt, num_steps=sys_.default_num_steps,
                     subsample_rate=sys_.default_subsample_rate,
                     noise=noise, multiplicative_noise=sys_.multiplicative_noise,
                     smoothing="gp", gp_sigma_in=sys_.default_gp_sigma_in)
    d = x.shape[-1]
    return x.reshape(-1, d), dx.reshape(-1, d)


def test_golden_growth_esindy_8seed():
    """growth/noise05_esindy.cfg protocol, 20 ICs, 8 seeds: >= 7/8 joint."""
    x, dx = _noisy_flat("growth", n_ics=20, noise=0.05)
    L = np.array([[2.0, 0.0], [0.0, 1.0]], dtype=np.float32)  # scaling2
    cfg, Q = make_config(2, poly_order=2, L_list=[L],
                         constrain_constant=True, threshold=5e-2)
    hp = LBFGSHParams(num_epochs=100, lr_sindy=1.0, sindy_reg_type="l1",
                      w_sindy_reg=0.0, st_freq=100, threshold=5e-2)
    res = sweep_sindy_lbfgs(cfg, Q, x, dx, sindy_truth["growth"], hp,
                            seeds=np.arange(8), lbfgs_subsample=0.5,
                            backend="optax")
    joint = np.all(res.correct_form > 0, axis=1)
    assert joint.sum() >= 7, (joint, res.Xi * res.mask)
    ok_rmse = np.sqrt(res.mse[joint].mean())
    assert ok_rmse < 0.1, ok_rmse


def test_golden_dosc_esindy_8seed():
    """dosc/noise20_esindy.cfg protocol, full 50 ICs, 8 seeds: >= 4/8 joint.

    (At 20 ICs a spurious ~0.02 constant term survives the 1e-2 threshold on
    every seed; the protocol's 50 ICs are needed for the statistics.)"""
    x, dx = _noisy_flat("dosc", n_ics=50, noise=0.2)
    L = np.array([[0.0, 1.0], [-1.0, 0.0]], dtype=np.float32)  # so(2)
    cfg, Q = make_config(2, poly_order=2, L_list=[L], threshold=1e-2)
    hp = LBFGSHParams(num_epochs=100, lr_sindy=1.0, sindy_reg_type="l1",
                      w_sindy_reg=0.0, st_freq=100, threshold=1e-2)
    res = sweep_sindy_lbfgs(cfg, Q, x, dx, sindy_truth["dosc"], hp,
                            seeds=np.arange(8), lbfgs_subsample=0.5,
                            backend="optax")
    joint = np.all(res.correct_form > 0, axis=1)
    assert joint.sum() >= 4, (joint, res.Xi * res.mask)


@pytest.mark.skipif(os.environ.get("SYMODE_GOLDEN_FULL") != "1",
                    reason="full 50-seed invariant; set SYMODE_GOLDEN_FULL=1")
def test_golden_growth_esindy_full_50seed():
    """CLAUDE.md invariant: the full growth esindy protocol must stay 50/50."""
    from symmetry_ode_discovery_tpu.data.datasets import ODEDataset

    ds = ODEDataset.make("growth", "train", noise=0.05, smoothing="gp")
    L = np.array([[2.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    cfg, Q = make_config(2, poly_order=2, L_list=[L],
                         constrain_constant=True, threshold=5e-2)
    hp = LBFGSHParams(num_epochs=100, lr_sindy=1.0, sindy_reg_type="l1",
                      w_sindy_reg=0.0, st_freq=100, threshold=5e-2)
    res = sweep_sindy_lbfgs(cfg, Q, ds.x, ds.dx, sindy_truth["growth"], hp,
                            seeds=np.arange(50), lbfgs_subsample=0.5)
    joint = np.all(res.correct_form > 0, axis=1)
    assert joint.sum() == 50, joint

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


# ---------------------------------------------------------------------------
# Golden GP tier (VERDICT r3 item 6): seed-pinned reduced GP sweeps with
# success-rate floors. The full-protocol numbers these guard (RESULTS.md,
# tracked eval_results npzs): plain LV noise99 25/100 joint; EquivGP-r
# 38/100. At CPU-test budgets (pop ~200, 12-18 generations vs the
# protocol's pop 1024 x 40) the symmetry term's ADVANTAGE does not
# materialize — it emerges at full budget and high noise — so each path
# guards its own calibrated band rather than symm >= plain; the symm >= plain
# ordering itself is evidenced by the tracked 100-seed sweeps. Both legs are
# deterministic on CPU (seeded C++ breeding core), so the floors only move
# if numerics change — exactly what they're meant to catch.
# ---------------------------------------------------------------------------

_REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def lv_noise04_flat():
    """Shared reduced LV dataset for both GP legs: 6 ICs at noise 0.4."""
    return _noisy_flat("lv", n_ics=6, noise=0.4)


def _gp_eval_counts(per_seed, task="lv"):
    from symmetry_ode_discovery_tpu.symgp.eval_gp import eval_gp_equations
    from symmetry_ode_discovery_tpu.symgp.tape import tape_to_string

    cf = []
    for best in per_seed:
        eqs = [tape_to_string(*b) for b in best]
        cf.append(eval_gp_equations(eqs, task, threshold=0.05)["correct_form"])
    cf = np.stack(cf)
    return (int(np.all(cf > 0, axis=1).sum()),
            int((cf[:, 0] > 0).sum()), int((cf[:, 1] > 0).sum()))


def _subsample_per_seed(x, dx, seeds, rows):
    xs, dxs = [], []
    for s in seeds:
        idx = np.random.default_rng(s).choice(len(x), rows, replace=False)
        xs.append(x[idx]); dxs.append(dx[idx])
    return np.stack(xs), np.stack(dxs)


def test_golden_gp_plain_lv_6seed(lv_noise04_flat):
    """Reduced plain-GP LV sweep (pop 192, 12 gens, 384 rows): calibrated
    joint 2/6, eq0 3, eq1 2 — floors one success below."""
    from symmetry_ode_discovery_tpu.cli.main_gp import _task_spec
    from symmetry_ode_discovery_tpu.symgp.evolve import GPConfig
    from symmetry_ode_discovery_tpu.symgp.sweep import gp_sweep_plain

    x, dx = lv_noise04_flat
    seeds = list(range(6))
    X, dX = _subsample_per_seed(np.asarray(x), np.asarray(dx), seeds, 384)
    cfg = GPConfig(pop_size=192, n_generations=12, seed=0)
    per_seed, _ = gp_sweep_plain(X, dX, _task_spec("lv", 2), cfg, seeds)
    joint, eq0, eq1 = _gp_eval_counts(per_seed)
    assert joint >= 1 and eq0 >= 2 and eq1 >= 1, (joint, eq0, eq1)


def test_golden_gp_symm_lv_6seed(lv_noise04_flat):
    """Reduced EquivGP-r LV sweep (pop 256, 18 gens) through the tracked
    laligan-noise99-lv checkpoint: calibrated joint 1/6, eq0 2, eq1 1 —
    floor is >= 2 correct equations in total, >= 1 on eq0."""
    import jax.numpy as jnp

    from symmetry_ode_discovery_tpu.cli.main import build_models
    from symmetry_ode_discovery_tpu.cli.main_gp import _task_spec
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.symgp.evolve import GPConfig
    from symmetry_ode_discovery_tpu.symgp.sweep import gp_sweep_system
    from symmetry_ode_discovery_tpu.training.symmreg import (
        make_precompute_symmreg_r)
    from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt
    from symmetry_ode_discovery_tpu.utils.config import get_args

    args = vars(get_args(
        ["--config", os.path.join(_REPO, "run_configs/lv/noise99_eq_gp_symm.cfg")]))
    args["input_dim"] = 2  # raw LV states (main_gp uses no mt windowing)
    ae_def, gspec, _ = build_models(args)
    k = jax.random.PRNGKey(0)
    ae_params, ae_bstats = ae_def.init(k)
    g_state = lg.init_generator(k, gspec)
    bundle = {"ae": ae_params, "d": {}, "g": g_state}
    bundle, ae_bstats = ckpt.load_laligan(
        args["load_laligan"], bundle, ae_bstats,
        root=os.path.join(_REPO, "saved_models"))
    pre = make_precompute_symmreg_r(ae_def, bundle["ae"], ae_bstats, gspec,
                                    bundle["g"])

    x, dx = lv_noise04_flat
    seeds = list(range(6))
    X, dX = _subsample_per_seed(np.asarray(x), np.asarray(dx), seeds, 384)
    gxs, Jgs = [], []
    for s in range(len(seeds)):
        gx_list, Jgx_list = pre(jnp.asarray(X[s]))
        gxs.append(np.stack([np.asarray(g) for g in gx_list]))
        Jgs.append(np.stack([np.asarray(J) for J in Jgx_list]))
    cfg = GPConfig(pop_size=256, n_generations=18, seed=0)
    per_seed, _ = gp_sweep_system(X, dX, _task_spec("lv", 2), cfg, seeds,
                                  gx_all=np.stack(gxs), Jgx_all=np.stack(Jgs),
                                  w_sym_reg=args["w_sym_reg"])
    joint, eq0, eq1 = _gp_eval_counts(per_seed)
    assert eq0 + eq1 >= 2 and eq0 >= 1, (joint, eq0, eq1)


# ---------------------------------------------------------------------------
# Full-budget GP goldens (round-5 verdict item 6): the REAL protocol (pop
# 1024 x 40 generations, pysr_subsample 0.005) on the first 20 seeds of the
# tracked 100-seed LV noise99 sweeps. Floors are the exact first-20 counts
# from the tracked npzs (plain 4/20 seeds {7,8,14,18}; EquivGP-r 6/20 seeds
# {4,6,13,14,15,16}) — the sweeps are deterministic per backend, so a
# one-seed regression trips them. TPU-only: run with
#   SYMODE_GOLDEN_FULL=1 SYMODE_TEST_TPU=1 python -m pytest tests/test_golden.py -k gp_full
# ---------------------------------------------------------------------------


def _gp_full_cli(config, save_dir, n_seeds=20):
    import shutil

    from symmetry_ode_discovery_tpu.cli import main_gp

    shutil.rmtree(os.path.join("eval_results", save_dir), ignore_errors=True)
    main_gp.main(["--config", config, "--seed", "0",
                  "--n_seeds", str(n_seeds), "--save_dir", save_dir])
    cf = []
    for s in range(n_seeds):
        with np.load(f"eval_results/{save_dir}/seed{s}.npz") as z:
            cf.append(np.all(z["correct_form"] > 0))
    return np.asarray(cf)


_full_gp = pytest.mark.skipif(
    os.environ.get("SYMODE_GOLDEN_FULL") != "1"
    or jax.default_backend() == "cpu",
    reason="full-protocol GP golden: set SYMODE_GOLDEN_FULL=1 and "
           "SYMODE_TEST_TPU=1 (floors calibrated on TPU)")


@_full_gp
def test_golden_gp_full_plain_lv_20seed():
    cf = _gp_full_cli("lv/noise99_eq_gp.cfg", "golden-gp-plain")
    assert cf.sum() >= 4, np.nonzero(cf)[0].tolist()


@_full_gp
def test_golden_gp_full_symm_lv_20seed():
    cf_symm = _gp_full_cli("lv/noise99_eq_gp_symm.cfg", "golden-gp-symm")
    assert cf_symm.sum() >= 6, np.nonzero(cf_symm)[0].tolist()
    # the paper's core claim at protocol budget: symmetry lifts the rate
    # (tracked 100-seed sweeps: 38 vs 25; first-20: 6 vs 4)
    assert cf_symm.sum() >= 4 + 2

"""CLI entry-point smoke tests (tiny cached datasets, CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_dosc_cache(tmp_path_factory):
    """Write a tiny clean dosc dataset into an ISOLATED cache dir and point
    the datasets module at it for the duration of the module, so test
    fixtures can never shadow real experiment caches (the tiny 4-IC dt=0.05
    file previously masqueraded as the real clean-dosc dataset)."""
    from symmetry_ode_discovery_tpu.data import datasets as dsmod
    from symmetry_ode_discovery_tpu.data.systems import SYSTEMS
    from symmetry_ode_discovery_tpu.ops.integrators import solve_ode_batch

    path = str(tmp_path_factory.mktemp("tiny_dosc_cache"))
    # Run the whole module from a scratch cwd so relative artifact dirs
    # (eval_results/, saved_models/, runs/) never touch the repo's committed
    # sweep evidence.
    workdir = tmp_path_factory.mktemp("cli_workdir")
    old_cwd = os.getcwd()
    os.chdir(workdir)
    sys_ = SYSTEMS["dosc"]
    for mode, n in [("train", 20), ("val", 4)]:
        x0 = sys_.sample_ics(jax.random.PRNGKey(0 if mode == "train" else 1), n)
        x, dx = solve_ode_batch(sys_.f, x0, dt=0.05, num_steps=40)
        np.save(f"{path}/dosc-{mode}-noise00-x.npy",
                np.asarray(jnp.transpose(x, (1, 0, 2)), np.float32))
        np.save(f"{path}/dosc-{mode}-noise00-dx.npy",
                np.asarray(jnp.transpose(dx, (1, 0, 2)), np.float32))
    orig = dsmod.DATA_PATH
    dsmod.DATA_PATH = path
    yield path
    dsmod.DATA_PATH = orig
    os.chdir(old_cwd)


def _args(extra):
    from symmetry_ode_discovery_tpu.utils.config import get_args

    base = ["--task", "dosc", "--noise", "0.0", "--poly_order", "2",
            "--save_dir", "cli-smoke", "--num_epochs", "10"]
    return vars(get_args(base + extra))


def test_cli_main_sindy_lbfgs(tiny_dosc_cache):
    from symmetry_ode_discovery_tpu.cli import main as m

    res = m.run(_args(["--sindy_optimizer", "lbfgs", "--lr_sindy", "1.0",
                       "--w_sindy_reg", "0.0", "--sindy_reg_type", "none",
                       "--threshold", "5e-2", "--st_freq", "10"]))
    assert res["correct_form"].all()


def test_cli_main_multiseed(tiny_dosc_cache):
    from symmetry_ode_discovery_tpu.cli import main as m

    res = m.run(_args(["--sindy_optimizer", "lbfgs", "--lr_sindy", "1.0",
                       "--w_sindy_reg", "0.0", "--sindy_reg_type", "none",
                       "--threshold", "5e-2", "--st_freq", "10",
                       "--n_seeds", "3"]))
    assert res["Xi"].shape[0] == 3


def test_cli_main_wsindy(tiny_dosc_cache):
    from symmetry_ode_discovery_tpu.cli import main_wsindy as mw

    res = mw.run(_args(["--threshold", "5e-2", "--w_sindy_reg", "0.0"]))
    assert "results" in res


def test_cli_main_sindy_direct(tiny_dosc_cache):
    from symmetry_ode_discovery_tpu.cli import main_sindy as ms

    res = ms.run(_args(["--threshold", "5e-2", "--w_sindy_reg", "0.0"]))
    assert res["results"][0]["correct_form"].all()


def test_cli_esindy_constrained(tiny_dosc_cache):
    from symmetry_ode_discovery_tpu.cli import main as m

    res = m.run(_args(["--sindy_optimizer", "lbfgs", "--lr_sindy", "1.0",
                       "--w_sindy_reg", "0.0", "--sindy_reg_type", "none",
                       "--threshold", "1e-2", "--st_freq", "10",
                       "--eq_constraint", "--repr", "(1,so2)",
                       "--ae_arch", "none", "--latent_dim", "2"]))
    assert res["correct_form"].all()


def test_cli_symreg_sweep_host_stepped(tiny_dosc_cache):
    """The symmetry-regularized multi-seed path: host-stepped epochs with the
    all-done early exit must produce per-seed results (shape + eval npz)."""
    from symmetry_ode_discovery_tpu.cli import main as m

    res = m.run(_args([
        "--sindy_optimizer", "lbfgs", "--lr_sindy", "1.0",
        "--w_sindy_reg", "0.0", "--sindy_reg_type", "none",
        "--threshold", "5e-2", "--st_freq", "10",
        "--w_sym_reg", "1e-3", "--sym_reg_type", "i",
        "--ae_arch", "mlp", "--hidden_dim", "16", "--n_layers", "2",
        "--n_comps", "2", "--batch_norm", "--ortho_ae",
        "--repr", "(2,1,2)", "--group_idx", "0",
        "--lbfgs_subsample", "0.5", "--n_seeds", "2", "--seed_chunk", "2",
    ]))
    assert res["Xi"].shape[0] == 2


def test_cli_main_gp_sweep(tiny_dosc_cache):
    """GP sweep CLI smoke: 2-seed sweep mode with the Pallas fitness and
    const-opt gradient backends, tiny population/generations."""
    from symmetry_ode_discovery_tpu.cli import main_gp as mgp

    args = _args(["--pysr_subsample", "0.5", "--pysr_bs", "32",
                  "--gp_generations", "2", "--gp_fitness_rows", "64",
                  "--n_seeds", "2", "--save_dir", "cli-gp-smoke",
                  "--gp_eval_backend", "pallas",
                  "--gp_grad_backend", "pallas"])
    mgp.run(args)
    import glob
    eqs = sorted(glob.glob("saved_models/cli-gp-smoke/equations_seed*.txt"))
    assert len(eqs) == 2
    assert len(glob.glob("eval_results/cli-gp-smoke/seed*.npz")) == 2
    for f in eqs:
        lines = open(f).read().strip().splitlines()
        assert len(lines) == 2 and all(l for l in lines)

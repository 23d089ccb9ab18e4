"""Tests for auxiliary subsystems: checkpointing, long-term prediction eval,
RD solver, profiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_checkpoint_roundtrip(tmp_path):
    from symmetry_ode_discovery_tpu.utils.checkpoint import load_pytree, save_pytree

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)},
            "t": (jnp.zeros(2), jnp.full((1, 1), 7.0))}
    p = str(tmp_path / "ck.npz")
    save_pytree(p, tree)
    like = jax.tree_util.tree_map(jnp.zeros_like, tree)
    out = load_pytree(p, like)
    for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_laligan_checkpoint_roundtrip(tmp_path):
    from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
    from symmetry_ode_discovery_tpu.models.discriminator import Discriminator
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.utils.checkpoint import load_laligan, save_laligan

    ae = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=8, latent_dim=2,
                        n_layers=1, n_comps=2, batch_norm=True)
    params, bstats = ae.init(jax.random.PRNGKey(0))
    spec = lg.parse_repr("(2,1,2)", "0")
    g = lg.init_generator(jax.random.PRNGKey(1), spec)
    g = lg.set_threshold(spec, g, 0.5)
    bundle = {"ae": params, "d": {}, "g": g}
    save_laligan("ckpt-test", bundle, bstats, root=str(tmp_path))

    params2, bstats2 = ae.init(jax.random.PRNGKey(9))
    g2 = lg.init_generator(jax.random.PRNGKey(9), spec)
    bundle2 = {"ae": params2, "d": {}, "g": g2}
    restored, rb = load_laligan("ckpt-test", bundle2, bstats2, root=str(tmp_path))
    np.testing.assert_allclose(np.asarray(restored["g"].Li[0]), np.asarray(g.Li[0]))
    np.testing.assert_allclose(np.asarray(restored["g"].masks[0]), np.asarray(g.masks[0]))
    a1 = jax.tree_util.tree_leaves(bundle["ae"])
    a2 = jax.tree_util.tree_leaves(restored["ae"])
    for x, y in zip(a1, a2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_eval_ltp_exact_linear():
    """Rolling out the TRUE dosc field should track the true trajectories."""
    from symmetry_ode_discovery_tpu.data.systems import SYSTEMS, dosc
    from symmetry_ode_discovery_tpu.evaluation.eval_ltp import eval_ltp_accuracy
    from symmetry_ode_discovery_tpu.ops.integrators import solve_ode_batch

    sys = SYSTEMS["dosc"]
    x0 = sys.sample_ics(jax.random.PRNGKey(0), 4)
    x, _ = solve_ode_batch(sys.f, x0, dt=0.01, num_steps=100)
    trajs = jnp.transpose(x, (1, 0, 2))  # (n_ics, steps, dim)
    res = eval_ltp_accuracy(dosc, trajs, task="dosc", dt=0.01)
    assert res["x_pred"].shape == (4, 99, 2)
    assert res["error"].mean() < 1e-6


def test_rd_solver_small():
    from symmetry_ode_discovery_tpu.data.rd_solver import simulate_rd

    t, x, y, uf, duf = simulate_rd(n=32, T=2.0, dt=0.1)
    assert uf.shape == (32, 32, 21)
    assert np.isfinite(uf).all() and np.isfinite(duf).all()
    assert np.abs(uf).max() < 2.0  # bounded lambda-omega dynamics
    # finite-difference consistency of duf
    fd = (uf[..., 11] - uf[..., 10]) / 0.1
    rel = np.abs(fd - duf[..., 10]).mean() / (np.abs(duf[..., 10]).mean() + 1e-9)
    assert rel < 0.15


def test_rd_mat_roundtrip(tmp_path):
    from symmetry_ode_discovery_tpu.data.datasets import ReactionDiffusionDataset
    from symmetry_ode_discovery_tpu.data.rd_solver import generate_rd_mat

    p = str(tmp_path / "reaction_diffusion.mat")
    generate_rd_mat(p, n=16, T=2.0, dt=0.1)
    ds = ReactionDiffusionDataset.make(mode="train", path=p)
    assert ds.x.shape[1] == 16 * 16
    assert len(ds) == int(0.8 * 21)


def test_profiling_timed():
    from symmetry_ode_discovery_tpu.utils.profiling import timed

    results = {}
    with timed("probe", results):
        _ = (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    assert results["probe"] > 0


def test_aggregate_impute_nan_cli(tmp_path, capsys, monkeypatch):
    """--impute_nan must reproduce notebook cell 2: NaN RMSE imputed with the
    max, then BOTH valid and any statistics per equation + all-equations."""
    import numpy as np

    from symmetry_ode_discovery_tpu.cli.aggregate import main as agg_main

    d = tmp_path / "run-x"
    d.mkdir()
    # seed0: correct both eqs, mse [.01, .04]; seed1: eq1 wrong, mse [.09, nan]
    np.savez(d / "seed0.npz", correct_form=np.array([1.0, 1.0]),
             mse=np.array([0.01, 0.04]), correct_form_all=np.array(1.0),
             mse_all=np.array(0.025))
    np.savez(d / "seed1.npz", correct_form=np.array([1.0, 0.0]),
             mse=np.array([0.09, np.nan]), correct_form_all=np.array(0.0),
             mse_all=np.array(np.nan))
    agg_main(["run-x", "--impute_nan", "--result_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "Joint success rate = 1/2" in out
    # eq0 valid == any == mean(.1, .3) = .2
    assert "Equation 0 RMSE = 0.2000" in out
    assert "Equation 0 RMSE (any) = 0.2000" in out
    # eq1: nan imputed with max observed rmse (0.3); valid = seed0 only (0.2)
    assert "Equation 1 RMSE = 0.2000" in out
    assert "Equation 1 RMSE (any) = 0.2500" in out
    # all-equations: valid = sqrt(.025); any = mean(sqrt(.025), imputed max)
    assert "All equations RMSE = 0.1581" in out


def test_summarize_xplane_roundtrip(tmp_path):
    """The no-TensorBoard XPlane parser reads back a jax.profiler trace
    (CPU backend: host plane 'python' line; on TPU the same call with the
    default plane/line gives the device op table)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from symmetry_ode_discovery_tpu.utils.profiling import (
        summarize_xplane, trace)

    with pytest.raises(FileNotFoundError):
        summarize_xplane(str(tmp_path / "empty"))

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((128, 128))
    f(x).block_until_ready()
    d = str(tmp_path / "tr")
    with trace(d):
        f(x).block_until_ready()
    rows = summarize_xplane(d, plane="/host:CPU", line="python",
                            print_table=False)
    assert rows, "expected host python events in the trace"
    name, sec, count = rows[0]
    assert isinstance(name, str) and sec >= 0 and count >= 1


def test_pt_cache_fallback(tmp_path, monkeypatch):
    """load_or_generate reads the reference's torch .pt caches when no .npy
    cache exists (reference data_utils CLIs write {stem}-{x,dx}.pt)."""
    torch = pytest.importorskip("torch")
    from symmetry_ode_discovery_tpu.data import datasets as dsmod

    x = np.random.default_rng(0).standard_normal((3, 5, 2)).astype(np.float32)
    dx = 2.0 * x
    stem = tmp_path / "dosc-train-noise20-gp"
    torch.save(torch.from_numpy(x), f"{stem}-x.pt")
    torch.save(torch.from_numpy(dx), f"{stem}-dx.pt")
    monkeypatch.setattr(dsmod, "DATA_PATH", str(tmp_path))

    got_x, got_dx = dsmod.load_or_generate("dosc", "train", noise=0.2,
                                           smoothing="gp")
    np.testing.assert_allclose(np.asarray(got_x), x)
    np.testing.assert_allclose(np.asarray(got_dx), dx)
    # .npy caches still take precedence over .pt
    np.save(f"{stem}-x.npy", x + 1.0)
    np.save(f"{stem}-dx.npy", dx)
    got_x2, _ = dsmod.load_or_generate("dosc", "train", noise=0.2,
                                       smoothing="gp")
    np.testing.assert_allclose(np.asarray(got_x2), x + 1.0)
    # a truncated/corrupt .pt cache is skipped, not a crash
    with open(f"{stem}-x.pt", "wb") as f:
        f.write(b"not a torch file")
    assert dsmod._load_pt_cache(str(stem)) is None


def test_committed_laligan_checkpoints_intact():
    """The tracked LaLiGAN checkpoints (the artifacts every symreg / GP-symm
    sweep row in RESULTS.md depends on) load and carry the learned symmetry:
    LV noise99 must hold the shear generator (reference lv/noise99_sym
    protocol outcome), selkov a finite nonzero sim2 generator."""
    root = os.path.join(os.path.dirname(__file__), "..", "saved_models")

    g = np.load(os.path.join(root, "laligan-noise99-lv", "generator.npz"))
    m = np.load(os.path.join(root, "laligan-noise99-lv", "generator_mask.npz"))
    Li = g["['Li']/[0]"] * m["[0]"]          # (n_channels, 2, 2) masked
    assert Li.shape == (1, 2, 2)
    # thresholded shear: dominant (0,1) entry, everything else masked to ~0
    assert abs(Li[0, 0, 1]) > 0.5
    off = np.abs(Li[0]).sum() - abs(Li[0, 0, 1])
    assert off < 1e-3

    gs = np.load(os.path.join(root, "laligan-noise20-selkov", "generator.npz"))
    Li_s = gs["['Li']/[0]"]
    assert np.all(np.isfinite(Li_s)) and np.abs(Li_s).max() > 0.1

    for name in ("laligan-noise99-lv", "laligan-noise20-selkov"):
        ae = np.load(os.path.join(root, name, "autoencoder.npz"))
        vals = [ae[k] for k in ae.files]
        assert vals and all(np.all(np.isfinite(v)) for v in vals)

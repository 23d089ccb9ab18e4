"""Multi-seed GP sweep engine: mechanics + easy-target discovery + the sympy
form projector used to score GP equations."""

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.symgp.evolve import GPConfig
from symmetry_ode_discovery_tpu.symgp.eval_gp import (
    eval_gp_equations, expr_to_library_coeffs,
)
from symmetry_ode_discovery_tpu.symgp.sweep import gp_sweep_plain, gp_sweep_system
from symmetry_ode_discovery_tpu.symgp.tape import (
    ADD, MUL, SUB, TapeSpec, tape_to_string,
)


def test_eval_gp_equations_forms():
    r = eval_gp_equations(["0.6667 - 1.3333*exp(x1)", "exp(x0) - 1.0"], "lv")
    assert r["correct_form"].all() and r["mse"].max() < 1e-4
    r = eval_gp_equations(["(x0 + 0.17)*exp(0.35*x0)", "exp(x0) - 1"], "lv")
    assert r["correct_form"][0] == 0 and not r["in_library"][0]
    c, ok = expr_to_library_coeffs("0.75 - 0.1*x0 - x0*x1**2", "selkov")
    assert ok and abs(c[0] - 0.75) < 1e-9 and abs(c[8] + 1.0) < 1e-9


def test_gp_sweep_plain_recovers_linear():
    """3 seeds x 2 dims on a trivially learnable target dx = [2*x0, x1 - x0]."""
    rng = np.random.default_rng(0)
    S, N = 3, 64
    X = rng.standard_normal((S, N, 2)).astype(np.float32)
    dX = np.stack([2.0 * X[..., 0], X[..., 1] - X[..., 0]], axis=-1)
    spec = TapeSpec(n_vars=2, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=128, n_generations=12, const_opt_steps=4, seed=0)
    per_seed, res = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1, 2])
    assert len(per_seed) == S and len(per_seed[0]) == 2
    # every unit should fit the linear target nearly exactly
    assert res.best_fit.max() < 0.05, res.best_fit
    # monotone best-so-far histories
    assert np.all(np.diff(res.history, axis=1) <= 1e-7)


def test_gp_sweep_system_with_symreg_runs():
    """Paired-system sweep with a rotation-symmetry penalty table: finite
    fitness, improving, and penalty actually contributes."""
    rng = np.random.default_rng(1)
    S, N = 2, 48
    X = rng.standard_normal((S, N, 2)).astype(np.float32)
    dX = np.stack([-X[..., 1], X[..., 0]], axis=-1)  # rotation field
    # group element: small rotation; J constant
    th = 0.05
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                 np.float32)
    gx = np.einsum("ij,snj->sni", R, X)[:, None]          # (S, 1, N, 2)
    Jg = np.broadcast_to(R, (S, 1, N, 2, 2)).copy()
    spec = TapeSpec(n_vars=2, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=96, n_generations=10, const_opt_steps=4, seed=0)
    per_seed, res = gp_sweep_system(X, dX, spec, cfg, seeds=[0, 1],
                                    gx_all=gx, Jgx_all=Jg, w_sym_reg=0.1)
    assert len(per_seed) == S and len(per_seed[0]) == 2
    assert np.isfinite(res.best_fit).all()
    assert res.best_fit.max() < 0.5, [
        [tape_to_string(*c) for c in p] for p in per_seed]


def test_gp_sweep_mesh_matches_vmap():
    """The mesh-sharded GP sweep (unit axis over an 8-device mesh, with a
    non-divisible unit count exercising the padding path) must reproduce the
    single-device vmap sweep: identical breeding RNG streams consume
    identical fitness, so discovered tapes are identical."""
    from symmetry_ode_discovery_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(0)
    S, N = 3, 64  # 6 units -> pads to 8
    X = rng.standard_normal((S, N, 2)).astype(np.float32)
    dX = np.stack([2.0 * X[..., 0], X[..., 1] - X[..., 0]], axis=-1)
    spec = TapeSpec(n_vars=2, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=128, n_generations=8, const_opt_steps=4, seed=0)
    ps1, r1 = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1, 2])
    ps8, r8 = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1, 2],
                             mesh=make_mesh(8, axis="seed"))
    np.testing.assert_allclose(r8.best_fit, r1.best_fit, rtol=1e-4)
    for u1, u8 in zip(ps1, ps8):
        for (o1, a1, c1), (o8, a8, c8) in zip(u1, u8):
            np.testing.assert_array_equal(o8, o1)
            np.testing.assert_array_equal(a8, a1)
            np.testing.assert_allclose(c8, c1, rtol=1e-4, atol=1e-6)

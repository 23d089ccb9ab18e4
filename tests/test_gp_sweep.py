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


def test_gp_sweep_plain_bf16_fitness():
    """bf16 fitness evaluation (--gp_eval_dtype bf16): same discovery on an
    easy target, f32 fitness values (preds cast back before reductions)."""
    rng = np.random.default_rng(0)
    S, N = 2, 64
    X = rng.standard_normal((S, N, 2)).astype(np.float32)
    dX = np.stack([2.0 * X[..., 0], X[..., 1] - X[..., 0]], axis=-1)
    spec = TapeSpec(n_vars=2, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=128, n_generations=12, const_opt_steps=4, seed=0)
    per_seed, res = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1],
                                   eval_dtype=jnp.bfloat16)
    assert res.best_fit.dtype == np.float64 or res.best_fit.dtype == np.float32
    # the easy linear target is still found through bf16 ranking
    assert res.best_fit.max() < 0.05, res.best_fit
    assert np.all(np.diff(res.history, axis=1) <= 1e-7)

def test_gp_sweep_pallas_fitness_matches_xla():
    """--gp_eval_backend pallas: the VMEM stack-machine fitness kernel
    computes the same per-step arithmetic in the same order as the XLA
    interpreter, so the f32 sweep outcome is bit-identical (interpret mode
    on the CPU test backend)."""
    rng = np.random.default_rng(0)
    S, N = 2, 64
    X = rng.standard_normal((S, N, 2)).astype(np.float32)
    dX = np.stack([2.0 * X[..., 0], X[..., 1] - X[..., 0]], axis=-1)
    spec = TapeSpec(n_vars=2, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=128, n_generations=8, const_opt_steps=4, seed=0)
    ps_x, r_x = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1])
    ps_p, r_p = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1],
                               eval_backend="pallas")
    np.testing.assert_array_equal(r_p.best_fit, r_x.best_fit)
    for u_x, u_p in zip(ps_x, ps_p):
        for (o1, a1, c1), (o2, a2, c2) in zip(u_x, u_p):
            np.testing.assert_array_equal(o2, o1)
            np.testing.assert_array_equal(a2, a1)
            np.testing.assert_array_equal(c2, c1)


def test_pallas_eval_tapes_parity():
    """Kernel-level parity vs tape.eval_tapes: random population incl. DIV/
    EXP/SIN ops, overflow rows NaN in both, values bit-equal (interpret)."""
    from symmetry_ode_discovery_tpu.symgp.pallas_eval import eval_tapes_pallas
    from symmetry_ode_discovery_tpu.symgp.tape import (
        DIV, EXP, SIN, VAR, eval_tapes, random_population, spec_op_table,
    )

    rng = np.random.default_rng(3)
    spec = TapeSpec(n_vars=2, max_len=24, stack_depth=8,
                    binary_ops=(ADD, SUB, MUL, DIV), unary_ops=(EXP, SIN))
    ops, args, consts = random_population(rng, spec, 200)
    X = rng.standard_normal((300, 2)).astype(np.float32)
    tbl = spec_op_table(spec)
    ref = np.asarray(eval_tapes(jnp.asarray(ops), jnp.asarray(args),
                                jnp.asarray(consts), jnp.asarray(X),
                                spec.stack_depth, op_table=tbl))
    out = np.asarray(eval_tapes_pallas(jnp.asarray(ops), jnp.asarray(args),
                                       jnp.asarray(consts), jnp.asarray(X),
                                       spec.stack_depth, op_table=tbl,
                                       interpret=True))
    np.testing.assert_array_equal(np.isnan(ref), np.isnan(out))
    m = ~np.isnan(ref)
    np.testing.assert_array_equal(ref[m], out[m])

    # depth-3 program on a depth-2 stack must NaN in both
    ops2 = np.array([[VAR, VAR, VAR, ADD, ADD, 0, 0, 0]], np.int32)
    z = np.zeros_like(ops2)
    r2 = eval_tapes(jnp.asarray(ops2), jnp.asarray(z),
                    jnp.asarray(z, np.float32).astype(np.float32),
                    jnp.asarray(X), 2)
    p2 = eval_tapes_pallas(jnp.asarray(ops2), jnp.asarray(z),
                           jnp.asarray(np.zeros_like(ops2, np.float32)),
                           jnp.asarray(X), 2, interpret=True)
    assert np.isnan(np.asarray(r2)).all() and np.isnan(np.asarray(p2)).all()

def test_gp_sweep_system_pallas_matches_xla():
    """The symmetry-regularized system sweep through the Pallas fitness
    backend: the (1+n_g)*N evaluation-row path (x plus g(x) rows, paired
    2P tapes) reproduces the XLA-interpreter sweep bit-for-bit."""
    rng = np.random.default_rng(1)
    S, N = 2, 48
    X = rng.standard_normal((S, N, 2)).astype(np.float32)
    dX = np.stack([-X[..., 1], X[..., 0]], axis=-1)
    th = 0.05
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                 np.float32)
    gx = np.einsum("ij,snj->sni", R, X)[:, None]
    Jg = np.broadcast_to(R, (S, 1, N, 2, 2)).copy()
    spec = TapeSpec(n_vars=2, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=96, n_generations=8, const_opt_steps=4, seed=0)
    ps_x, r_x = gp_sweep_system(X, dX, spec, cfg, seeds=[0, 1],
                                gx_all=gx, Jgx_all=Jg, w_sym_reg=0.1)
    ps_p, r_p = gp_sweep_system(X, dX, spec, cfg, seeds=[0, 1],
                                gx_all=gx, Jgx_all=Jg, w_sym_reg=0.1,
                                eval_backend="pallas")
    np.testing.assert_array_equal(r_p.best_fit, r_x.best_fit)
    for u_x, u_p in zip(ps_x, ps_p):
        for (o1, a1, c1), (o2, a2, c2) in zip(u_x, u_p):
            np.testing.assert_array_equal(o2, o1)
            np.testing.assert_array_equal(a2, a1)
            np.testing.assert_array_equal(c2, c1)

def test_gp_sweep_pallas_bf16_combination():
    """--gp_eval_backend pallas --gp_eval_dtype bf16 together: the VMEM
    kernel runs the stack machine in bfloat16 and the sweep is bit-equal to
    the bf16 XLA interpreter (the production TPU fast path)."""
    rng = np.random.default_rng(0)
    S, N = 2, 64
    X = rng.standard_normal((S, N, 2)).astype(np.float32)
    dX = np.stack([2.0 * X[..., 0], X[..., 1] - X[..., 0]], axis=-1)
    spec = TapeSpec(n_vars=2, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=128, n_generations=8, const_opt_steps=4, seed=0)
    ps_p, r_p = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1],
                               eval_dtype=jnp.bfloat16, eval_backend="pallas")
    ps_x, r_x = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1],
                               eval_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(r_p.best_fit, r_x.best_fit)
    for u_x, u_p in zip(ps_x, ps_p):
        for (o1, a1, c1), (o2, a2, c2) in zip(u_x, u_p):
            np.testing.assert_array_equal(o2, o1)
            np.testing.assert_array_equal(a2, a1)
            np.testing.assert_array_equal(c2, c1)

def test_gp_sweep_grad_backend_pallas():
    """--gp_grad_backend pallas: the zero-residual VJP kernel drives the
    Adam constant optimization. Gradient row-sums associate differently
    than XLA autodiff (per-row-tile accumulation), so outcomes are compared
    statistically: same easy-target discovery, near-identical best fitness."""
    rng = np.random.default_rng(0)
    S, N = 2, 64
    X = rng.standard_normal((S, N, 2)).astype(np.float32)
    dX = np.stack([2.0 * X[..., 0], X[..., 1] - X[..., 0]], axis=-1)
    spec = TapeSpec(n_vars=2, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=128, n_generations=10, const_opt_steps=4, seed=0)
    ps_x, r_x = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1])
    ps_p, r_p = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1],
                               grad_backend="pallas")
    assert r_p.best_fit.max() < 0.05, r_p.best_fit
    np.testing.assert_allclose(r_p.best_fit, r_x.best_fit, atol=1e-3)


def test_gp_sweep_system_grad_backend_pallas():
    """Symmetry-regularized system sweep with the fused VJP const-opt:
    the symm penalty's cotangent (einsum with J_g across both components)
    flows through the kernel's consts gradient correctly."""
    rng = np.random.default_rng(1)
    S, N = 2, 48
    X = rng.standard_normal((S, N, 2)).astype(np.float32)
    dX = np.stack([-X[..., 1], X[..., 0]], axis=-1)
    th = 0.05
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                 np.float32)
    gx = np.einsum("ij,snj->sni", R, X)[:, None]
    Jg = np.broadcast_to(R, (S, 1, N, 2, 2)).copy()
    spec = TapeSpec(n_vars=2, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=96, n_generations=8, const_opt_steps=4, seed=0)
    ps_x, r_x = gp_sweep_system(X, dX, spec, cfg, seeds=[0, 1],
                                gx_all=gx, Jgx_all=Jg, w_sym_reg=0.1)
    ps_p, r_p = gp_sweep_system(X, dX, spec, cfg, seeds=[0, 1],
                                gx_all=gx, Jgx_all=Jg, w_sym_reg=0.1,
                                grad_backend="pallas")
    assert np.isfinite(r_p.best_fit).all()
    np.testing.assert_allclose(r_p.best_fit, r_x.best_fit, atol=2e-3)


def test_pallas_grad_kernel_matches_autodiff():
    """Kernel-level: d loss/d consts from eval_tapes_pallas_grad equals
    jax.grad of the XLA interpreter on a random population including
    DIV/EXP/SIN/COS/NEG and overflow (NaN) tapes."""
    from symmetry_ode_discovery_tpu.symgp.pallas_eval import (
        eval_tapes_pallas_grad, make_diff_eval_pallas)
    from symmetry_ode_discovery_tpu.symgp.tape import (
        COS, DIV, EXP, NEG, SIN, eval_tapes, random_population,
        spec_op_table)

    rng = np.random.default_rng(7)
    spec = TapeSpec(n_vars=2, max_len=24, stack_depth=8,
                    binary_ops=(ADD, SUB, MUL, DIV),
                    unary_ops=(EXP, SIN, COS, NEG))
    ops, args, consts = random_population(rng, spec, 160)
    X = rng.standard_normal((200, 2)).astype(np.float32)
    y = rng.standard_normal((160, 200)).astype(np.float32)
    tbl = spec_op_table(spec)
    opsj, argsj = jnp.asarray(ops), jnp.asarray(args)
    cj, Xj, yj = jnp.asarray(consts), jnp.asarray(X), jnp.asarray(y)

    def loss_ref(c):
        p = eval_tapes(opsj, argsj, c, Xj, spec.stack_depth, op_table=tbl)
        return jnp.sum(jnp.where(jnp.isnan(p), 0.0, p) * yj)

    g_ref = np.asarray(jax.grad(loss_ref)(cj))

    ev = make_diff_eval_pallas(spec.stack_depth, tbl, interpret=True)

    def loss_k(c):
        p = ev(opsj, argsj, c, Xj)
        return jnp.sum(jnp.where(jnp.isnan(p), 0.0, p) * yj)

    g_k = np.asarray(jax.grad(loss_k)(cj))
    assert np.isfinite(g_k).all()
    np.testing.assert_allclose(g_k, g_ref, rtol=1e-4, atol=1e-4)

    # direct kernel call with an explicit cotangent
    p = eval_tapes(opsj, argsj, cj, Xj, spec.stack_depth, op_table=tbl)
    gbar = jnp.where(jnp.isnan(p), 0.0, yj)
    g_d = np.asarray(eval_tapes_pallas_grad(opsj, argsj, cj, Xj, gbar,
                                            spec.stack_depth, op_table=tbl,
                                            interpret=True))
    np.testing.assert_allclose(g_d, g_ref, rtol=1e-4, atol=1e-4)

def test_gp_sweep_mesh_with_pallas_grad():
    """--mesh_devices + --gp_grad_backend pallas: the custom-VJP kernel
    composes with the shard_map-sharded unit axis (production combination)."""
    from symmetry_ode_discovery_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    S, N = 3, 64
    X = rng.standard_normal((S, N, 2)).astype(np.float32)
    dX = np.stack([2.0 * X[..., 0], X[..., 1] - X[..., 0]], axis=-1)
    spec = TapeSpec(n_vars=2, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=128, n_generations=6, const_opt_steps=4, seed=0)
    ps1, r1 = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1, 2],
                             grad_backend="pallas")
    ps8, r8 = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1, 2],
                             mesh=make_mesh(8, axis="seed"),
                             grad_backend="pallas")
    np.testing.assert_allclose(r8.best_fit, r1.best_fit, rtol=1e-4)


def test_pallas_grad_padded_rows_no_nan_poisoning():
    """Row padding to the lane tile must not poison gradients: a tape that
    overflows to inf AT x=0 (the pad value) but is finite on the real rows
    gets a 0-cotangent * inf = NaN in the padded columns of the backward;
    the kernel must mask those, matching jax.grad of the XLA interpreter
    (which only ever sees the real rows)."""
    from symmetry_ode_discovery_tpu.symgp.pallas_eval import (
        eval_tapes_pallas_grad)
    from symmetry_ode_discovery_tpu.symgp.tape import (
        CONST, EXP, VAR, eval_tapes)

    # exp(x0+35)^4: at real rows (x0 ~ -30) ~ e^20, finite; at x0=0 the
    # LAST multiply's b-operand is already inf (e^105), so its backward
    # partial is 0-cotangent * inf = NaN in the padded columns
    ops = np.array([[VAR, CONST, ADD, EXP, VAR, CONST, ADD, EXP, MUL,
                     VAR, CONST, ADD, EXP, MUL,
                     VAR, CONST, ADD, EXP, MUL, 0]], np.int32)
    args = np.zeros_like(ops)
    consts = np.zeros((1, 20), np.float32)
    consts[0, [1, 5, 10, 15]] = 35.0
    rng = np.random.default_rng(0)
    N = 100  # < the 128 row tile -> 28 zero-padded columns
    X = np.stack([rng.uniform(-31.0, -29.0, N),
                  rng.standard_normal(N)], axis=1).astype(np.float32)
    y = rng.standard_normal((1, N)).astype(np.float32)
    tbl = (0, 1, 2, ADD, MUL, EXP)
    opsj, argsj = jnp.asarray(ops), jnp.asarray(args)
    cj, Xj, yj = jnp.asarray(consts), jnp.asarray(X), jnp.asarray(y)

    p = eval_tapes(opsj, argsj, cj, Xj, 8, op_table=tbl)
    assert np.isfinite(np.asarray(p)).all()

    def loss_ref(c):
        return jnp.sum(eval_tapes(opsj, argsj, c, Xj, 8, op_table=tbl) * yj)

    g_ref = np.asarray(jax.grad(loss_ref)(cj))
    g_k = np.asarray(eval_tapes_pallas_grad(opsj, argsj, cj, Xj, yj, 8,
                                            op_table=tbl, interpret=True))
    assert np.isfinite(g_k).all(), g_k
    np.testing.assert_allclose(g_k, g_ref, rtol=1e-4, atol=1e-4)


def test_gp_select_raw_vs_penalized():
    """--gp_select semantics (the Pareto-elbow study's lever): on a target
    with a small high-order term (dx0 = x0 + 0.05*x0^2) and a stiff
    parsimony, 'penalized' reports the short elbow tape while 'raw' reports
    the lower-loss (longer) tape. Breeding is identical (same seed), only
    the reported best differs."""
    import jax.numpy as jnp

    from symmetry_ode_discovery_tpu.symgp.tape import (eval_tapes,
                                                       spec_op_table,
                                                       tape_length)

    rng = np.random.default_rng(1)
    S, N = 2, 256
    X = rng.standard_normal((S, N, 1)).astype(np.float32)
    # the dosc regime in miniature: a small real second-order term whose mse
    # gain (~0.05) is comparable to its parsimony cost, so both forms coexist
    # on the front and only the REPORTED pick differs between the rules
    dX = (2.0 * X[..., :1] + 0.15 * X[..., :1] ** 2).astype(np.float32)
    spec = TapeSpec(n_vars=1, max_len=16, binary_ops=(ADD, SUB, MUL))
    cfg = GPConfig(pop_size=256, n_generations=12, const_opt_steps=8,
                   parsimony=0.02, seed=0)

    def mse_of(best):
        ops, args, consts = best
        y = eval_tapes(jnp.asarray(ops)[None], jnp.asarray(args)[None],
                       jnp.asarray(consts)[None], jnp.asarray(X[0]),
                       op_table=spec_op_table(spec))
        return float(np.mean((np.asarray(y)[0] - dX[0, :, 0]) ** 2))

    got = {}
    for sel in ("penalized", "raw"):
        per_seed, _ = gp_sweep_plain(X, dX, spec, cfg, seeds=[0, 1],
                                     select=sel)
        best = per_seed[0][0]
        got[sel] = (mse_of(best), int(tape_length(best[0][None])[0]))

    # raw picks pure train loss: never worse mse, strictly lower here (it
    # keeps the noise-fitting terms the elbow trades away), and the
    # penalized pick is the shorter tape
    assert got["raw"][0] <= got["penalized"][0] + 1e-9, got
    assert got["penalized"][1] < got["raw"][1], got
    assert got["raw"][0] < got["penalized"][0] - 1e-6, got

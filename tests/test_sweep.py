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


def test_stacked_sweep_matches_per_dataset():
    """sweep_sindy_lbfgs_stacked (the all-noise-levels sweep) is lane-exact:
    each dataset's results equal its own single-dataset kernel sweep."""
    from symmetry_ode_discovery_tpu.training.sweep import (
        _pallas_lbfgs_sweep, sweep_sindy_lbfgs_stacked)

    x, dx = _dosc()
    xf, dxf = x.reshape(-1, 2), dx.reshape(-1, 2)
    noise = 0.05 * jax.random.normal(jax.random.PRNGKey(7), xf.shape)
    xs = [xf, xf + noise]
    dxs = [dxf, dxf + noise]
    cfg, _ = make_config(2, poly_order=2)
    hp = LBFGSHParams(num_epochs=10, lr_sindy=1.0, sindy_reg_type="none",
                      st_freq=5, threshold=5e-2)
    seeds = np.arange(3)
    stacked = sweep_sindy_lbfgs_stacked(cfg, None, xs, dxs, sindy_truth["dosc"],
                                        hp, seeds, lbfgs_subsample=0.5,
                                        interpret=True)
    assert len(stacked) == 2
    for xi, dxi, res in zip(xs, dxs, stacked):
        k = int(xi.shape[0] * 0.5)
        solo = _pallas_lbfgs_sweep(cfg, None, xi, dxi, sindy_truth["dosc"],
                                   hp, seeds, k, interpret=True)
        np.testing.assert_array_equal(res.Xi, solo.Xi)
        np.testing.assert_array_equal(res.mask, solo.mask)
        np.testing.assert_array_equal(res.correct_form, solo.correct_form)
    # the clean-data lanes actually discover the system
    assert stacked[0].correct_form.all()


def test_symreg_stepper_sharded_matches_vmap():
    """The mesh-sharded host-stepped EquivSINDy-r driver (parallel/mesh.py
    shard_stepper, the cli/main.py --mesh_devices path) must reproduce the
    single-device vmap path: identical sparsity masks, coefficients equal up
    to fp noise (per-device vmap width 1 vs 8 reorders XLA reductions, and
    L-BFGS amplifies the last-ulp differences over epochs)."""
    from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.parallel.mesh import make_mesh, shard_stepper
    from symmetry_ode_discovery_tpu.training.siged import make_lbfgs_stepper
    from symmetry_ode_discovery_tpu.training.symmreg import make_symmreg_i_fast

    assert len(jax.devices()) == 8
    ae_def = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=16,
                            latent_dim=2, n_layers=2, n_comps=2,
                            batch_norm=True, ortho_ae=True)
    params, bstats = ae_def.init(jax.random.PRNGKey(0))
    spec = lg.parse_repr("(2,1,2)", "0")
    g_state = lg.init_generator(jax.random.PRNGKey(1), spec)
    prep, pen = make_symmreg_i_fast(ae_def, params, bstats, spec, g_state,
                                    0.1, 0.01)

    x, dx = _dosc(n_ics=8, steps=50)
    xf, dxf = x.reshape(-1, 2), dx.reshape(-1, 2)
    n = xf.shape[0]
    cfg, _ = make_config(2, poly_order=2)
    hp = LBFGSHParams(num_epochs=4, inner_iters=5, lr_sindy=0.5,
                      sindy_reg_type="none", st_freq=2, threshold=5e-2,
                      w_sym_reg=0.1)
    init_f, step_f, extract_f = make_lbfgs_stepper(
        cfg, None, hp, pen, sym_reg_prep=prep, epochs_per_call=2)

    def prep_seed(s):
        kk = jax.random.fold_in(jax.random.PRNGKey(0), s)
        kperm, kfit, _ = jax.random.split(kk, 3)
        idx = jax.random.permutation(kperm, n)[:64]
        return xf[idx], dxf[idx], kfit

    seeds = jnp.arange(8)

    def drive(prep_j, init_j, step_j, ext_j):
        xs, dxs, keys = prep_j(seeds)
        carry = init_j(xs, dxs, keys)
        for e in range(0, hp.num_epochs, 2):
            carry = step_j(carry, e)
        return ext_j(carry)

    Xi_v, m_v = drive(jax.jit(jax.vmap(prep_seed)), jax.jit(jax.vmap(init_f)),
                      jax.jit(jax.vmap(step_f, in_axes=(0, None))),
                      jax.jit(jax.vmap(extract_f)))
    Xi_s, m_s = drive(*shard_stepper(prep_seed, init_f, step_f, extract_f,
                                     make_mesh(8)))
    np.testing.assert_array_equal(np.asarray(m_s), np.asarray(m_v))
    np.testing.assert_allclose(np.asarray(Xi_s), np.asarray(Xi_v),
                               rtol=0.1, atol=5e-3)


def test_wsindy_sweep():
    x, _ = _dosc(n_ics=8, steps=2000, dt=0.01)
    x = jnp.transpose(x, (1, 0, 2))  # (n_ics, n_steps, dim)
    cfg, _ = make_config(2, poly_order=2)
    res = sweep_wsindy(cfg, x, 0.01, sindy_truth["dosc"], seeds=np.arange(8),
                       threshold=5e-2, num_test_funcs=25)
    # all seeds should recover the form on clean data
    assert res.correct_form.all(), res.Xi


def test_stepper_epoch_budget_no_overshoot():
    """num_epochs % epochs_per_call != 0: the host driver's last step_f call
    overshoots the protocol budget; the over-budget epochs must be no-ops
    (extra L-BFGS iterations and st_freq thresholding rounds would silently
    change sweep statistics). epc=2 over 3 epochs must bit-match epc=3."""
    from symmetry_ode_discovery_tpu.training.siged import make_lbfgs_stepper

    x, dx = _dosc(n_ics=8, steps=50)
    xf, dxf = x.reshape(-1, 2), dx.reshape(-1, 2)
    cfg, _ = make_config(2, poly_order=2)
    hp = LBFGSHParams(num_epochs=3, inner_iters=4, lr_sindy=0.5,
                      sindy_reg_type="none", st_freq=1, threshold=5e-2)
    key = jax.random.PRNGKey(3)

    def drive(epc):
        init_f, step_f, extract_f = make_lbfgs_stepper(
            cfg, None, hp, None, epochs_per_call=epc)
        carry = jax.jit(init_f)(xf[:64], dxf[:64], key)
        step_j = jax.jit(step_f)
        for e in range(0, hp.num_epochs, epc):
            carry = step_j(carry, e)
        return jax.jit(extract_f)(carry)

    Xi_exact, m_exact = drive(3)   # one call, no overshoot
    Xi_over, m_over = drive(2)     # last call covers epochs [2, 3]
    np.testing.assert_array_equal(np.asarray(m_over), np.asarray(m_exact))
    np.testing.assert_array_equal(np.asarray(Xi_over), np.asarray(Xi_exact))


def test_optax_lbfgs_matches_torch_trajectory():
    """The optax fixed-lr branch (what the symreg/latent paths run) must
    track torch.optim.LBFGS iterate-for-iterate: history_size=100, the
    first-iteration step scaling t = min(1, 1/|g|_1)*lr, and torch's
    commit-then-break gtd semantics. Verified on an over-determined SINDy
    least-squares problem with large initial gradients (the scaling regime)."""
    torch = __import__("pytest").importorskip("torch")

    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training import siged

    rng = np.random.default_rng(0)
    N, d = 200, 2
    cfg, _ = make_config(d, poly_order=2)
    x = rng.standard_normal((N, d)).astype(np.float32)
    theta = np.asarray(cfg.library(jnp.asarray(x)))
    Xi_true = rng.standard_normal((d, cfg.n_terms)).astype(np.float32)
    dx = 100.0 * (theta @ Xi_true.T) + 30.0 * rng.standard_normal(
        (N, d)).astype(np.float32)
    Xi0 = (0.1 * rng.standard_normal((d, cfg.n_terms))).astype(np.float32)
    # single-iteration epochs: the first step IS the scaled step (a full
    # -lr*g step here overshoots by ~|g|_1) and every curvature pair lands
    # in history — the regime that discriminates torch semantics
    LR, INNER, EPOCHS = 1.0, 1, 12

    Xi_t = torch.tensor(Xi0.copy(), requires_grad=True)
    theta_t, dx_t = torch.tensor(theta), torch.tensor(dx)
    opt_t = torch.optim.LBFGS([Xi_t], lr=LR, max_iter=INNER,
                              tolerance_grad=1e-7, tolerance_change=1e-9,
                              history_size=100, line_search_fn=None)
    t_losses = []
    for _ in range(EPOCHS):
        def closure():
            opt_t.zero_grad()
            loss = torch.mean((theta_t @ Xi_t.T - dx_t) ** 2)
            loss.backward()
            return loss
        opt_t.step(closure)
        with torch.no_grad():
            t_losses.append(float(torch.mean((theta_t @ Xi_t.T - dx_t) ** 2)))

    hp = siged.LBFGSHParams(num_epochs=EPOCHS, inner_iters=INNER,
                            lr_sindy=LR, sindy_reg_type="none", st_freq=0,
                            threshold=0.0, w_sindy_x=1.0, tol=0.0,
                            linesearch=False)
    opt = siged._make_opt(hp)
    xi_of = lambda p: p["Xi"]
    thetaj, dxj = jnp.asarray(theta), jnp.asarray(dx)

    def loss_fn(p, mask):
        return jnp.mean((thetaj @ (xi_of(p) * mask).T - dxj) ** 2)

    state = siged._init_loop_state({"Xi": jnp.asarray(Xi0.copy())}, opt,
                                   jnp.ones((d, cfg.n_terms)), hp)
    for ep in range(EPOCHS):
        state = siged._lbfgs_epoch_update(opt, hp, xi_of, loss_fn, state, ep)
        Xi_now = np.asarray(xi_of(state["params"]))
        ours = float(np.mean((theta @ Xi_now.T - dx) ** 2))
        assert abs(ours - t_losses[ep]) / abs(t_losses[ep]) < 1e-5, (ep, ours)

    np.testing.assert_allclose(np.asarray(xi_of(state["params"])),
                               Xi_t.detach().numpy(), atol=1e-3, rtol=1e-4)


def test_dangling_const_compat_matches_torch():
    """Bug-compat flag for reference sindy.py:59: under constrain_constant
    the reference STILL registers `const` as an nn.Parameter, so with L1
    regularization it contributes |const| to the loss, sign(const) to the
    joint L-BFGS direction/curvature history, and its update norm to the
    convergence delta. dangling_const=True must track torch iterate-for-
    iterate on a constrained problem; the default (False) must not carry a
    const parameter at all."""
    torch = __import__("pytest").importorskip("torch")

    from symmetry_ode_discovery_tpu.training import siged

    rng = np.random.default_rng(1)
    L = np.array([[2.0, 0.0], [0.0, 1.0]])  # growth scaling2
    cfg_clean, Q = make_config(2, poly_order=2, L_list=[L],
                               constrain_constant=True, threshold=5e-2)
    cfg_compat, Q2 = make_config(2, poly_order=2, L_list=[L],
                                 constrain_constant=True, threshold=5e-2,
                                 dangling_const=True)
    np.testing.assert_array_equal(np.asarray(Q), np.asarray(Q2))
    d, p, q = 2, cfg_clean.n_terms, cfg_clean.n_free

    # default behavior: no const parameter registered
    initp, _ = siged._make_param_fns(cfg_clean, jnp.asarray(Q))
    assert "const" not in initp(jax.random.PRNGKey(0))
    initp_c, xi_of = siged._make_param_fns(cfg_compat, jnp.asarray(Q))
    assert "const" in initp_c(jax.random.PRNGKey(0))

    N = 150
    x = rng.standard_normal((N, d)).astype(np.float32)
    theta = np.asarray(cfg_compat.library(jnp.asarray(x)))
    beta_true = rng.standard_normal(q).astype(np.float32)
    Xi_true = (np.asarray(Q) @ beta_true).reshape(d, p)
    dx = 10.0 * (theta @ Xi_true.T) + rng.standard_normal((N, d)).astype(np.float32)
    beta0 = (0.1 * rng.standard_normal(q)).astype(np.float32)
    const0 = rng.standard_normal((d, 1)).astype(np.float32)
    LR, INNER, EPOCHS, WREG = 1.0, 1, 10, 0.05

    # --- torch reference: const is a Parameter that only enters via L1 ---
    Qt = torch.tensor(np.asarray(Q, np.float32))
    beta_t = torch.tensor(beta0.copy(), requires_grad=True)
    const_t = torch.tensor(const0.copy(), requires_grad=True)
    theta_t, dx_t = torch.tensor(theta), torch.tensor(dx)
    opt_t = torch.optim.LBFGS([beta_t, const_t], lr=LR, max_iter=INNER,
                              tolerance_grad=1e-7, tolerance_change=1e-9,
                              history_size=100, line_search_fn=None)
    t_losses = []
    for _ in range(EPOCHS):
        def closure():
            opt_t.zero_grad()
            Xi = (Qt @ beta_t).reshape(d, p)
            loss = (torch.mean((theta_t @ Xi.T - dx_t) ** 2)
                    + WREG * (torch.norm(beta_t, 1) + torch.norm(const_t, 1)))
            loss.backward()
            return loss
        opt_t.step(closure)
        with torch.no_grad():
            Xi = (Qt @ beta_t).reshape(d, p)
            t_losses.append(float(
                torch.mean((theta_t @ Xi.T - dx_t) ** 2)
                + WREG * (torch.norm(beta_t, 1) + torch.norm(const_t, 1))))

    # --- ours, compat path ---
    hp = siged.LBFGSHParams(num_epochs=EPOCHS, inner_iters=INNER, lr_sindy=LR,
                            sindy_reg_type="l1", w_sindy_reg=WREG, st_freq=0,
                            threshold=0.0, w_sindy_x=1.0, tol=0.0,
                            linesearch=False)
    opt = siged._make_opt(hp)
    thetaj, dxj = jnp.asarray(theta), jnp.asarray(dx)

    def loss_fn(params, mask):
        Xi = xi_of(params)
        mse = jnp.mean((thetaj @ (Xi * mask).T - dxj) ** 2)
        l1 = sum(jnp.sum(jnp.abs(pp))
                 for pp in jax.tree_util.tree_leaves(params))
        return mse + WREG * l1

    params0 = {"beta": jnp.asarray(beta0.copy()),
               "const": jnp.asarray(const0.copy())}
    state = siged._init_loop_state(params0, opt, jnp.ones((d, p)), hp)
    for ep in range(EPOCHS):
        state = siged._lbfgs_epoch_update(opt, hp, xi_of, loss_fn, state, ep)
        ours = float(loss_fn(state["params"], jnp.ones((d, p))))
        # 1e-4: the L1 sign() near zero amplifies f32 rounding after a few
        # epochs (measured max rel delta 1.5e-5 over the 10-epoch run)
        assert abs(ours - t_losses[ep]) / abs(t_losses[ep]) < 1e-4, (ep, ours)
    np.testing.assert_allclose(np.asarray(state["params"]["beta"]),
                               beta_t.detach().numpy(), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state["params"]["const"]),
                               const_t.detach().numpy(), atol=1e-3, rtol=1e-4)


def test_dangling_const_pallas_kernel():
    """The Pallas kernel path: dangling const rides as zero Mmap columns.
    With w_reg=0 its gradient is identically zero, so given the same beta
    draw the compat kernel must reproduce the clean kernel's Xi exactly;
    with L1 on, the trajectories must diverge (const perturbs the joint
    curvature history, like torch)."""
    from symmetry_ode_discovery_tpu.ops.pallas_lbfgs import pallas_lbfgs_sweep
    from symmetry_ode_discovery_tpu.training.sweep import _pallas_setup

    rng = np.random.default_rng(2)
    L = np.array([[2.0, 0.0], [0.0, 1.0]])
    mk = lambda dang: make_config(2, poly_order=2, L_list=[L],
                                  constrain_constant=True, threshold=5e-2,
                                  dangling_const=dang)
    cfg_clean, Q = mk(False)
    cfg_compat, _ = mk(True)
    d, p, q = 2, cfg_clean.n_terms, cfg_clean.n_free

    N = 100
    x = rng.standard_normal((N, d)).astype(np.float32)
    theta = np.asarray(cfg_clean.library(jnp.asarray(x)))
    dx = rng.standard_normal((N, d)).astype(np.float32)
    S = jnp.asarray((theta.T @ theta)[None])
    B = jnp.asarray((theta.T @ dx).T[None])
    qv = jnp.asarray([float(np.sum(dx ** 2))])
    ne = jnp.asarray([float(dx.size)])
    beta0 = rng.standard_normal((1, q)).astype(np.float32)
    const0 = rng.standard_normal((1, d)).astype(np.float32)

    def run(cfg_m, wreg, th0):
        hp = LBFGSHParams(num_epochs=8, lr_sindy=1.0, w_sindy_reg=wreg,
                          sindy_reg_type="l1" if wreg else "none",
                          st_freq=0, threshold=0.0, tol=0.0)
        pcfg, Mmap, n_params = _pallas_setup(cfg_m, Q, hp)
        assert th0.shape[1] == n_params
        th, _, _ = pallas_lbfgs_sweep(pcfg, S, B, qv, ne, jnp.asarray(th0),
                                      Mmap=Mmap, interpret=True)
        return np.asarray(th @ jnp.asarray(Mmap).T).reshape(d, p)

    th0_compat = np.concatenate([beta0, const0], axis=1)
    xi_clean = run(cfg_clean, 0.0, beta0)
    xi_compat0 = run(cfg_compat, 0.0, th0_compat)
    np.testing.assert_allclose(xi_clean, xi_compat0, rtol=1e-6, atol=1e-7)

    xi_clean_l1 = run(cfg_clean, 0.05, beta0)
    xi_compat_l1 = run(cfg_compat, 0.05, th0_compat)
    assert np.abs(xi_clean_l1 - xi_compat_l1).max() > 1e-5


def test_subsample_idx_override_matches_and_steers():
    """Externally-supplied per-seed subsample indices (the torch-RNG
    cross-check mode): feeding the sweep the indices the jax PRNG would have
    drawn reproduces the default sweep bit-for-bit on both backends, and
    distinct rows actually change the fit (the override is live)."""
    from symmetry_ode_discovery_tpu.training.sweep import _pallas_lbfgs_sweep

    x, dx = _dosc()
    xf, dxf = x.reshape(-1, 2), dx.reshape(-1, 2)
    n = xf.shape[0]
    k = n // 2
    cfg, _ = make_config(2, poly_order=2)
    hp = LBFGSHParams(num_epochs=10, lr_sindy=1.0, sindy_reg_type="none",
                      st_freq=5, threshold=5e-2)
    seeds = np.arange(3)

    def jax_idx(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        kperm, _ = jax.random.split(key)
        return np.asarray(jax.random.permutation(kperm, n)[:k])

    idx = np.stack([jax_idx(s) for s in seeds])

    # optax backend
    base = sweep_sindy_lbfgs(cfg, None, xf, dxf, sindy_truth["dosc"], hp,
                             seeds, lbfgs_subsample=0.5, backend="optax")
    ours = sweep_sindy_lbfgs(cfg, None, xf, dxf, sindy_truth["dosc"], hp,
                             seeds, lbfgs_subsample=0.5, backend="optax",
                             subsample_idx=idx)
    np.testing.assert_array_equal(base.Xi, ours.Xi)

    # pallas kernel (interpret on the CPU mesh)
    base_p = _pallas_lbfgs_sweep(cfg, None, xf, dxf, sindy_truth["dosc"],
                                 hp, seeds, k, interpret=True)
    same_p = _pallas_lbfgs_sweep(cfg, None, xf, dxf, sindy_truth["dosc"],
                                 hp, seeds, k, interpret=True,
                                 subsample_idx=idx)
    np.testing.assert_array_equal(base_p.Xi, same_p.Xi)

    # a different subsample per seed changes the fitted coefficients
    other = _pallas_lbfgs_sweep(cfg, None, xf, dxf, sindy_truth["dosc"],
                                hp, seeds, k, interpret=True,
                                subsample_idx=np.roll(idx, 1, axis=0))
    assert not np.array_equal(np.asarray(base_p.Xi), np.asarray(other.Xi))


def test_wsindy_ref_rng_windows():
    """subsample_rng='ref' reproduces the reference's np.random window draws
    (main_wsindy.py:27,36-37) and actually changes the sweep outcome relative
    to the jax draws when the windows differ."""
    x, dx = _dosc()  # (n_ics, n_steps, d) trajectories
    cfg, _ = make_config(2, poly_order=2)
    seeds = np.arange(4)
    ref = sweep_wsindy(cfg, x, 0.02, sindy_truth["dosc"], seeds,
                       threshold=5e-2, num_epochs=3, subsample_rng="ref")
    # the draws themselves: np.random.seed(s); randint(start); randint(traj)
    n_ics, n_steps, _ = x.shape
    w = int(0.8 * n_steps)
    for s in seeds:
        rs = np.random.RandomState(int(s))
        start, traj = rs.randint(0, n_steps - w), rs.randint(0, n_ics)
        assert 0 <= start < n_steps - w and 0 <= traj < n_ics
    # deterministic: same call twice is bit-equal
    ref2 = sweep_wsindy(cfg, x, 0.02, sindy_truth["dosc"], seeds,
                        threshold=5e-2, num_epochs=3, subsample_rng="ref")
    np.testing.assert_array_equal(ref.Xi, ref2.Xi)

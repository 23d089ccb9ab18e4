"""The precomputed symmreg-i fast path must equal the straightforward
symmreg_i loss — value AND gradient — since it is a pure restructuring."""

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
from symmetry_ode_discovery_tpu.models import lie_generator as lg
from symmetry_ode_discovery_tpu.models.sindy import make_config
from symmetry_ode_discovery_tpu.training.siged import make_sym_reg_fn
from symmetry_ode_discovery_tpu.training.symmreg import make_symmreg_i_fast


def _setup(seed=0):
    ae_def = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=16,
                            latent_dim=2, n_layers=2, n_comps=2,
                            batch_norm=True, ortho_ae=True)
    params, bstats = ae_def.init(jax.random.PRNGKey(seed))
    spec = lg.parse_repr("(2,1,2)", "0")
    g_state = lg.init_generator(jax.random.PRNGKey(seed + 1), spec)
    cfg, _ = make_config(2, poly_order=2, include_exp=True)
    x = jax.random.normal(jax.random.PRNGKey(seed + 2), (64, 2))
    Xi = 0.1 * jax.random.normal(jax.random.PRNGKey(seed + 3),
                                 (2, cfg.n_terms))
    return ae_def, params, bstats, spec, g_state, cfg, x, Xi


def test_fast_symmreg_i_matches_slow():
    ae_def, params, bstats, spec, g_state, cfg, x, Xi = _setup()
    int_t, int_dt = 0.1, 0.01

    slow_fn = make_sym_reg_fn(ae_def, params, bstats, spec, g_state,
                              "i", int_t, int_dt)
    prep, fast_fn = make_symmreg_i_fast(ae_def, params, bstats, spec, g_state,
                                        int_t, int_dt)
    ctx = prep(x)

    def slow_loss(Xi):
        return slow_fn(lambda q: cfg.library(q) @ Xi.T, x)

    def fast_loss(Xi):
        return fast_fn(lambda q: cfg.library(q) @ Xi.T, x, ctx)

    v_s, g_s = jax.value_and_grad(slow_loss)(Xi)
    v_f, g_f = jax.value_and_grad(fast_loss)(Xi)
    np.testing.assert_allclose(float(v_f), float(v_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                               rtol=1e-4, atol=1e-6)


def test_fast_symmreg_bf16_close():
    """bf16 AE compute must stay within a few percent of the f32 penalty."""
    ae_def, params, bstats, spec, g_state, cfg, x, Xi = _setup(seed=7)
    prep32, fast32 = make_symmreg_i_fast(ae_def, params, bstats, spec, g_state,
                                         0.1, 0.01)
    prep16, fast16 = make_symmreg_i_fast(ae_def, params, bstats, spec, g_state,
                                         0.1, 0.01, ae_dtype=jnp.bfloat16)
    fwd = lambda q: cfg.library(q) @ Xi.T
    v32 = float(fast32(fwd, x, prep32(x)))
    v16 = float(fast16(fwd, x, prep16(x)))
    assert np.isfinite(v16)
    assert abs(v16 - v32) / (abs(v32) + 1e-9) < 0.15, (v16, v32)


def test_stepper_with_fast_symreg_runs():
    """make_lbfgs_stepper wires the prep ctx through the carry and fuses
    epochs; a few epochs must run finite and match the slow stepper's result."""
    from symmetry_ode_discovery_tpu.training.siged import (
        LBFGSHParams, make_lbfgs_stepper,
    )

    ae_def, params, bstats, spec, g_state, cfg, x, _ = _setup(seed=3)
    dx = cfg.library(x) @ (0.05 * jnp.ones((2, cfg.n_terms))).T
    hp = LBFGSHParams(num_epochs=4, inner_iters=3, lr_sindy=0.5,
                      sindy_reg_type="none", w_sym_reg=0.1, st_freq=2,
                      threshold=1e-3, linesearch=False)

    slow_fn = make_sym_reg_fn(ae_def, params, bstats, spec, g_state,
                              "i", 0.1, 0.01)
    prep, fast_fn = make_symmreg_i_fast(ae_def, params, bstats, spec, g_state,
                                        0.1, 0.01)

    i_s, s_s, e_s = make_lbfgs_stepper(cfg, None, hp, slow_fn)
    i_f, s_f, e_f = make_lbfgs_stepper(cfg, None, hp, fast_fn,
                                       sym_reg_prep=prep, epochs_per_call=2)
    key = jax.random.PRNGKey(11)
    c_s = i_s(x, dx, key)
    for e in range(hp.num_epochs):
        c_s = s_s(c_s, e)
    c_f = i_f(x, dx, key)
    for e in range(0, hp.num_epochs, 2):
        c_f = s_f(c_f, e)
    Xi_s, m_s = e_s(c_s)
    Xi_f, m_f = e_f(c_f)
    np.testing.assert_allclose(np.asarray(Xi_f), np.asarray(Xi_s),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_f), np.asarray(m_s))


def test_fused_rollout_matches_fast():
    """The fused rollout+tangent penalty (fused_rollout_lib) is a pure
    restructuring of the fast path: same value and gradient, taking the
    masked coefficient matrix instead of a closure."""
    ae_def, params, bstats, spec, g_state, cfg, x, Xi = _setup(seed=5)
    mask = (jnp.abs(Xi) > 0.02).astype(jnp.float32)

    prep, fast_fn = make_symmreg_i_fast(ae_def, params, bstats, spec, g_state,
                                        0.1, 0.01)
    prep_f, fused_fn = make_symmreg_i_fast(ae_def, params, bstats, spec,
                                           g_state, 0.1, 0.01,
                                           fused_rollout_lib=cfg.library)
    assert getattr(fused_fn, "wants_coefs", False)
    ctx, ctx_f = prep(x), prep_f(x)

    def loss_fast(Xi):
        return fast_fn(lambda q: cfg.library(q) @ (Xi * mask).T, x, ctx)

    def loss_fused(Xi):
        return fused_fn(Xi * mask, x, ctx_f)

    v0, g0 = jax.value_and_grad(loss_fast)(Xi)
    v1, g1 = jax.value_and_grad(loss_fused)(Xi)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-7)


def test_fused_rollout_stepper_matches_fast_stepper():
    """make_lbfgs_stepper dispatches on wants_coefs; the full protocol must
    land on the same coefficients/mask as the closure-based fast path."""
    from symmetry_ode_discovery_tpu.training.siged import (
        LBFGSHParams, make_lbfgs_stepper,
    )

    ae_def, params, bstats, spec, g_state, cfg, x, _ = _setup(seed=9)
    dx = cfg.library(x) @ (0.05 * jnp.ones((2, cfg.n_terms))).T
    hp = LBFGSHParams(num_epochs=4, inner_iters=3, lr_sindy=0.5,
                      sindy_reg_type="none", w_sym_reg=0.1, st_freq=2,
                      threshold=1e-3, linesearch=False)

    prep, fast_fn = make_symmreg_i_fast(ae_def, params, bstats, spec, g_state,
                                        0.1, 0.01)
    prep_f, fused_fn = make_symmreg_i_fast(ae_def, params, bstats, spec,
                                           g_state, 0.1, 0.01,
                                           fused_rollout_lib=cfg.library)
    i_a, s_a, e_a = make_lbfgs_stepper(cfg, None, hp, fast_fn,
                                       sym_reg_prep=prep, epochs_per_call=2)
    i_b, s_b, e_b = make_lbfgs_stepper(cfg, None, hp, fused_fn,
                                       sym_reg_prep=prep_f, epochs_per_call=2)
    key = jax.random.PRNGKey(13)
    c_a, c_b = i_a(x, dx, key), i_b(x, dx, key)
    for e in range(0, hp.num_epochs, 2):
        c_a, c_b = s_a(c_a, e), s_b(c_b, e)
    Xi_a, m_a = e_a(c_a)
    Xi_b, m_b = e_b(c_b)
    np.testing.assert_allclose(np.asarray(Xi_b), np.asarray(Xi_a),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_b), np.asarray(m_a))


def test_euler_pair_matches_composed():
    """ops/integrators.make_euler_pair == (odeint, jvp(odeint)) in value and
    in gradients through a downstream scalar loss."""
    from symmetry_ode_discovery_tpu.ops.integrators import (make_euler_pair,
                                                            odeint)

    cfg, _ = __import__(
        "symmetry_ode_discovery_tpu.models.sindy", fromlist=["make_config"]
    ).make_config(2, poly_order=2, include_exp=True)
    lib = cfg.library
    k = jax.random.PRNGKey(17)
    x = jax.random.normal(k, (16, 2))
    v = jax.random.normal(jax.random.fold_in(k, 1), (16, 2))
    Xi = 0.1 * jax.random.normal(jax.random.fold_in(k, 2), (2, cfg.n_terms))
    ep = make_euler_pair(lambda A: (lambda q: lib(q) @ A), 10, 0.01)

    def composed(q):
        return odeint(lambda qq: lib(qq) @ Xi.T, q, 0.1, 0.01)

    fx, iv = ep(x, v, Xi.T)
    np.testing.assert_array_equal(np.asarray(fx), np.asarray(composed(x)))
    np.testing.assert_allclose(np.asarray(iv),
                               np.asarray(jax.jvp(composed, (x,), (v,))[1]),
                               rtol=1e-6, atol=1e-7)

    def loss_pair(Xi, x, v):
        fx, iv = ep(x, v, Xi.T)
        return jnp.mean(fx * iv) + jnp.mean(iv ** 2)

    def loss_comp(Xi, x, v):
        f = lambda q: odeint(lambda qq: lib(qq) @ Xi.T, q, 0.1, 0.01)
        return jnp.mean(f(x) * jax.jvp(f, (x,), (v,))[1]) \
            + jnp.mean(jax.jvp(f, (x,), (v,))[1] ** 2)

    gp = jax.grad(loss_pair, argnums=(0, 1, 2))(Xi, x, v)
    gc = jax.grad(loss_comp, argnums=(0, 1, 2))(Xi, x, v)
    for a, b in zip(gp, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

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

"""Parity of the Pallas two-loop L-BFGS direction engine vs optax.

The kernel (ops/pallas_lbfgs_dir.py) must reproduce optax.scale_by_lbfgs
update-for-update — same memory rules, same gamma, same two-loop order —
so the torch-faithfulness established for the optax path
(test_sweep.py::test_optax_lbfgs_matches_torch_trajectory) carries over.
Runs in interpret mode on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from symmetry_ode_discovery_tpu.models.sindy import make_config
from symmetry_ode_discovery_tpu.ops.pallas_lbfgs_dir import lbfgs_pallas
from symmetry_ode_discovery_tpu.training.siged import (
    LBFGSHParams, train_sindy_lbfgs)


def test_transform_matches_optax_on_random_stream():
    """Feed both transformations the SAME synthetic (grad, params) stream
    (params evolved by optax's own updates) — directions must agree at f32
    rounding through memory fill, wraparound, and gamma changes."""
    m = 7
    opt_ref = optax.lbfgs(0.37, linesearch=None, memory_size=m)
    opt_pal = lbfgs_pallas(0.37, memory_size=m, interpret=True)

    params = {"Xi": jnp.asarray(np.random.default_rng(0)
                                .standard_normal((2, 5)), jnp.float32),
              "const": jnp.asarray([[0.3], [-0.1]], jnp.float32)}
    s_ref, s_pal = opt_ref.init(params), opt_pal.init(params)
    assert int(s_pal[0].count) == 0  # callers read opt_state[0].count

    p_ref = p_pal = params
    rng = np.random.default_rng(1)
    step_ref = jax.jit(opt_ref.update)
    step_pal = jax.jit(opt_pal.update)
    for i in range(2 * m + 3):  # fill + wrap the ring buffer
        # a synthetic but curvature-consistent gradient stream
        g = jax.tree_util.tree_map(
            lambda p: 0.9 * p + jnp.asarray(
                0.05 * rng.standard_normal(p.shape), jnp.float32), p_ref)
        u_ref, s_ref = step_ref(g, s_ref, p_ref)
        u_pal, s_pal = step_pal(g, s_pal, p_pal)
        for a, b in zip(jax.tree_util.tree_leaves(u_ref),
                        jax.tree_util.tree_leaves(u_pal)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6), i
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_pal = optax.apply_updates(p_pal, u_pal)
    assert int(s_pal[0].count) == 2 * m + 3


def test_full_fit_matches_xla_backend():
    """train_sindy_lbfgs with dir_backend='pallas' lands on the same
    discovered equation as the optax backend (dosc linear system)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((256, 2)), jnp.float32)
    A = jnp.asarray(np.array([[-0.1, -1.0], [1.0, -0.1]], np.float32))
    dx = x @ A.T
    cfg, _ = make_config(2, poly_order=2)
    key = jax.random.PRNGKey(0)
    hps = [LBFGSHParams(num_epochs=12, lr_sindy=1.0, sindy_reg_type="none",
                        st_freq=6, threshold=5e-2, dir_backend=be)
           for be in ("xla", "pallas")]
    res = [train_sindy_lbfgs(cfg, None, x, dx, hp, key) for hp in hps]
    np.testing.assert_array_equal(np.asarray(res[0].mask),
                                  np.asarray(res[1].mask))
    np.testing.assert_allclose(np.asarray(res[0].Xi), np.asarray(res[1].Xi),
                               rtol=1e-4, atol=1e-5)
    # and it actually discovered the system
    truth_mask = np.zeros((2, 6)); truth_mask[0, 1:3] = 1; truth_mask[1, 1:3] = 1
    np.testing.assert_array_equal(np.asarray(res[1].mask), truth_mask)


def test_symreg_stepper_matches_xla_backend():
    """The host-stepped symreg driver (the flagship path) produces the same
    trajectory under both direction engines."""
    from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.training.siged import make_lbfgs_stepper
    from symmetry_ode_discovery_tpu.training.symmreg import make_symmreg_i_fast

    ae_def = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=16,
                            latent_dim=2, n_layers=2, n_comps=2,
                            batch_norm=True, ortho_ae=True)
    ae_params, ae_bstats = ae_def.init(jax.random.PRNGKey(3))
    spec = lg.parse_repr("(2,1,2)", "0")
    g_state = lg.init_generator(jax.random.PRNGKey(4), spec)
    cfg, _ = make_config(2, poly_order=2)
    prep, pen = make_symmreg_i_fast(ae_def, ae_params, ae_bstats, spec,
                                    g_state, 0.1, 0.05,
                                    fused_rollout_lib=cfg.library)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((64, 2)), jnp.float32)
    dx = x @ jnp.asarray(np.array([[-0.1, -1.0], [1.0, -0.1]], np.float32)).T
    key = jax.random.PRNGKey(1)

    outs = []
    for be in ("xla", "pallas"):
        hp = LBFGSHParams(num_epochs=6, inner_iters=5, sindy_reg_type="none",
                          st_freq=3, threshold=5e-2, w_sym_reg=0.1,
                          dir_backend=be)
        init_f, step_f, ext_f = make_lbfgs_stepper(cfg, None, hp, pen,
                                                   sym_reg_prep=prep,
                                                   epochs_per_call=3)
        carry = jax.jit(init_f)(x, dx, key)
        step_j = jax.jit(step_f)
        for e in range(0, 6, 3):
            carry = step_j(carry, e)
        outs.append(jax.jit(ext_f)(carry))
    np.testing.assert_array_equal(np.asarray(outs[0][1]), np.asarray(outs[1][1]))
    np.testing.assert_allclose(np.asarray(outs[0][0]), np.asarray(outs[1][0]),
                               rtol=2e-4, atol=2e-5)


def test_vmapped_direction_matches_single():
    """The custom_vmap sublane-batched kernel equals per-seed calls."""
    from symmetry_ode_discovery_tpu.ops.pallas_lbfgs_dir import (
        two_loop_direction)

    rng = np.random.default_rng(9)
    B, m, n = 5, 11, 17
    g = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, m, n)), jnp.float32)
    rho = jnp.asarray(rng.uniform(0, 2, (B, m)), jnp.float32)
    gam = jnp.asarray(rng.uniform(0.5, 1.5, B), jnp.float32)

    f = lambda *a: two_loop_direction(*a, interpret=True)
    batched = jax.jit(jax.vmap(f))(g, s, y, rho, gam)
    for b in range(B):
        single = jax.jit(f)(g[b], s[b], y[b], rho[b], gam[b])
        np.testing.assert_allclose(np.asarray(batched[b]), np.asarray(single),
                                   rtol=1e-6, atol=1e-7)


def test_vmapped_stepper_matches_xla_backend():
    """The vmapped (sweep-shaped) symreg stepper agrees across backends —
    this is the path the flagship sweep actually runs."""
    from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.training.siged import make_lbfgs_stepper
    from symmetry_ode_discovery_tpu.training.symmreg import make_symmreg_i_fast

    ae_def = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=16,
                            latent_dim=2, n_layers=2, n_comps=2,
                            batch_norm=True, ortho_ae=True)
    ae_params, ae_bstats = ae_def.init(jax.random.PRNGKey(3))
    spec = lg.parse_repr("(2,1,2)", "0")
    g_state = lg.init_generator(jax.random.PRNGKey(4), spec)
    cfg, _ = make_config(2, poly_order=2)
    prep, pen = make_symmreg_i_fast(ae_def, ae_params, ae_bstats, spec,
                                    g_state, 0.1, 0.05,
                                    fused_rollout_lib=cfg.library)
    rng = np.random.default_rng(6)
    xs = jnp.asarray(rng.standard_normal((3, 48, 2)), jnp.float32)
    A = jnp.asarray(np.array([[-0.1, -1.0], [1.0, -0.1]], np.float32))
    dxs = xs @ A.T
    keys = jax.random.split(jax.random.PRNGKey(2), 3)

    outs = []
    for be in ("xla", "pallas"):
        hp = LBFGSHParams(num_epochs=4, inner_iters=4, sindy_reg_type="none",
                          st_freq=2, threshold=5e-2, w_sym_reg=0.1,
                          dir_backend=be)
        init_f, step_f, ext_f = make_lbfgs_stepper(cfg, None, hp, pen,
                                                   sym_reg_prep=prep,
                                                   epochs_per_call=2)
        carry = jax.jit(jax.vmap(init_f))(xs, dxs, keys)
        step_j = jax.jit(jax.vmap(step_f, in_axes=(0, None)))
        for e in range(0, 4, 2):
            carry = step_j(carry, e)
        outs.append(jax.jit(jax.vmap(ext_f))(carry))
    np.testing.assert_array_equal(np.asarray(outs[0][1]), np.asarray(outs[1][1]))
    np.testing.assert_allclose(np.asarray(outs[0][0]), np.asarray(outs[1][0]),
                               rtol=2e-4, atol=2e-5)

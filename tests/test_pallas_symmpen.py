"""Fused frozen-AE penalty kernels (ops/pallas_symmpen.py) vs the autodiff
reference path — folding exactness, forward/VJP equality (interpret mode on
the CPU test backend), and vmap compatibility (the kernels run under the
per-seed vmap of the sweep closure)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
from symmetry_ode_discovery_tpu.ops.pallas_symmpen import (
    fold_decoder, fold_encoder, make_dec_jvp, make_enc_apply, mlp_ref)


@pytest.fixture(scope="module")
def ae():
    ae_def = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=64,
                            latent_dim=2, n_layers=3, n_comps=2,
                            batch_norm=True, ortho_ae=True)
    params, bstats = ae_def.init(jax.random.PRNGKey(0))
    return ae_def, params, bstats


def test_fold_encoder_matches_eval_encode(ae):
    ae_def, params, bstats = ae
    zm = ae_def.encoder_final_bias(params)
    folded = fold_encoder(ae_def, params, bstats, z_mean=zm)
    x = jax.random.normal(jax.random.PRNGKey(1), (37, 2))
    want = ae_def.encode(params, bstats, x, train=False)[0] - zm
    got = mlp_ref(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fold_decoder_matches_decode(ae):
    ae_def, params, _ = ae
    folded = fold_decoder(ae_def, params)
    z = jax.random.normal(jax.random.PRNGKey(2), (23, 2))
    np.testing.assert_allclose(np.asarray(mlp_ref(folded, z)),
                               np.asarray(ae_def.decode(params, z)),
                               rtol=1e-5, atol=1e-6)


def test_enc_kernel_value_and_grad(ae):
    ae_def, params, bstats = ae
    folded = fold_encoder(ae_def, params, bstats,
                          z_mean=ae_def.encoder_final_bias(params))
    enc = make_enc_apply(folded, dtype=jnp.float32, interpret=True,
                         row_tile=32)
    x = jax.random.normal(jax.random.PRNGKey(3), (70, 2))  # pads to 3 tiles

    np.testing.assert_allclose(np.asarray(enc(x)),
                               np.asarray(mlp_ref(folded, x)),
                               rtol=1e-5, atol=1e-6)

    def scalar_k(x):
        return jnp.sum(jnp.sin(enc(x) * 3.0))

    def scalar_r(x):
        return jnp.sum(jnp.sin(mlp_ref(folded, x) * 3.0))

    gk = jax.grad(scalar_k)(x)
    gr = jax.grad(scalar_r)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


def test_dec_jvp_kernel_value_and_grad(ae):
    ae_def, params, _ = ae
    folded = fold_decoder(ae_def, params)
    djvp = make_dec_jvp(folded, dtype=jnp.float32, interpret=True,
                        row_tile=32)
    key = jax.random.PRNGKey(4)
    z = jax.random.normal(key, (50, 2))
    u = jax.random.normal(jax.random.fold_in(key, 1), (50, 2))

    def ref(z, u):
        return jax.jvp(lambda zz: mlp_ref(folded, zz), (z,), (u,))[1]

    np.testing.assert_allclose(np.asarray(djvp(z, u)), np.asarray(ref(z, u)),
                               rtol=1e-5, atol=1e-6)

    # grads w.r.t. BOTH inputs must match autodiff (for ReLU the z-grad of
    # the tangent output is exactly zero a.e. — the kernel hard-codes that)
    def lk(z, u):
        return jnp.mean((djvp(z, u) - 0.3) ** 2)

    def lr(z, u):
        return jnp.mean((ref(z, u) - 0.3) ** 2)

    gzk, guk = jax.grad(lk, argnums=(0, 1))(z, u)
    gzr, gur = jax.grad(lr, argnums=(0, 1))(z, u)
    np.testing.assert_allclose(np.asarray(guk), np.asarray(gur),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gzk), np.asarray(gzr),
                               rtol=1e-4, atol=1e-5)


def test_fused_penalty_matches_autodiff_path(ae):
    """make_symmreg_i_fast(pallas=True) is the same loss: value and grad
    w.r.t. the SINDy coefficients must match the autodiff fast path."""
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training.symmreg import make_symmreg_i_fast

    ae_def, params, bstats = ae
    spec = lg.parse_repr("(2,1,2)", "0")
    g_state = lg.init_generator(jax.random.PRNGKey(10), spec)
    cfg, _ = make_config(2, poly_order=2)
    x = jax.random.normal(jax.random.PRNGKey(11), (70, 2))
    Xi = 0.1 * jax.random.normal(jax.random.PRNGKey(12), (2, cfg.n_terms))

    prep_a, pen_a = make_symmreg_i_fast(ae_def, params, bstats, spec,
                                        g_state, 0.1, 0.01)
    prep_p, pen_p = make_symmreg_i_fast(ae_def, params, bstats, spec,
                                        g_state, 0.1, 0.01,
                                        ae_dtype=jnp.float32, pallas=True,
                                        pallas_interpret=True)
    ctx_a, ctx_p = prep_a(x), prep_p(x)

    def la(Xi):
        return pen_a(lambda q: cfg.library(q) @ Xi.T, x, ctx_a)

    def lp(Xi):
        return pen_p(lambda q: cfg.library(q) @ Xi.T, x, ctx_p)

    v_a, g_a = jax.value_and_grad(la)(Xi)
    v_p, g_p = jax.value_and_grad(lp)(Xi)
    np.testing.assert_allclose(float(v_p), float(v_a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_a),
                               rtol=1e-4, atol=1e-6)


def test_kernels_under_vmap(ae):
    """The penalty runs inside a per-seed vmapped closure."""
    ae_def, params, bstats = ae
    folded = fold_encoder(ae_def, params, bstats,
                          z_mean=ae_def.encoder_final_bias(params))
    enc = make_enc_apply(folded, dtype=jnp.float32, interpret=True,
                         row_tile=32)
    xs = jax.random.normal(jax.random.PRNGKey(5), (3, 40, 2))

    got = jax.vmap(enc)(xs)
    want = jax.vmap(lambda x: mlp_ref(folded, x))(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    g = jax.grad(lambda xs: jnp.sum(jax.vmap(enc)(xs) ** 2))(xs)
    gr = jax.grad(lambda xs: jnp.sum(jax.vmap(
        lambda x: mlp_ref(folded, x))(xs) ** 2))(xs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)

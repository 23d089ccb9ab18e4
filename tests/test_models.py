"""Tests for the LaLiGAN model family: autoencoder, Lie generator,
discriminator, symmetry-regularization losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
from symmetry_ode_discovery_tpu.models.discriminator import Discriminator
from symmetry_ode_discovery_tpu.models import lie_generator as lg
from symmetry_ode_discovery_tpu.training import symmreg


def test_parse_repr_learned():
    spec = lg.parse_repr("(2,1,2)", "0")
    assert spec.n_dims == 4
    b = spec.blocks[0]
    assert b.n_comps == 2 and b.n_channels == 1 and b.block_dim == 2 and b.learnable


def test_parse_repr_fixed_groups():
    for s, dims in [("(1,so2)", 2), ("(2,sim2)", 4), ("(1,scaling2)", 2),
                    ("(1,so3)", 3), ("(1,so3+1)", 4), ("(1,so4)", 4), ("(1,so2*r)", 2)]:
        spec = lg.parse_repr(s, "0")
        assert spec.n_dims == dims, s
        assert not spec.blocks[0].learnable


def test_parse_repr_mismatched_group_idx():
    with pytest.raises(ValueError):
        lg.parse_repr("(1,so2)+(1,so2)", "0")


def test_sample_group_element_so2_is_rotation():
    spec = lg.parse_repr("(1,so2)", "0", sigma_init=1.0)
    state = lg.init_generator(jax.random.PRNGKey(0), spec)
    g = lg.sample_group_element(spec, state, jax.random.PRNGKey(1), 16)
    assert g.shape == (16, 2, 2)
    eye = jnp.einsum("bij,bkj->bik", g, g)  # g g^T
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(2), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(g)), 1.0, atol=1e-5)


def test_sample_group_element_shared_blocks():
    """'(2,1,2)': both 2x2 blocks see the same z AND the same Li -> equal."""
    spec = lg.parse_repr("(2,1,2)", "0")
    state = lg.init_generator(jax.random.PRNGKey(0), spec)
    g = lg.sample_group_element(spec, state, jax.random.PRNGKey(1), 4)
    assert g.shape == (4, 4, 4)
    np.testing.assert_allclose(np.asarray(g[:, :2, :2]), np.asarray(g[:, 2:, 2:]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[:, :2, 2:]), 0.0)


def test_full_basis_block_structure():
    spec = lg.parse_repr("(2,so2)", "0")
    state = lg.init_generator(jax.random.PRNGKey(0), spec)
    basis = lg.get_full_basis_list(spec, state)
    assert len(basis) == 1
    L = np.asarray(basis[0])
    R = np.array([[0.0, 1.0], [-1.0, 0.0]])
    np.testing.assert_allclose(L[:2, :2], R)
    np.testing.assert_allclose(L[2:, 2:], R)
    np.testing.assert_allclose(L[:2, 2:], 0.0)


def test_generator_threshold_monotone():
    spec = lg.parse_repr("(2,1,2)", "0")
    state = lg.init_generator(jax.random.PRNGKey(0), spec)
    s1 = lg.set_threshold(spec, state, 0.9)
    s2 = lg.set_threshold(spec, s1, 0.01)
    assert np.all(np.asarray(s2.masks[0]) <= np.asarray(s1.masks[0]))
    # the channel max always survives its own threshold < 1
    assert np.asarray(s1.masks[0]).sum() >= 1


def test_reg_norm_zero_for_large_Li():
    spec = lg.parse_repr("(1,1,2)", "0")
    state = lg.init_generator(jax.random.PRNGKey(0), spec)
    big = (jnp.ones((1, 2, 2)) * 10.0,)
    state = state.replace(Li=big)
    assert float(lg.reg_norm(spec, state)) == 0.0
    small = (jnp.ones((1, 2, 2)) * 0.01,)
    state = state.replace(Li=small)
    assert float(lg.reg_norm(spec, state)) > 0.0


def test_autoencoder_shapes_and_jvp():
    ae = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=32, latent_dim=2,
                        n_layers=2, n_comps=2, batch_norm=True, ortho_ae=True)
    params, bstats = ae.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2, 2))
    z, xhat, new_bs = ae.forward(params, bstats, x, train=True)
    assert z.shape == (8, 2, 2) and xhat.shape == (8, 2, 2)
    # batch stats updated in train mode
    leaves = jax.tree_util.tree_leaves(new_bs)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)
    dz = ae.compute_dz(params, bstats, x, jnp.ones_like(x))
    assert dz.shape == z.shape
    dx = ae.compute_dx(params, z, jnp.ones_like(z))
    assert dx.shape == x.shape
    assert ae.encoder_final_bias(params).shape == (2,)


def test_ortho_dense_orthonormal():
    from symmetry_ode_discovery_tpu.models.mlp import OrthoDense

    m = OrthoDense(3)
    params = m.init(jax.random.PRNGKey(0), jnp.ones((1, 8)))
    V = params["params"]["V"]
    Q, R = jnp.linalg.qr(V)
    Q = Q * jnp.sign(jnp.diagonal(R))[None, :]
    np.testing.assert_allclose(np.asarray(Q.T @ Q), np.eye(3), atol=1e-5)


def test_discriminator_output_range():
    d = Discriminator(hidden_dim=16, n_layers=2)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 2))
    params = d.init(jax.random.PRNGKey(1), z, None, None)["params"]
    out = d.apply({"params": params}, z, None, None)
    assert out.shape == (4, 1)
    assert np.all((np.asarray(out) > 0) & (np.asarray(out) < 1))


def _identity_ae():
    return AutoEncoderDef(ae_arch="none", input_dim=2, latent_dim=2, n_comps=2)


def test_symmreg_i_zero_for_equivariant_f():
    """With identity AE and f(x) = aI + bR (commutes with the so2 action),
    the infinitesimal symmetry loss vanishes."""
    ae = _identity_ae()
    spec = lg.parse_repr("(2,so2)", "0")
    g_state = lg.init_generator(jax.random.PRNGKey(0), spec)
    A = 0.3 * jnp.eye(2) + 0.7 * jnp.array([[0.0, -1.0], [1.0, 0.0]])

    def f(x):  # (B, 2) -> (B, 2), applied per component
        return x @ A.T

    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    fx = f(x)
    x_fx = jnp.stack([x, fx], axis=1)
    loss = symmreg.symmreg_i(ae, {}, {}, spec, g_state, x_fx, f=f,
                             normalize="in_batch", relative=False)
    assert float(loss) < 1e-10


def test_symmreg_i_nonzero_for_nonequivariant_f():
    ae = _identity_ae()
    spec = lg.parse_repr("(2,so2)", "0")
    g_state = lg.init_generator(jax.random.PRNGKey(0), spec)
    A = jnp.array([[1.0, 0.0], [0.0, -2.0]])  # does not commute with R

    def f(x):
        return x @ A.T

    x = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    x_fx = jnp.stack([x, f(x)], axis=1)
    loss = symmreg.symmreg_i(ae, {}, {}, spec, g_state, x_fx, f=f,
                             normalize="in_batch", relative=False)
    assert float(loss) > 1e-3


def test_symmreg_r_zero_for_equivariant_h():
    """Reversed loss: h(x) = a x rotations-equivariant under so2 action with
    identity AE and no normalization."""
    ae = _identity_ae()
    spec = lg.parse_repr("(2,so2)", "0", sigma_init=1.0)
    g_state = lg.init_generator(jax.random.PRNGKey(0), spec)

    def h(x):
        return x @ jnp.array([[0.0, -1.0], [1.0, 0.0]]).T

    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    loss = symmreg.symmreg_r(ae, {}, {}, spec, g_state, x, h, normalize="none",
                             scale=0.5)
    assert float(loss) < 1e-9


def test_precompute_symmreg_r_shapes():
    ae = _identity_ae()
    spec = lg.parse_repr("(2,so2)", "0")
    g_state = lg.init_generator(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    gx, Jgx = symmreg.precompute_symmreg_r(ae, {}, {}, spec, g_state, x,
                                           z_mean=jnp.zeros(2))
    assert len(gx) == 1 and gx[0].shape == (8, 2)
    assert Jgx[0].shape == (8, 2, 2)


def test_generator_int_param_rounding():
    """int_param reparameterization rounds Li to an integer grid (reference
    gan.py:9-17,289-291)."""
    spec = lg.parse_repr("(1,1,2)", "0", int_param=True, int_param_max=2,
                         int_param_noise=0.0)
    state = lg.init_generator(jax.random.PRNGKey(0), spec)
    state = state.replace(Li=(jnp.array([[[0.3, -0.6], [1.2, 0.05]]]),))
    g = lg.sample_group_element(spec, state, jax.random.PRNGKey(1), 4)
    assert np.isfinite(np.asarray(g)).all()
    from symmetry_ode_discovery_tpu.models.lie_generator import _effective_Li

    # sampling context (int_round=True): round(2 * Li) clipped to [-2, 2]
    L = np.asarray(_effective_Li(spec, state, 0, int_round=True))
    np.testing.assert_allclose(L, [[[1.0, -1.0], [2.0, 0.0]]])
    # every other context (regularizers / basis export, reference
    # gan.py:199-229,306-330) uses the CONTINUOUS f(Li) * mask
    L_cont = np.asarray(_effective_Li(spec, state, 0))
    np.testing.assert_allclose(L_cont, [[[0.3, -0.6], [1.2, 0.05]]], atol=1e-7)


def test_generator_uniform_coef_dist():
    """Uniform amplitude comes from sigma (= sigma_init), NOT uniform_max:
    the reference binds self.sigma[i] to the sampling params slot
    (gan.py:286,354-356) and never reads kwargs['uniform_max']."""
    spec = lg.parse_repr("(1,so2)", "0", coef_dist="uniform", sigma_init=0.5,
                         uniform_max=123.0)
    state = lg.init_generator(jax.random.PRNGKey(0), spec)
    z = lg.sample_coefficient(spec, jax.random.PRNGKey(1), 1000, 1,
                              state.sigma[0])
    z = np.asarray(z)
    assert z.min() >= -0.5 and z.max() <= 0.5
    assert abs(z.mean()) < 0.05


def test_discriminator_with_invariant_label():
    d = Discriminator(hidden_dim=16, n_layers=2, use_invariant_y=True,
                      embed_y=True, y_classes=3, y_embed_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 2))
    y = jnp.array([0, 1, 2, 1])
    params = d.init(jax.random.PRNGKey(1), z, y, None)["params"]
    out = d.apply({"params": params}, z, y, None)
    assert out.shape == (4, 1)


def test_mlp_split_roundtrip():
    """ae_arch='mlp_split': each half-submodule must emit HALF the latent so
    encode->decode closes at (latent_dim, input_dim) — giving each half the
    full latent_dim crashed every mlp_split forward with a shape error."""
    from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef

    ae = AutoEncoderDef(ae_arch="mlp_split", input_dim=4, hidden_dim=16,
                        latent_dim=2, n_layers=2, n_comps=1)
    params, bstats = ae.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    z, _ = ae.encode(params, bstats, x, train=False)
    assert z.shape == (8, 2)
    xr = ae.decode(params, z)
    assert xr.shape == x.shape


def test_uniform_int_grid_jits():
    """coef_dist='uniform_int_grid' must trace (the training epoch is one
    jitted program): the bound reads the live sigma via traced randint
    bounds, not an eager int()."""
    from symmetry_ode_discovery_tpu.models import lie_generator as lg

    spec = lg.parse_repr("(2,1,2)", "0", coef_dist="uniform_int_grid",
                         sigma_init=3.0)
    st = lg.init_generator(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2, 2))

    @jax.jit
    def fwd(st, key, x):
        return lg.generator_forward(spec, st, key, x)

    out = fwd(st, jax.random.PRNGKey(2), x)
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(out)[0])).all()


def test_dataset_cache_miss_roundtrip(tmp_path):
    """The loader's cache-MISS branch (generate + save + reload): test
    fixtures usually pre-populate caches, leaving this path uncovered —
    it must produce the same draw the gen CLI would write."""
    from symmetry_ode_discovery_tpu.data.datasets import ODEDataset

    ds = ODEDataset.make("dosc", "val", noise=0.0, path=str(tmp_path), n_ics=3)
    assert ds.x.shape == (300, 2) and np.isfinite(np.asarray(ds.x)).all()
    ds2 = ODEDataset.make("dosc", "val", noise=0.0, path=str(tmp_path), n_ics=3)
    np.testing.assert_array_equal(np.asarray(ds.x), np.asarray(ds2.x))


def test_activation_args_match_torch():
    """activation_args must reach the activation like the reference's
    torch module ctors: nn.ELU(alpha), nn.Softplus(beta, threshold)."""
    torch = pytest.importorskip("torch")

    from symmetry_ode_discovery_tpu.models.mlp import get_activation

    x = np.linspace(-30.0, 30.0, 301).astype(np.float32)
    xt = torch.tensor(x)
    cases = [
        ("ELU", (0.5,), torch.nn.ELU(0.5)),
        ("ELU", (), torch.nn.ELU()),
        ("Softplus", (2.0, 10.0), torch.nn.Softplus(2.0, 10.0)),
        ("Softplus", (), torch.nn.Softplus()),
        ("LeakyReLU", (0.2,), torch.nn.LeakyReLU(0.2)),
    ]
    for name, args, ref in cases:
        ours = np.asarray(get_activation(name, args)(jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref(xt).numpy(), atol=1e-6,
                                   err_msg=f"{name}{args}")
    with pytest.raises(ValueError):
        get_activation("ReLU", (0.1,))

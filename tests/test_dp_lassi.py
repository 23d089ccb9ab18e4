"""Data-parallel LaLiGAN training (LassiTrainer dp_mesh, SURVEY.md §5's
'pjit batch-sharded AE/GAN training over ICI').

The DP path is the SAME epoch program annotated with a batch-axis
with_sharding_constraint, so semantics must match single-device training up
to floating-point reduction order — verified over several epochs on the
8-device CPU mesh, including the joint SINDy-in-latent (lstsq) path whose
live Q recomputation is the RD protocol (reference train.py:138-170)."""

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
from symmetry_ode_discovery_tpu.models.discriminator import Discriminator
from symmetry_ode_discovery_tpu.models import lie_generator as lg
from symmetry_ode_discovery_tpu.parallel.mesh import make_mesh
from symmetry_ode_discovery_tpu.training.lassi import (
    LassiHParams, LassiTrainer, train_lassi)

from test_lassi import _mt_data


def _models(include_sindy=False):
    ae = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=32, latent_dim=2,
                        n_layers=2, n_comps=2, batch_norm=True, ortho_ae=True)
    spec = lg.parse_repr("(2,1,2)", "0")
    disc = Discriminator(hidden_dim=32, n_layers=2)
    hp = LassiHParams(num_epochs=3, batch_size=128, gan_st_freq=2,
                      gan_st_thres=0.1, w_gan=0.01, w_reg_norm=0.01,
                      include_sindy=include_sindy, eq_constraint=include_sindy,
                      w_sindy_x=0.0 if include_sindy else 0.1,
                      w_sindy_z=1e-3)
    return ae, spec, disc, hp


def _run(dp_mesh, include_sindy=False):
    x = _mt_data()
    ae, spec, disc, hp = _models(include_sindy)
    trainer = LassiTrainer(ae, spec, disc, hp, dp_mesh=dp_mesh)
    bundle, bstats, sc, history = train_lassi(
        trainer, x, None, jax.random.PRNGKey(0), dx_train=x,
        verbose=False)
    return bundle, bstats, sc, history


def test_dp_matches_single_device():
    assert len(jax.devices()) == 8
    b1, bs1, _, h1 = _run(None)
    b8, bs8, _, h8 = _run(make_mesh(8, axis="batch"))
    # identical program, different reduction layout -> tight tolerance
    for m1, m8 in zip(h1, h8):
        for k in m1:
            np.testing.assert_allclose(m8[k], m1[k], rtol=5e-3, atol=1e-5,
                                       err_msg=k)
    # Per-leaf comparison is dominated by near-zero biases whose reduction-
    # order noise is amplified over 3 adversarial epochs; the meaningful
    # invariant is that the parameter trajectories stay together globally
    # (measured 0.17% after 3 epochs).
    def rel_l2(a, b):
        va = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(a)])
        vb = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(b)])
        return np.linalg.norm(vb - va) / np.linalg.norm(va)

    assert rel_l2(b1["ae"], b8["ae"]) < 0.02
    # BatchNorm running stats are GLOBAL batch statistics in DP too
    assert rel_l2(bs1, bs8) < 0.02


def test_dp_joint_sindy_lstsq():
    """The RD joint path (latent lstsq + live Q) under batch sharding."""
    assert len(jax.devices()) == 8
    b1, _, sc1, h1 = _run(None, include_sindy=True)
    b8, _, sc8, h8 = _run(make_mesh(8, axis="batch"), include_sindy=True)
    for m1, m8 in zip(h1, h8):
        assert np.isfinite(m8["loss_sindy_z"])
        np.testing.assert_allclose(m8["loss_sindy_z"], m1["loss_sindy_z"],
                                   rtol=5e-2, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sc8["mask"]),
                                  np.asarray(sc1["mask"]))
    np.testing.assert_allclose(np.asarray(sc8["Xi"]), np.asarray(sc1["Xi"]),
                               rtol=5e-2, atol=1e-3)

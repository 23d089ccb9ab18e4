"""Periodic training-state checkpoints + mid-run resume (reference
train.py:260-269's epoch-suffixed saves, extended to full-state snapshots).

The decisive property on this tunnel (worker kills at ~3-4 min): a run
interrupted at any save point and resumed must be BIT-IDENTICAL to an
uninterrupted run — params, optimizer state, PRNG stream, and metric history.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
from symmetry_ode_discovery_tpu.models.discriminator import Discriminator
from symmetry_ode_discovery_tpu.models import lie_generator as lg
from symmetry_ode_discovery_tpu.training.lassi import (
    LassiHParams, LassiTrainer, train_lassi)
from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt


def _mt_data(n=256):
    rng = np.random.default_rng(0)
    r = rng.uniform(0.5, 2.0, size=n)
    th = rng.uniform(0, 2 * np.pi, size=n)
    x0 = np.stack([r * np.cos(th), r * np.sin(th)], axis=1)
    x1 = np.stack([r * np.cos(th + 0.5), r * np.sin(th + 0.5)], axis=1)
    return jnp.asarray(np.stack([x0, x1], axis=1), jnp.float32)


def _setup(num_epochs):
    ae = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=16, latent_dim=2,
                        n_layers=2, n_comps=2, batch_norm=True, ortho_ae=True)
    spec = lg.parse_repr("(2,1,2)", "0")
    disc = Discriminator(hidden_dim=16, n_layers=2)
    hp = LassiHParams(num_epochs=num_epochs, batch_size=128, gan_st_freq=2,
                      gan_st_thres=0.1, w_gan=0.01, w_reg_norm=0.01)
    return LassiTrainer(ae, spec, disc, hp)


def _assert_tree_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_interrupted_resume_bit_identical(tmp_path, monkeypatch):
    """3 epochs + interruption + resume == 6 uninterrupted epochs, exactly."""
    monkeypatch.chdir(tmp_path)  # checkpoints land under ./saved_models
    x = _mt_data()
    key = jax.random.PRNGKey(7)

    # uninterrupted run
    tr_full = _setup(6)
    bundle_a, bstats_a, _, hist_a = train_lassi(tr_full, x, None, key,
                                                verbose=False)

    # interrupted run: stop after 3 epochs (simulating a worker kill right
    # after the epoch-3 snapshot), then resume to 6 in a fresh trainer
    tr_half = _setup(3)
    train_lassi(tr_half, x, None, key, verbose=False,
                save_interval=1, save_dir="resume-test")
    assert ckpt.latest_train_state("resume-test")[1] == 3
    tr_rest = _setup(6)
    bundle_b, bstats_b, _, hist_b = train_lassi(
        tr_rest, x, None, key, verbose=False,
        save_interval=3, save_dir="resume-test", resume=True)

    assert len(hist_a) == len(hist_b) == 6
    for ha, hb in zip(hist_a, hist_b):
        assert ha == hb
    _assert_tree_equal(bundle_a, bundle_b)
    _assert_tree_equal(bstats_a, bstats_b)
    # the resumed run also wrote its own snapshot at epoch 6
    assert ckpt.latest_train_state("resume-test")[1] == 6


def test_resume_past_completion_is_noop(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    x = _mt_data()
    tr = _setup(2)
    bundle, bstats, _, hist = train_lassi(tr, x, None, jax.random.PRNGKey(1),
                                          verbose=False, save_interval=1,
                                          save_dir="done-test")
    tr2 = _setup(2)
    bundle2, bstats2, _, hist2 = train_lassi(
        tr2, x, None, jax.random.PRNGKey(1), verbose=False,
        save_interval=1, save_dir="done-test", resume=True)
    assert hist == hist2
    _assert_tree_equal(bundle, bundle2)


def test_latest_train_state_picks_max(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert ckpt.latest_train_state("nope") is None
    for ep in (2, 10, 4):
        ckpt.save_train_state(ckpt.train_state_path("d", ep),
                              {"w": np.zeros(3)}, [{"m": 1.0}] * ep)
    path, ep = ckpt.latest_train_state("d")
    assert ep == 10 and path.endswith("train_state_ep00010.npz")
    state, hist = ckpt.load_train_state(path, {"w": np.ones(3)})
    assert len(hist) == 10 and hist[0] == {"m": 1.0}
    np.testing.assert_array_equal(state["w"], np.zeros(3))


def test_prune_keeps_best_by_val(tmp_path, monkeypatch):
    """Round-5 retention rule: the lowest-val snapshot survives pruning even
    when it is no longer among the newest `keep` (the RD GAN's val band is
    volatile — 0.078..0.209 across late epochs — so newest-only retention
    made 'best saved' luck-dependent)."""
    monkeypatch.chdir(tmp_path)
    vals = {10: 0.20, 20: 0.07, 30: 0.15, 40: 0.18, 50: 0.21}
    for ep, v in vals.items():
        ckpt.save_train_state(ckpt.train_state_path("d", ep),
                              {"w": np.zeros(2)}, [], val_metric=v)
    ckpt.prune_train_states("d", keep=2)
    left = sorted(os.listdir("saved_models/d"))
    # newest two (ep 40, 50) plus best-by-val (ep 20)
    assert left == ["train_state_ep00020.npz", "train_state_ep00040.npz",
                    "train_state_ep00050.npz"]
    best = ckpt.best_train_state("d")
    assert best is not None
    path, ep, v = best
    assert ep == 20 and abs(v - 0.07) < 1e-12


def test_prune_without_val_metric_keeps_newest_only(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    for ep in (1, 2, 3, 4):
        ckpt.save_train_state(ckpt.train_state_path("d", ep),
                              {"w": np.zeros(2)}, [])
    ckpt.prune_train_states("d", keep=2)
    assert sorted(os.listdir("saved_models/d")) == [
        "train_state_ep00003.npz", "train_state_ep00004.npz"]
    assert ckpt.best_train_state("d") is None


def _setup_ema(num_epochs, decay=0.9):
    ae = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=16, latent_dim=2,
                        n_layers=2, n_comps=2, batch_norm=True, ortho_ae=True)
    spec = lg.parse_repr("(2,1,2)", "0")
    disc = Discriminator(hidden_dim=16, n_layers=2)
    hp = LassiHParams(num_epochs=num_epochs, batch_size=128, gan_st_freq=2,
                      gan_st_thres=0.1, w_gan=0.01, w_reg_norm=0.01,
                      ae_ema=decay)
    return LassiTrainer(ae, spec, disc, hp)


def test_ae_ema_resume_and_final_swap(tmp_path, monkeypatch):
    """ae_ema > 0: the EMA rides in the snapshot (interrupted+resumed ==
    uninterrupted, bit-identical) and the FINAL returned AE is the EMA, not
    the raw last iterate."""
    monkeypatch.chdir(tmp_path)
    x = _mt_data()
    bundle, _, _, hist = train_lassi(_setup_ema(4), x, None,
                                     jax.random.PRNGKey(1), verbose=False,
                                     save_interval=1, save_dir="ema-a")
    # interrupted at epoch 2, resumed
    train_lassi(_setup_ema(2), x, None, jax.random.PRNGKey(1), verbose=False,
                save_interval=1, save_dir="ema-b")
    bundle2, _, _, hist2 = train_lassi(
        _setup_ema(4), x, None, jax.random.PRNGKey(1), verbose=False,
        save_interval=1, save_dir="ema-b", resume=True)
    assert hist == hist2
    _assert_tree_equal(bundle["ae"], bundle2["ae"])
    # the returned AE is the EMA: it must differ from the raw iterate stored
    # in the last snapshot's bundle, and equal the snapshot's ema_ae
    path, _ = ckpt.latest_train_state("ema-a")
    # load just the two AE trees straight from the npz
    import numpy as _np
    data = _np.load(path, allow_pickle=False)
    raw_keys = [k for k in data.files if k.startswith("['bundle']/['ae']")]
    ema_keys = [k for k in data.files if k.startswith("['ema_ae']")]
    assert ema_keys, "snapshot must carry the EMA tree"
    raw = {k.split("/", 2)[-1]: data[k] for k in raw_keys}
    ema = {k.split("/", 1)[-1]: data[k] for k in ema_keys}
    diffs = [not _np.array_equal(raw[k], ema[k]) for k in ema if k in raw]
    assert any(diffs), "EMA should differ from the raw iterate after 4 epochs"

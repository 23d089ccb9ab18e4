"""SINDy equation discovery by Adam over minibatches (train_SIGED).

Counterpart of reference train.py:382-614: the non-LBFGS equation-discovery
path. Per batch: prediction loss (data space, or latent space through the
frozen autoencoder's JVPs) + optional infinitesimal symmetry penalty on the
latent path (reference train.py:503-507) + L1; sequential thresholding every
st_freq epochs. One jitted epoch = `lax.scan` over permuted batches.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.sindy import SINDyConfig
from .siged import _make_param_fns


@dataclasses.dataclass(frozen=True)
class AdamHParams:
    num_epochs: int = 1000
    batch_size: int = 256
    lr_sindy: float = 1e-3
    w_sindy_z: float = 1e-3
    w_sindy_x: float = 1e-1
    w_sindy_reg: float = 1e-1
    sindy_reg_type: str = "l1"
    w_sym_reg: float = 0.0
    st_freq: int = 100
    threshold: float = 0.1
    use_latent: bool = False


class SIGEDAdamTrainer:
    """use_latent=False: dx_pred = Theta(x) Xi^T (+ odeint symreg hook).
    use_latent=True: regressor acts on z with decode-JVP data loss and the
    per-basis infinitesimal penalty (reference train.py:493-508)."""

    def __init__(self, cfg: SINDyConfig, Q, hp: AdamHParams,
                 sym_reg_fn: Optional[Callable] = None,
                 latent_fns: Optional[dict] = None,
                 basis_list: Optional[list] = None):
        self.cfg = cfg
        self.Q = Q
        self.hp = hp
        self.sym_reg_fn = sym_reg_fn
        self.latent_fns = latent_fns or {}
        self.basis_list = tuple(basis_list) if basis_list else ()
        self.init_params, self.xi_of = _make_param_fns(cfg, Q)
        self.tx = optax.adam(hp.lr_sindy)

    def init(self, key):
        params = self.init_params(key)
        mask = jnp.ones((self.cfg.latent_dim, self.cfg.n_terms))
        return params, mask, self.tx.init(params)

    def loss_fn(self, params, mask, x, dx):
        hp, cfg = self.hp, self.cfg
        Xi = self.xi_of(params) * mask
        metrics = {}
        if hp.use_latent:
            encode = self.latent_fns["encode"]
            compute_dz = self.latent_fns["compute_dz"]
            compute_dx = self.latent_fns["compute_dx"]
            z = encode(x)
            dz = compute_dz(x, dx)
            dz_pred = cfg.library(z) @ Xi.T
            dx_pred = compute_dx(z, dz_pred)
            loss_z = jnp.mean((dz_pred - dz) ** 2)
            loss_x = jnp.mean((dx_pred - dx) ** 2)
            metrics["loss_sindy_z"] = loss_z
            metrics["loss_sindy_x"] = loss_x
            loss = hp.w_sindy_z * loss_z + hp.w_sindy_x * loss_x
            # per-basis infinitesimal penalty (train.py:503-507)
            if hp.w_sym_reg > 0.0 and self.basis_list:
                sym = 0.0
                for v in self.basis_list:
                    def f(zz):
                        return cfg.library(zz) @ Xi.T
                    jv = jax.jvp(f, (z,), (jnp.einsum("ij,bj->bi", v, z),))[1]
                    sym = sym + jnp.sum((jv - jnp.einsum("ij,bj->bi", v, dz_pred)) ** 2)
                metrics["loss_sym_reg"] = sym
                loss = loss + hp.w_sym_reg * sym
        else:
            dx_pred = cfg.library(x) @ Xi.T
            loss_x = jnp.mean((dx_pred - dx) ** 2)
            metrics["loss_sindy_x"] = loss_x
            loss = hp.w_sindy_x * loss_x
            if hp.w_sym_reg > 0.0 and self.sym_reg_fn is not None:
                def forward_fn(q):
                    return cfg.library(q) @ Xi.T
                sym = self.sym_reg_fn(forward_fn, x)
                metrics["loss_sym_reg"] = sym
                loss = loss + hp.w_sym_reg * sym
        if hp.sindy_reg_type == "l1":
            l1 = sum(jnp.sum(jnp.abs(p)) for p in jax.tree_util.tree_leaves(params))
            metrics["loss_sindy_reg"] = l1
            loss = loss + hp.w_sindy_reg * l1
        return loss, metrics

    @partial(jax.jit, static_argnums=0)
    def epoch(self, params, mask, opt_state, x_data, dx_data, key):
        hp = self.hp
        n = x_data.shape[0]
        # datasets smaller than batch_size train on one full-dataset batch
        bs = min(hp.batch_size, n)
        n_batches = n // bs
        perm = jax.random.permutation(key, n)[: n_batches * bs]
        perm = perm.reshape(n_batches, bs)

        def step(carry, idx):
            params, opt_state = carry
            (loss, metrics), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, mask, x_data[idx], dx_data[idx])
            upd, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, upd)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(step, (params, opt_state), perm)
        return params, opt_state, jax.tree_util.tree_map(jnp.mean, metrics)


def train_siged_adam(trainer: SIGEDAdamTrainer, x, dx, key, verbose=False,
                     log_interval=1):
    hp = trainer.hp
    key, kinit = jax.random.split(key)
    params, mask, opt_state = trainer.init(kinit)
    history = []
    for epoch in range(hp.num_epochs):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = trainer.epoch(params, mask, opt_state, x, dx, sub)
        if hp.st_freq > 0 and (epoch + 1) % hp.st_freq == 0:
            Xi = trainer.xi_of(params)
            mask = jnp.logical_and(jnp.abs(Xi) > hp.threshold, mask > 0).astype(mask.dtype)
        history.append({k: float(v) for k, v in metrics.items()})
        if verbose and (epoch + 1) % log_interval == 0:
            print(", ".join([f"Epoch {epoch}"] +
                            [f"{k}: {float(v):.4f}" for k, v in metrics.items()]))
    return trainer.xi_of(params), mask, history

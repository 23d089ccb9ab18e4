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
  latent space with live on-device Q recomputation on generator drift
  (train.py:155-168).

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
from ..models.lie_generator import GeneratorSpec
from ..utils import watchdog


def bce(p, target):
    """torch.nn.BCELoss on probabilities: the log output is clamped at -100
    but the 1/p (resp. 1/(1-p)) gradient still flows in the saturated
    regime — clipping p instead would zero the corrective gradient exactly
    where GAN balance is fragile (a saturated discriminator could then
    never be pushed back). Double-where so p == 0 stays NaN-free."""
    def log100(q):
        safe = jnp.where(q > 0, q, 1.0)
        return jnp.where(q > 0, jnp.maximum(jnp.log(safe), -100.0), -100.0)

    return -jnp.mean(target * log100(p) + (1 - target) * log100(1 - p))


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
    # Joint SINDy-in-latent (reference train.py:30-44,138-170; the RD pipeline)
    # matmul precision for the adversarial training step. bfloat16 is 4x
    # faster on v5e but measured UNSTABLE on the LV protocol (NaN by epoch 5
    # vs 15 clean f32 epochs) — float32 stays the default; flip per-run if
    # your configuration tolerates it.
    matmul_precision: str = "float32"
    # AE parameter EMA (round-5 verdict item 4): the RD GAN's held-out recon
    # is volatile epoch-to-epoch (0.078 -> 0.209 across late snapshots,
    # PARITY.md "RD autoencoder floor") because the adversarial gradient
    # keeps kicking the AE around its equilibrium. decay > 0 maintains an
    # exponential moving average of the AE params; snapshots carry it, the
    # best-by-val selection scores it, and the FINAL returned/saved AE is
    # the EMA (the deploy params). 0 disables (default — the LV protocol is
    # not volatile and stays reference-faithful).
    ae_ema: float = 0.0
    include_sindy: bool = False
    eq_constraint: bool = False
    poly_order: int = 2
    w_sindy_z: float = 1e-3
    w_sindy_x: float = 1e-1
    w_sindy_reg: float = 1e-1
    sindy_reg_type: str = "l1"
    lr_sindy: float = 1e-3
    st_freq: int = 100
    threshold: float = 0.1


class LassiTrainer:
    """Builds the jitted epoch step; holds static model definitions.

    dp_mesh: optional `jax.sharding.Mesh` with a "batch" axis — data-parallel
    training over ICI (SURVEY.md §5: the RD latent experiment's scaling
    axis). The epoch program is UNCHANGED; each minibatch is annotated with
    `with_sharding_constraint(P("batch"))` and XLA's SPMD partitioner
    shards all per-example compute and inserts the collectives (global
    BatchNorm statistics, global loss means, all-reduced gradients) — the
    reference has no distributed layer at all, and this is the pjit recipe
    rather than a hand-written NCCL translation. Semantics are identical to
    single-device up to floating-point reduction order.
    """

    def __init__(self, ae_def: AutoEncoderDef, spec: GeneratorSpec,
                 disc: Discriminator, hp: LassiHParams,
                 steps_per_epoch: Optional[int] = None,
                 dp_mesh=None):
        self.ae_def = ae_def
        self.spec = spec
        self.disc = disc
        self.hp = hp
        self.dp_mesh = dp_mesh
        self.sindy_adam = hp.include_sindy and hp.w_sindy_x > 0.0
        self.sindy_lstsq = hp.include_sindy and hp.w_sindy_x == 0.0
        if hp.include_sindy:
            from ..ops.library import FunctionLibrary
            from ..ops.constraint import m_weight_tensor

            self.library = FunctionLibrary(ae_def.latent_dim, hp.poly_order)
            self.W = jnp.asarray(m_weight_tensor(self.library)) if hp.eq_constraint else None
        if self.sindy_adam and not steps_per_epoch:
            # the x10 MultiStepLR-equivalent schedule (reference train.py:33,
            # milestones = epochs 1/2/3) counts OPTIMIZER steps — without the
            # real batches-per-epoch it would fire within the first epoch and
            # typically NaN the joint-SINDy run
            raise ValueError(
                "LassiTrainer with the Adam joint-SINDy loss (include_sindy "
                "and w_sindy_x > 0) requires steps_per_epoch=<batches per "
                "epoch> so the SINDy lr schedule fires at epoch boundaries")
        self.steps_per_epoch = steps_per_epoch or 1
        self.tx = self._make_optimizer()

    def init(self, key: jax.Array, x_example: jnp.ndarray):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ae_params, ae_bs = self.ae_def.init(k1)
        g_state = lg.init_generator(k2, self.spec)
        # probe latent shape for discriminator init
        z, _ = self.ae_def.encode(ae_params, ae_bs, x_example[:2], train=False)
        xt = x_example[:2] if self.hp.use_original_x else None
        d_params = self.disc.init(k3, z, None, xt)["params"]
        bundle = {"ae": ae_params, "d": d_params, "g": g_state}

        sindy_carry = {}
        d_lat, p = (self.ae_def.latent_dim, self.library.n_terms) if self.hp.include_sindy else (0, 0)
        if self.sindy_adam:
            bundle["sindy"] = {"Xi": jax.random.normal(k4, (d_lat, p))}
            sindy_carry = {"mask": jnp.ones((d_lat, p))}
        elif self.sindy_lstsq:
            sindy_carry = {"Xi": jnp.zeros((d_lat, p)), "mask": jnp.ones((d_lat, p)),
                           "resid": jnp.asarray(0.0)}
            if self.hp.eq_constraint:
                n_ch = len(lg.get_full_basis_list(self.spec, g_state))
                sindy_carry["Q"] = jnp.zeros((d_lat * p, d_lat * p))
                sindy_carry["L_prev"] = jnp.full((n_ch, d_lat, d_lat), jnp.inf)
        opt_state = self.tx.init(bundle)
        return bundle, ae_bs, opt_state, sindy_carry

    def _make_optimizer(self):
        hp = self.hp

        def label_fn(bundle):
            g_labels = lg.trainable_filter(self.spec, bundle["g"])
            g_labels = jax.tree_util.tree_map(lambda t: "g" if t else "frozen", g_labels)
            labels = {
                "ae": jax.tree_util.tree_map(lambda _: "ae", bundle["ae"]),
                "d": jax.tree_util.tree_map(lambda _: "d", bundle["d"]),
                "g": g_labels,
            }
            if "sindy" in bundle:
                labels["sindy"] = jax.tree_util.tree_map(lambda _: "sindy", bundle["sindy"])
            return labels

        # torch MultiStepLR(milestones=[1,2,3], gamma=10) on the SINDy Adam
        # (reference train.py:33): lr x10 after each of the first 3 epochs.
        spe = self.steps_per_epoch
        sindy_sched = optax.piecewise_constant_schedule(
            hp.lr_sindy, {1 * spe: 10.0, 2 * spe: 10.0, 3 * spe: 10.0})

        return optax.multi_transform(
            {
                "ae": optax.adam(hp.lr_ae),
                "d": optax.adam(hp.lr_d),
                "g": optax.adam(hp.lr_g),
                "sindy": optax.adam(sindy_sched),
                "frozen": optax.set_to_zero(),
            },
            label_fn,
        )

    # --- joint SINDy pieces (reference train.py:138-170) ---

    def _sindy_lstsq_update(self, ae_params, batch_stats, g_state, x, dx, carry, is_last):
        """Direct latent lstsq with live Q recomputation (train.py:155-168)."""
        from ..ops.linalg import masked_lstsq_per_dim, min_norm_lstsq, ridge_augment
        from ..ops.constraint import get_Q_padded_jnp

        hp = self.hp
        z, _ = self.ae_def.encode(ae_params, batch_stats, x, train=False)
        dz = self.ae_def.compute_dz(ae_params, batch_stats, x, dx)
        z0, dz0 = z[:, 0], dz[:, 0]
        d_lat, p = self.ae_def.latent_dim, self.library.n_terms

        if hp.eq_constraint:
            # Truncate and constrain ALL generator channels (reference
            # train.py:160-165 / sindy.py:85-106 stack every channel's C).
            L_list = lg.get_full_basis_list(self.spec, g_state)
            repr_dim = L_list[0].shape[-1] // self.ae_def.n_comps
            L_trunc = jax.lax.stop_gradient(
                jnp.stack([Li[:repr_dim, :repr_dim] for Li in L_list]))
            drift = jnp.linalg.norm(L_trunc - carry["L_prev"])
            recompute = jnp.logical_or(jnp.logical_or(drift > 0.1, is_last),
                                       jnp.isinf(carry["L_prev"]).any())
            Q = jax.lax.cond(recompute,
                             lambda _: get_Q_padded_jnp(self.W, L_trunc),
                             lambda _: carry["Q"], operand=None)
            L_prev = jnp.where(recompute, L_trunc, carry["L_prev"])
        else:
            Q = None

        # solve_SINDy (sindy.py:318-324): reset mask, iterate masked solve +
        # threshold to fixpoint (5 idempotent iterations)
        A, B = ridge_augment(self.library(z0), dz0, hp.w_sindy_reg)
        mask = jnp.ones((d_lat, p))

        def one_iter(carry_in, _):
            mask, _ = carry_in
            if hp.eq_constraint:
                mflat = mask.reshape(-1)
                Qm = (Q * mflat[:, None]).reshape(d_lat, p, -1)
                AQ = jnp.einsum("mp,dpq->dmq", A, Qm).reshape(d_lat * A.shape[0], -1)
                sol = min_norm_lstsq(AQ, B.T.reshape(-1))
                Xi = (Q @ sol).reshape(d_lat, p)
            else:
                Xi = masked_lstsq_per_dim(A, B, mask)
            new_mask = jnp.logical_and(jnp.abs(Xi) > hp.threshold, mask > 0).astype(mask.dtype)
            return (new_mask, Xi), None

        (mask, Xi), _ = jax.lax.scan(one_iter, (mask, jnp.zeros((d_lat, p))), None, length=5)
        # Residual loss with the SOLUTION held constant: gradients reach the
        # autoencoder through Theta(z) and dz only. Differentiating through
        # the masked min-norm solve would back-prop an SVD with repeated zero
        # singular values (the padded Q) — undefined gradients, instant NaN.
        # (The reference's loss here is torch lstsq's `residuals`, which the
        # default gelsy/gels drivers return EMPTY — its mean is NaN on this
        # path in the reference too; we make it well-defined instead.)
        Xi_c = jax.lax.stop_gradient(Xi * mask)
        resid = jnp.mean((self.library(z0) @ Xi_c.T - dz0) ** 2)
        new_carry = {"Xi": jax.lax.stop_gradient(Xi),
                     "mask": jax.lax.stop_gradient(mask), "resid": resid}
        if hp.eq_constraint:
            new_carry["Q"] = Q
            new_carry["L_prev"] = L_prev
        return resid, new_carry

    # --- loss (reference train.py:80-174) ---

    def loss_fn(self, bundle, batch_stats, x, dx, sindy_carry, key,
                is_last=False, train: bool = True):
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

        # --- joint SINDy (reference train.py:138-170) ---
        new_sindy_carry = sindy_carry
        if self.sindy_adam:
            dz = self.ae_def.compute_dz(ae_params, batch_stats, x, dx)
            Xi = bundle["sindy"]["Xi"] * sindy_carry["mask"]
            dz_pred = self.library(z) @ Xi.T
            dx_pred = self.ae_def.compute_dx(ae_params, z, dz_pred)
            loss_sindy_z = jnp.mean((dz_pred - dz) ** 2)
            # NOTE the reference double-applies w_sindy_x here
            # (train.py:145,148) — reproduced for parity.
            loss_sindy_x = hp.w_sindy_x * jnp.mean((dx_pred - dx) ** 2)
            metrics["loss_sindy_z"] = loss_sindy_z
            metrics["loss_sindy_x"] = loss_sindy_x
            loss = loss + hp.w_sindy_z * loss_sindy_z + hp.w_sindy_x * loss_sindy_x
            if hp.sindy_reg_type == "l1":
                l1 = jnp.sum(jnp.abs(bundle["sindy"]["Xi"]))
                metrics["loss_sindy_reg"] = l1
                loss = loss + hp.w_sindy_reg * l1
        elif self.sindy_lstsq:
            resid, new_sindy_carry = self._sindy_lstsq_update(
                ae_params, batch_stats, g_state, x, dx, sindy_carry, is_last)
            metrics["loss_sindy_z"] = resid
            loss = loss + hp.w_sindy_z * resid

        return loss, (new_bs, new_sindy_carry, metrics)

    # --- one jitted epoch (scan over batches) ---

    @partial(jax.jit, static_argnums=0)
    def epoch(self, bundle, batch_stats, opt_state, sindy_carry, x_data, dx_data, key):
        hp = self.hp
        if self.sindy_lstsq:
            # the joint latent lstsq needs f32 QR/SVD accuracy (the Adam
            # joint-SINDy path has no decomposition — it keeps the override)
            return self._epoch_impl(bundle, batch_stats, opt_state, sindy_carry,
                                    x_data, dx_data, key)
        with jax.default_matmul_precision(hp.matmul_precision):
            return self._epoch_impl(bundle, batch_stats, opt_state, sindy_carry,
                                    x_data, dx_data, key)

    def _epoch_impl(self, bundle, batch_stats, opt_state, sindy_carry, x_data, dx_data, key):
        hp = self.hp
        n = x_data.shape[0]
        # datasets smaller than batch_size train on one full-dataset batch
        # (a zero-length scan would yield empty metrics whose mean is NaN,
        # tripping the epoch-0 NaN bailout with an untrained state)
        bs = min(hp.batch_size, n)
        n_batches = n // bs
        kperm, kscan = jax.random.split(key)
        perm = jax.random.permutation(kperm, n)[: n_batches * bs]
        perm = perm.reshape(n_batches, bs)

        def batch_step(carry, scan_in):
            bundle, bstats, opt_state, sc, key = carry
            i, idx = scan_in
            key, sub = jax.random.split(key)
            x_b, dx_b = x_data[idx], dx_data[idx]
            if self.dp_mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                shard = NamedSharding(self.dp_mesh, P("batch"))
                x_b = jax.lax.with_sharding_constraint(x_b, shard)
                dx_b = jax.lax.with_sharding_constraint(dx_b, shard)
            grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
            (loss, (new_bs, new_sc, metrics)), grads = grad_fn(
                bundle, bstats, x_b, dx_b, sc, sub,
                is_last=(i == n_batches - 1))
            updates, opt_state = self.tx.update(grads, opt_state, bundle)
            bundle = optax.apply_updates(bundle, updates)
            return (bundle, new_bs, opt_state, new_sc, key), metrics

        (bundle, batch_stats, opt_state, sindy_carry, _), metrics = jax.lax.scan(
            batch_step, (bundle, batch_stats, opt_state, sindy_carry, kscan),
            (jnp.arange(n_batches), perm)
        )
        mean_metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        return bundle, batch_stats, opt_state, sindy_carry, mean_metrics

    @partial(jax.jit, static_argnums=0)
    def eval_metrics(self, bundle, batch_stats, sindy_carry, x, dx, key):
        _, (_, _, metrics) = self.loss_fn(bundle, batch_stats, x, dx, sindy_carry,
                                          key, train=False)
        return metrics


def train_lassi(
    trainer: LassiTrainer,
    x_train: jnp.ndarray,
    x_val: Optional[jnp.ndarray],
    key: jax.Array,
    dx_train: Optional[jnp.ndarray] = None,
    dx_val: Optional[jnp.ndarray] = None,
    log_interval: int = 1,
    print_li: bool = False,
    verbose: bool = True,
    logger=None,
    save_interval: int = 0,
    save_dir: Optional[str] = None,
    resume: bool = False,
    max_snapshots: int = 3,
):
    """Run the full training loop; returns (bundle, batch_stats, sindy_carry,
    history). `logger` (utils.metrics.MetricsLogger) receives per-epoch
    metrics — the wandb.log equivalent (reference train.py:258).

    Periodic checkpointing (reference train.py:260-269 saves epoch-suffixed
    model files every save_interval): with save_interval > 0 and a save_dir,
    the FULL training state (bundle, batch stats, optimizer state, sindy
    carry, PRNG key, metric history) is snapshotted to
    saved_models/<save_dir>/train_state_epNNNNN.npz every save_interval
    epochs. `resume=True` restores the newest snapshot and continues — the
    resumed run is bit-identical to an uninterrupted one with the same
    settings (the saved key reflects all per-epoch and eval splits; keep
    log_interval/x_val the same across restarts for exact key-stream
    alignment). Only the newest `max_snapshots` snapshots are retained
    (each carries the full optimizer state — 154 MB for the RD AE)."""
    from ..utils import checkpoint as ckpt

    hp = trainer.hp
    if dx_train is None:
        dx_train = x_train  # placeholder; unused without include_sindy
    key, kinit = jax.random.split(key)
    bundle, batch_stats, opt_state, sindy_carry = trainer.init(kinit, x_train)
    ema_ae = bundle["ae"] if hp.ae_ema > 0.0 else None
    ema_update = (jax.jit(lambda e, p: jax.tree_util.tree_map(
        lambda a, b: hp.ae_ema * a + (1.0 - hp.ae_ema) * b, e, p))
        if hp.ae_ema > 0.0 else None)
    history = []
    start_epoch = 0
    if resume and save_dir is not None:
        found = ckpt.latest_train_state(save_dir)
        if found is not None:
            path, start_epoch = found
            like = {"bundle": bundle, "batch_stats": batch_stats,
                    "opt_state": opt_state, "sindy_carry": sindy_carry,
                    "key": key}
            if ema_ae is not None:
                like["ema_ae"] = ema_ae
            state, history = ckpt.load_train_state(path, like)
            bundle, batch_stats = state["bundle"], state["batch_stats"]
            opt_state, sindy_carry = state["opt_state"], state["sindy_carry"]
            ema_ae = state.get("ema_ae", ema_ae)
            key = state["key"]
            if verbose:
                print(f"Resumed from {path} (epochs done: {start_epoch})")
        elif verbose:
            print(f"resume requested but no train_state_ep*.npz under "
                  f"saved_models/{save_dir}; starting fresh")
    prev_state = (bundle, batch_stats, opt_state, sindy_carry)
    for epoch in range(start_epoch, hp.num_epochs):
        key, sub = jax.random.split(key)
        bundle, batch_stats, opt_state, sindy_carry, metrics = trainer.epoch(
            bundle, batch_stats, opt_state, sindy_carry, x_train, dx_train, sub
        )
        # sequential thresholding (train.py:195-199)
        if hp.gan_st_freq > 0 and (epoch + 1) % hp.gan_st_freq == 0:
            bundle = dict(bundle, g=lg.set_threshold(trainer.spec, bundle["g"],
                                                     hp.gan_st_thres))
        if (trainer.sindy_adam and hp.st_freq > 0
                and (epoch + 1) % hp.st_freq == 0):
            Xi = bundle["sindy"]["Xi"]
            sindy_carry = dict(sindy_carry, mask=jnp.logical_and(
                jnp.abs(Xi) > hp.threshold, sindy_carry["mask"] > 0
            ).astype(jnp.float32))
        if ema_ae is not None:
            ema_ae = ema_update(ema_ae, bundle["ae"])
        metrics = {k: float(v) for k, v in metrics.items()}
        watchdog.beat()  # float() above blocked on the epoch's device work
        if any(np.isnan(v) for v in metrics.values()):
            # NaN bailout, keeping the last finite state (the reference's
            # failure model is the same: abort on NaN, train.py:697-699)
            print(f"NaN encountered at epoch {epoch}; stopping with the last "
                  f"finite state (epoch {epoch - 1}).")
            bundle, batch_stats, opt_state, sindy_carry = prev_state
            break
        prev_state = (bundle, batch_stats, opt_state, sindy_carry)
        history.append(metrics)
        if logger is not None:
            logger.log(metrics, step=epoch)
        if verbose and (epoch + 1) % log_interval == 0:
            msg = ", ".join([f"Epoch {epoch}"] +
                            [f"{k}: {v:.4f}" for k, v in metrics.items()])
            print(msg)
            if x_val is not None:
                key, sub = jax.random.split(key)
                em = trainer.eval_metrics(bundle, batch_stats, sindy_carry, x_val,
                                          dx_val if dx_val is not None else x_val, sub)
                print(", ".join([f"Epoch {epoch} test"] +
                                [f"{k}: {float(v):.4f}" for k, v in em.items()]))
            if print_li:
                for L in lg.getLi(trainer.spec, bundle["g"]):
                    print(np.asarray(L))
        if (save_interval > 0 and save_dir is not None
                and (epoch + 1) % save_interval == 0):
            # held-out recon recorded with the snapshot so pruning can keep
            # the best-by-val state (verdict item 4). The eval key is derived
            # from the epoch, NOT split off the main stream — resume
            # bit-identity must not depend on whether a save happened.
            val_metric = None
            if x_val is not None:
                # with EMA on, score the deploy params (the EMA), not the
                # raw adversarial iterate
                eval_bundle = (dict(bundle, ae=ema_ae) if ema_ae is not None
                               else bundle)
                em = trainer.eval_metrics(
                    eval_bundle, batch_stats, sindy_carry, x_val,
                    dx_val if dx_val is not None else x_val,
                    jax.random.fold_in(jax.random.PRNGKey(17), epoch))
                val_metric = float(em.get("loss_ae_rel", em.get("loss_ae")))
            # saved AFTER the eval/log block so the stored key reflects every
            # split consumed this epoch — resume continues the exact stream
            state_to_save = {"bundle": bundle, "batch_stats": batch_stats,
                             "opt_state": opt_state,
                             "sindy_carry": sindy_carry, "key": key}
            if ema_ae is not None:
                state_to_save["ema_ae"] = ema_ae
            ckpt.save_train_state(
                ckpt.train_state_path(save_dir, epoch + 1),
                state_to_save, history, val_metric=val_metric)
            ckpt.prune_train_states(save_dir, keep=max_snapshots)
    if ema_ae is not None:
        # the EMA is the deploy AE: final artifacts (save_laligan in
        # cli/main.py) and downstream cross-stage loads get it
        bundle = dict(bundle, ae=ema_ae)
    return bundle, batch_stats, sindy_carry, history

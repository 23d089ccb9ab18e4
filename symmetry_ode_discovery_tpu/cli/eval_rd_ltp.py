"""Quantitative latent-equation evaluation for the reaction-diffusion cell.

The RD pipeline (rd/sym_eq.cfg) trains a LaLiGAN autoencoder jointly with a
constrained latent SINDy equation; the reference never evaluates what that
equation PREDICTS (its own joint RD loss is NaN from batch 0 — PARITY.md).
This CLI gives the RD cell a number like every other cell: the discovered
latent dynamics are rolled out with RK4 from the first held-out snapshot's
latent state and decoded back to fields (the AE-conjugated rollout path of
reference evaluation/eval_ltp.py:28-34), then scored as relative field MSE
against the true held-out snapshots.

Reported metrics:
  rollout   decode(RK4 rollout of Theta(z) Xi^T) vs true fields
  latent    the same rollout vs encode(true fields) — isolates equation
            error from decoder error
  recon     decode(encode(x)) vs x — the autoencoder floor: no rollout can
            beat it, so rollout/recon ~ 1 means the latent equation predicts
            as well as the AE can express
All relative to the held-out trajectory's time-variance (the convention of
cli/eval_ltp_sweep.py, so numbers are comparable across cells).

Usage:
    python -m symmetry_ode_discovery_tpu.cli.eval_rd_ltp --config rd/sym_eq.cfg
"""

from __future__ import annotations

import os

import numpy as np


def _rel_err(pred, true):
    """Per-step relative squared error: MSE over pixels, normalized by the
    trajectory's time-variance (eval_ltp_sweep.ltp_sweep_errors convention —
    'does the prediction beat predicting the time-mean field')."""
    import jax.numpy as jnp

    scale = jnp.mean(jnp.var(true, axis=0))
    return jnp.mean((pred - true) ** 2, axis=-1) / scale


def _rel_err_pow(pred, true):
    """Same MSE normalized by field POWER (mean true^2) instead — the RD
    field's per-pixel temporal variance over a 1-time-unit window is tiny
    relative to its amplitude (the spiral oscillates with period ~8), so the
    variance-relative number conflates 'cannot express the field' with
    'cannot track its small temporal variation'; this one isolates the
    former."""
    import jax.numpy as jnp

    return jnp.mean((pred - true) ** 2, axis=-1) / jnp.mean(true ** 2)


def run(args: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from .main import build_models
    from ..data.datasets import ReactionDiffusionDataset, _load_rd
    from ..ops.integrators import odeint
    from ..ops.library import FunctionLibrary
    from ..utils import checkpoint as ckpt

    data = _load_rd()
    split = args.get("rd_eval_split", "val")
    if split == "val":
        ds = ReactionDiffusionDataset(data, mode="val")
        x_val = jnp.asarray(ds.x)                   # (T, N) held-out snapshots
        t_axis = ds.t
    else:
        # in-distribution control: the LAST 20 TRAIN snapshots. Rolling out
        # here separates "the latent equation is wrong" from "the AE doesn't
        # generalize past its training window" — if train-tail rollouts sit
        # near the train recon floor while val rollouts sit at the (much
        # higher) val recon floor, the equation is not the bottleneck.
        ds = ReactionDiffusionDataset(data, mode="train")
        x_val = jnp.asarray(ds.x[-20:])
        t_axis = ds.t[-20:]
    val = ds
    dt = float(t_axis[1] - t_axis[0])
    args = dict(args, input_dim=val.input_dim)

    ae_def, spec, disc = build_models(args)
    from ..models import lie_generator as lg

    key = jax.random.PRNGKey(args["seed"])
    ae_params, ae_bstats = ae_def.init(key)
    g_state = lg.init_generator(jax.random.PRNGKey(args["seed"] + 1), spec)
    bundle = {"ae": ae_params, "d": {}, "g": g_state}
    load_dir = args.get("load_laligan") or args["save_dir"]
    bundle, ae_bstats = ckpt.load_laligan(load_dir, bundle, ae_bstats)
    ae_params = bundle["ae"]
    lib = FunctionLibrary(args["latent_dim"], args["poly_order"])
    shape = (args["latent_dim"], lib.n_terms)
    reg = ckpt.load_pytree(f"saved_models/{load_dir}/regressor.npz",
                           {"Xi": np.zeros(shape, np.float32),
                            "mask": np.zeros(shape, np.float32)})
    Xi = jnp.asarray(reg["Xi"] * (np.asarray(reg["mask"]) > 0))

    def fwd(z):
        return lib(z) @ Xi.T

    def encode(x):
        return ae_def.encode(ae_params, ae_bstats, x, train=False)[0]

    # AE-conjugated rollout (reference eval_ltp.py:28-34): one latent IC,
    # full held-out horizon, decoded per step
    n_steps = x_val.shape[0] - 1
    z_true = encode(x_val)
    z0 = z_true[:1]
    z_pred = odeint(fwd, z0, n_steps * dt, dt, method="rk4",
                    full_traj=True, num_steps=n_steps)[:, 0]   # (T-1, d_lat)
    x_pred = ae_def.decode(ae_params, z_pred)

    rel_rollout = _rel_err(x_pred, x_val[1:])
    rel_latent = _rel_err(z_pred, z_true[1:])
    xhat = ae_def.decode(ae_params, z_true)
    rel_recon = _rel_err(xhat, x_val)
    pow_rollout = _rel_err_pow(x_pred, x_val[1:])
    pow_recon = _rel_err_pow(xhat, x_val)

    out = {
        "t": np.asarray(t_axis[1:]),
        "rel_rollout": np.asarray(rel_rollout),
        "rel_latent": np.asarray(rel_latent),
        "rel_recon": np.asarray(rel_recon),
        "pow_rollout": np.asarray(pow_rollout),
        "pow_recon": np.asarray(pow_recon),
        "z_pred": np.asarray(z_pred),
        "z_true": np.asarray(z_true),
        "Xi": np.asarray(Xi),
    }
    dst = (f"eval_results/rd-ltp-{load_dir}" if split == "val"
           else f"eval_results/rd-ltp-{load_dir}-{split}")
    os.makedirs(dst, exist_ok=True)
    np.savez(os.path.join(dst, "rollout.npz"), **out)
    mean_roll = float(np.mean(out["rel_rollout"]))
    mean_lat = float(np.mean(out["rel_latent"]))
    mean_rec = float(np.mean(out["rel_recon"]))
    print(f"RD latent-equation LTP over {n_steps} held-out steps "
          f"(dt={dt:.3g}):")
    print(f"  rollout field rel. MSE (time-mean): {mean_roll:.4g}")
    print(f"  latent rollout rel. MSE:            {mean_lat:.4g}")
    print(f"  AE recon floor rel. MSE:            {mean_rec:.4g}")
    print(f"  (field-power-normalized: rollout "
          f"{float(np.mean(out['pow_rollout'])):.4g}, recon floor "
          f"{float(np.mean(out['pow_recon'])):.4g})")
    print(f"  -> saved {dst}/rollout.npz")
    return out


def main(argv=None):
    # Same policy as eval_ltp_sweep: the eval is small dense work — pin it
    # to CPU so it never contends for the single TPU chip (an attempted TPU
    # run of this eval hung in the tunnel; CPU completes in ~9 s).
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ..utils.config import get_args

    return run(vars(get_args(argv)))


if __name__ == "__main__":
    main()

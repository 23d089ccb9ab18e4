"""Post-hoc constrained latent SINDy on a frozen (non-joint) RD LaLiGAN AE.

The reference's intended RD pipeline is rd/sym.cfg (LaLiGAN only) followed by
rd/sym_eq.cfg (JOINT AE + constrained latent SINDy) — but its joint RD loss
is NaN from batch 0 (PARITY.md), so the equation the non-joint AE implies was
never fit on either side. This tool completes the pipeline for the non-joint
checkpoint: it runs EXACTLY the joint trainer's constrained STLSQ fixpoint
(training/lassi.py::_sindy_lstsq_update — live Q from the trained generator,
5 masked min-norm iterations; reference train.py:155-168 / sindy.py:318-324)
once, over the FULL train set, with the AE frozen, then exports a complete
saved_models dir (autoencoder/generator/regressor npzs) that
cli/eval_rd_ltp.py can evaluate directly.

  --src     source saved_models run (non-joint rd/sym.cfg output)
  --epoch   optional periodic train_state snapshot to fit on (GAN training
            is volatile epoch-to-epoch — see the PARITY.md RD floor section;
            None = the final checkpoint)
  --dst     output saved_models dir (default <src>-sindy[-ep<epoch>])

Usage:
    python tools/rd_fit_latent_sindy.py --src laligan-rd-nonjoint-s42 --epoch 90
    python -m symmetry_ode_discovery_tpu.cli.eval_rd_ltp --config rd/sym_eq.cfg \
        --load_laligan laligan-rd-nonjoint-s42-sindy-ep90
"""

import argparse
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def load_snapshot_state(name, epoch, ae_params, ae_bstats, d_params, g_state):
    """Read AE/discriminator/generator leaves out of a periodic
    train_state_ep*.npz into freshly-initialized pytrees."""
    import jax.numpy as jnp

    z = np.load(os.path.join(REPO, "saved_models", name,
                             f"train_state_ep{epoch:05d}.npz"),
                allow_pickle=True)
    trees = {"ae": ae_params, "d": d_params}
    g_leaves = {}

    def parse(k):
        # key-path segments: ['dictkey'], .attr (dataclass field), [i] (list)
        return [m[0] or m[1] or int(m[2]) for m in
                re.findall(r"\['([^']+)'\]|\.([A-Za-z_]\w*)|\[(\d+)\]", k)]

    def set_in(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = val

    for k in z.files:
        parts = parse(k)
        if len(parts) < 2:
            continue
        if parts[0] == "bundle" and parts[1] in trees:
            if trees[parts[1]] is None or not trees[parts[1]]:
                continue  # caller doesn't need this component (e.g. disc)
            set_in(trees[parts[1]], parts[2:], jnp.asarray(z[k]))
        elif parts[0] == "bundle" and parts[1] == "g":
            g_leaves[tuple(parts[2:])] = jnp.asarray(z[k])
        elif parts[0] == "batch_stats":
            set_in(ae_bstats, parts[1:], jnp.asarray(z[k]))
    # generator state is a frozen dataclass with list-valued fields
    # (.Li/[0] etc.): rebuild via replace
    rep = {}
    for field in ("Li", "sigma", "struct_const", "masks"):
        sub = {p: v for p, v in g_leaves.items() if p[0] == field}
        if not sub:
            continue
        if list(sub) == [(field,)]:
            rep[field] = sub[(field,)]
        else:
            rep[field] = [sub[k] for k in sorted(sub, key=lambda t: t[1])]
    return ae_params, ae_bstats, d_params, g_state.replace(**rep)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="laligan-rd-nonjoint-s42")
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--dst", default=None)
    args_cli = ap.parse_args(argv)
    dst = args_cli.dst or (args_cli.src + "-sindy" +
                           (f"-ep{args_cli.epoch}" if args_cli.epoch else ""))

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from symmetry_ode_discovery_tpu.cli.main import build_models
    from symmetry_ode_discovery_tpu.data.datasets import get_dataset
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.training.lassi import (
        LassiHParams, LassiTrainer)
    from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt
    from symmetry_ode_discovery_tpu.utils.config import get_args

    # rd/sym_eq.cfg supplies the fit hyperparameters (eq_constraint,
    # threshold, w_sindy_reg, poly_order) the joint trainer would have used.
    args = vars(get_args(["--config", "rd/sym_eq.cfg"]))
    train_ds, _, args = get_dataset(args)
    ae_def, spec, disc = build_models(args)

    hp = LassiHParams(
        include_sindy=True, eq_constraint=args["eq_constraint"],
        poly_order=args["poly_order"], w_sindy_z=args["w_sindy_z"],
        w_sindy_x=args["w_sindy_x"], w_sindy_reg=args["w_sindy_reg"],
        sindy_reg_type=args["sindy_reg_type"], lr_sindy=0.0,
        st_freq=args["st_freq"], threshold=args["threshold"],
    )
    trainer = LassiTrainer(ae_def, spec, disc, hp, steps_per_epoch=1)

    key = jax.random.PRNGKey(args["seed"])
    bundle, ae_bstats, _, _ = trainer.init(key, jnp.asarray(train_ds.x))
    ae_params, d_params, g_state = bundle["ae"], bundle["d"], bundle["g"]
    if args_cli.epoch is None:
        bundle, ae_bstats = ckpt.load_laligan(args_cli.src, bundle, ae_bstats)
        ae_params, g_state = bundle["ae"], bundle["g"]
    else:
        ae_params, ae_bstats, d_params, g_state = load_snapshot_state(
            args_cli.src, args_cli.epoch, ae_params, ae_bstats, d_params,
            g_state)
    d_lat, p = ae_def.latent_dim, trainer.library.n_terms
    carry = {"Xi": jnp.zeros((d_lat, p)), "mask": jnp.ones((d_lat, p)),
             "resid": jnp.asarray(0.0)}
    if hp.eq_constraint:
        n_ch = len(lg.get_full_basis_list(spec, g_state))
        carry["Q"] = jnp.zeros((d_lat * p, d_lat * p))
        carry["L_prev"] = jnp.full((n_ch, d_lat, d_lat), jnp.inf)

    x, dx = train_ds.x, train_ds.dx            # full (W, n_comps, N) windows
    resid, carry = trainer._sindy_lstsq_update(
        ae_params, ae_bstats, g_state, x, dx, carry, is_last=True)
    Xi = np.asarray(carry["Xi"] * carry["mask"])
    print(f"fit on {x.shape[0]} windows: latent residual {float(resid):.4g}")
    print("Xi (masked):")
    print(np.array2string(Xi, precision=4, suppress_small=True))

    bundle = {"ae": ae_params, "d": d_params, "g": g_state}
    ckpt.save_laligan(dst, bundle, ae_bstats)
    ckpt.save_pytree(f"saved_models/{dst}/regressor.npz",
                     {"Xi": carry["Xi"], "mask": carry["mask"]})
    print(f"-> saved_models/{dst} (autoencoder/generator/regressor npzs)")


if __name__ == "__main__":
    main()

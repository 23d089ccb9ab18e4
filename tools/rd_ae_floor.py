"""RD autoencoder reconstruction floor: ours vs the reference, identical data.

The RD cell's rollout error is pinned at the autoencoder's own recon floor
(RESULTS.md). Round 3 asserted "this floor IS the baseline" because the
reference's JOINT rd/sym_eq path NaNs at batch 0 — but its NON-joint
rd/sym.cfg LaLiGAN path trains fine (reference main.py:90-91 -> train.py:16),
so the floor can be measured on both sides on the same regenerated
reaction_diffusion.mat. This tool computes decode(encode(x)) on the SAME
held-out snapshots for either side:

  --side ref    torch: imports the reference modules from /tmp/refrun and
                loads saved_models/<name>/autoencoder.pt produced by running
                `python main.py --config rd/sym.cfg` there
  --side ours   jax (CPU-pinned): loads saved_models/<name> via
                utils.checkpoint.load_laligan

Metrics match cli/eval_rd_ltp.py exactly: rel (MSE / time-variance of the
split) and pow (MSE / field power). Splits: consecutive 80/10/10 of the 201
snapshots (reference dataset.py:70-75). Evidence ->
eval_results/rd-aefloor-<tag>/floor.npz.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
REFRUN = os.environ.get("SODT_REFRUN", "/tmp/refrun")


def load_snapshots(mat_path):
    import scipy.io as sio

    data = sio.loadmat(mat_path)
    n_samples = data["t"].size
    n = data["x"].size
    xs = data["uf"].reshape((n * n, -1)).T.astype(np.float32)  # (T, N)
    tr = np.arange(int(0.8 * n_samples))
    va = np.arange(int(0.8 * n_samples), int(0.9 * n_samples))
    return xs, tr, va


def metrics(xhat, x):
    mse = np.mean((xhat - x) ** 2, axis=-1)            # per snapshot
    rel = float(np.mean(mse / np.mean(np.var(x, axis=0))))
    pow_ = float(np.mean(mse / np.mean(x ** 2)))
    return rel, pow_


def recon_ref(name, xs, epoch=None):
    """Reference torch AE: duplicate each snapshot into a 2-component window
    (the mlp arch applies the same shared encoder per component,
    reference autoencoder.py:37-66, so this equals per-snapshot recon).
    epoch selects a periodic snapshot (autoencoder_<epoch>.pt,
    reference train.py:263); None loads the final autoencoder.pt."""
    import torch

    sys.path.insert(0, REFRUN)
    cwd = os.getcwd()
    os.chdir(REFRUN)
    try:
        from parser_utils import get_args

        argv_bak = sys.argv
        sys.argv = ["main.py", "--config", "rd/sym.cfg"]
        args = vars(get_args())
        sys.argv = argv_bak
        args["input_dim"] = xs.shape[1]
        args["device"] = "cpu"
        from autoencoder import AutoEncoder

        ae = AutoEncoder(**args)
        suffix = "" if epoch is None else f"_{epoch}"
        sd = torch.load(f"saved_models/{name}/autoencoder{suffix}.pt",
                        map_location="cpu")
        ae.load_state_dict(sd)
        ae.eval()
        with torch.no_grad():
            x = torch.from_numpy(xs).unsqueeze(1).repeat(1, 2, 1)
            _, xhat = ae(x)
        return xhat[:, 0].numpy()
    finally:
        os.chdir(cwd)


def recon_ours(name, xs, epoch=None):
    """epoch selects a periodic train_state_ep*.npz snapshot (the AE params
    + batch_stats leaves are read out of the full train state); None loads
    the final autoencoder.npz via load_laligan."""
    import re

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from symmetry_ode_discovery_tpu.cli.main import build_models
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt
    from symmetry_ode_discovery_tpu.utils.config import get_args

    args = vars(get_args(["--config", "rd/sym.cfg"]))
    args["input_dim"] = xs.shape[1]
    ae_def, spec, _ = build_models(args)
    ae_params, ae_bstats = ae_def.init(jax.random.PRNGKey(0))
    if epoch is None:
        g_state = lg.init_generator(jax.random.PRNGKey(1), spec)
        bundle = {"ae": ae_params, "d": {}, "g": g_state}
        bundle, ae_bstats = ckpt.load_laligan(name, bundle, ae_bstats)
        ae_params = bundle["ae"]
    else:
        z = np.load(os.path.join(REPO, "saved_models", name,
                                 f"train_state_ep{epoch:05d}.npz"),
                    allow_pickle=True)

        def set_in(tree, path, val):
            node = tree
            for p in path[:-1]:
                node = node[p]
            assert path[-1] in node, path
            node[path[-1]] = val

        for k in z.files:
            parts = re.findall(r"\['([^']+)'\]", k)
            if len(parts) < 2:
                continue
            if parts[0] == "bundle" and parts[1] == "ae":
                set_in(ae_params, parts[2:], jnp.asarray(z[k]))
            elif parts[0] == "batch_stats":
                set_in(ae_bstats, parts[1:], jnp.asarray(z[k]))
    zlat = ae_def.encode(ae_params, ae_bstats, jnp.asarray(xs),
                         train=False)[0]
    return np.asarray(ae_def.decode(ae_params, zlat))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "ours"], required=True)
    ap.add_argument("--name", default=None,
                    help="saved_models run name (default: laligan-rd for "
                    "ref, laligan-rd-nonjoint-s42 for ours)")
    ap.add_argument("--mat", default=os.path.join(REPO, "data",
                                                  "reaction_diffusion.mat"))
    ap.add_argument("--tag", default=None, help="eval_results suffix")
    ap.add_argument("--epochs", default=None,
                    help="comma-separated snapshot epochs (GAN training is "
                    "volatile epoch-to-epoch; the trajectory shows the floor "
                    "band, not one draw of it) -> trajectory.npz")
    args = ap.parse_args(argv)
    name = args.name or ("laligan-rd" if args.side == "ref"
                         else "laligan-rd-nonjoint-s42")
    recon_fn = recon_ref if args.side == "ref" else recon_ours

    xs, tr, va = load_snapshots(args.mat)
    tag = args.tag or f"{args.side}-{name}"
    dst = os.path.join(REPO, "eval_results", f"rd-aefloor-{tag}")
    os.makedirs(dst, exist_ok=True)
    if args.epochs is not None:
        epochs = [int(e) for e in args.epochs.split(",")]
        out = {"epochs": np.asarray(epochs)}
        rows = {f"{s}_{m}": [] for s in ("train", "val")
                for m in ("rel", "pow")}
        for ep in epochs:
            recon = recon_fn(name, xs, epoch=ep)
            line = [f"{args.side} {name} ep{ep}:"]
            for split, idx in (("train", tr), ("val", va)):
                rel, pow_ = metrics(recon[idx], xs[idx])
                rows[f"{split}_rel"].append(rel)
                rows[f"{split}_pow"].append(pow_)
                line.append(f"{split} rel(var) {rel:.4g} rel(power) "
                            f"{pow_:.4g}")
            print("  ".join(line))
        out.update({k: np.asarray(v) for k, v in rows.items()})
        np.savez(os.path.join(dst, "trajectory.npz"), **out)
        print(f"-> {dst}/trajectory.npz")
        return out

    recon = recon_fn(name, xs)
    out = {}
    for split, idx in (("train", tr), ("val", va)):
        rel, pow_ = metrics(recon[idx], xs[idx])
        out[f"{split}_rel"] = rel
        out[f"{split}_pow"] = pow_
        print(f"{args.side} {name} {split}: recon rel(var) {rel:.4g}  "
              f"rel(power) {pow_:.4g}")
    np.savez(os.path.join(dst, "floor.npz"), **out)
    print(f"-> {dst}/floor.npz")
    return out


if __name__ == "__main__":
    main()

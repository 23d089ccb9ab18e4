"""Symmetry-selection study (VERDICT r3 item 8): can a cheap criterion,
computed from a LaLiGAN checkpoint alone, predict which discovered symmetry
gives the best downstream EquivSINDy-r sweep?

The LV noise99 GAN equilibrium is seed-dependent (RESULTS.md "Symmetry
discovery"): s43 finds an upper shear, s44 a lower-triangular shear+scaling
mix, s45 a rank-1 column generator. All three are valid equilibria of the
latent distribution; the reference hard-codes seed 43
(/root/reference/run_configs/lv/noise99_sym.cfg) and never asks which
equilibrium one SHOULD pick. This tool scores each tracked checkpoint with
checkpoint-only criteria on held-out data:

  1. truth-equivariance residual: the symmreg_r penalty (training/
     symmreg.py:139, reference model_utils.py:126-170) evaluated on the
     GROUND-TRUTH LV vector field h*(x) = (-4/3 e^{x1} + 2/3, e^{x0} - 1),
     normalized by E||h*||^2 — "does the true dynamics respect the learned
     symmetry?" This is computable without running any discovery sweep.
  2. AE relative reconstruction error on the val split.
  3. reg_closure / reg_ortho / reg_norm of the generator state.

and prints them next to the downstream 50-seed EquivSINDy-r joint-success
rates (eval_results/symreg2-noise99-lv{,-s44,-s45} or bench-symreg for s43).

Usage: python tools/symmetry_selection.py [--val_noise 0.99]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def discover_ckpts():
    """All tracked LV noise99 LaLiGAN equilibria: the reference-seed dir
    (laligan-noise99-lv == s43) plus any laligan-noise99-lv-sNN retrain.
    Downstream evidence: the 50-seed symreg2-* sweeps (s43/s44/s45) or the
    round-5 reduced 25-seed symreg25-* sweeps (s46+)."""
    ckpts = {"s43": ("laligan-noise99-lv",
                     ["symreg2-noise99-lv", "bench-symreg"])}
    for d in sorted(glob.glob("saved_models/laligan-noise99-lv-s*")):
        tag = os.path.basename(d).rsplit("-", 1)[-1]
        ckpts[tag] = (os.path.basename(d),
                      [f"symreg2-noise99-lv-{tag}",
                       f"symreg25-noise99-lv-{tag}"])
    return ckpts


CKPTS = discover_ckpts()


def truth_h(x):
    """Ground-truth LV vector field in the protocol's log coordinates."""
    import jax.numpy as jnp

    return jnp.stack([-4.0 / 3.0 * jnp.exp(x[:, 1]) + 2.0 / 3.0,
                      jnp.exp(x[:, 0]) - 1.0], axis=1)


def downstream(dirs, min_seeds=25):
    """First sweep dir with >= min_seeds evaluated seeds. Returns
    (dir, n, joint_n, eq0_n, eq1_n, joint_first25) — joint_first25 is the
    success count over seeds 0..24 only, so 50-seed and 25-seed sweeps rank
    on a common budget (round-5 n~10 study)."""
    import numpy as np

    for d in dirs:
        fs = sorted(glob.glob(f"eval_results/{d}/seed*.npz"),
                    key=lambda f: int(f.rsplit("seed", 1)[1].split(".")[0]))
        if len(fs) >= min_seeds:
            cf = np.stack([np.load(f)["correct_form"] for f in fs])
            n25 = min(25, len(fs))
            return (d, len(fs), int(np.all(cf > 0, axis=1).sum()),
                    int((cf[:, 0] > 0).sum()), int((cf[:, 1] > 0).sum()),
                    int(np.all(cf[:n25] > 0, axis=1).sum()))
    return None, None, None, None, None, None


def spearman(a, b):
    """Spearman rank correlation (average ranks for ties)."""
    import numpy as np

    def ranks(v):
        v = np.asarray(v, float)
        order = np.argsort(v)
        r = np.empty(len(v))
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j + 1 < len(v) and sv[j + 1] == sv[i]:
                j += 1
            r[order[i:j + 1]] = 0.5 * (i + j) + 1.0
            i = j + 1
        return r

    ra, rb = ranks(a), ranks(b)
    ra -= ra.mean(); rb -= rb.mean()
    den = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / den) if den else float("nan")


def main():
    import jax

    if "--cpu" in sys.argv:
        # criteria are tiny (4096-point encodes + penalties); run off-TPU
        # so the analysis never contends with device sweeps
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from symmetry_ode_discovery_tpu.cli.main import build_models
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.training.symmreg import symmreg_r
    from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt
    from symmetry_ode_discovery_tpu.utils.config import get_args

    val_noise = "0.99"
    if "--val_noise" in sys.argv:
        val_noise = sys.argv[sys.argv.index("--val_noise") + 1]
    tag = f"noise{int(float(val_noise) * 100):02d}"
    xv = np.load(f"data/lv-val-{tag}-gp-x.npy").reshape(-1, 2)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(xv[rng.choice(len(xv), 4096, replace=False)])
    hnorm = float(jnp.mean(truth_h(xs) ** 2))

    print(f"held-out: lv val {tag}, 4096 points; E||h*||^2 = {hnorm:.4f}")
    rows = []
    for name, (load_dir, sweep_dirs) in CKPTS.items():
        args = vars(get_args(["--config", "lv/noise99_eq_isymreg.cfg",
                              "--load_laligan", load_dir]))
        args["input_dim"] = 2
        ae_def, gspec, _ = build_models(args)
        k = jax.random.PRNGKey(0)
        ae_params, ae_bstats = ae_def.init(k)
        g_state = lg.init_generator(k, gspec)
        bundle = {"ae": ae_params, "d": {}, "g": g_state}
        bundle, ae_bstats = ckpt.load_laligan(load_dir, bundle, ae_bstats)
        ae_params, g_state = bundle["ae"], bundle["g"]

        pen = float(symmreg_r(ae_def, ae_params, ae_bstats, gspec, g_state,
                              xs, truth_h))

        # A raw truth-equivariance residual conflates symmetry QUALITY with
        # transformation MAGNITUDE: a near-trivial g (g(x) ~ x) makes every
        # vector field equivariant, scoring near zero while being useless as
        # a discovery regularizer. Two fixes measured here:
        #   disp  — E||g(x) - x||^2, the transformation magnitude;
        #   discr — pen(truth) / median(pen over wrong candidate fields):
        #           a USEFUL symmetry gives the true dynamics a much lower
        #           penalty than plausible wrong ones (ratio << 1); a
        #           trivial one scores everything ~equally (ratio ~ 1).
        from symmetry_ode_discovery_tpu.training.symmreg import (
            _group_transform)
        from symmetry_ode_discovery_tpu.models.lie_generator import (
            get_deterministic_group_elems)
        disp = 0.0
        for g in get_deterministic_group_elems(gspec, g_state, scale=0.01):
            gx = _group_transform(ae_def, ae_params, ae_bstats, g, xs,
                                  normalize="global", z_mean=None)
            disp += float(jnp.mean((gx - xs) ** 2))

        def wrongs():
            # plausible wrong dynamics: component swap, sign flip, a linear
            # least-squares fit of h*, and coefficient perturbations
            h0 = truth_h(xs)
            A, _, _, _ = np.linalg.lstsq(np.asarray(xs), np.asarray(h0),
                                         rcond=None)
            yield lambda x: truth_h(x)[:, ::-1]
            yield lambda x: -truth_h(x)
            yield lambda x: x @ jnp.asarray(A)
            yield lambda x: 1.5 * truth_h(x)
            yield lambda x: truth_h(x) + 0.5 * x
        pen_wrong = [float(symmreg_r(ae_def, ae_params, ae_bstats, gspec,
                                     g_state, xs, w)) for w in wrongs()]
        discr = pen / float(np.median(pen_wrong))

        # The sharpest candidate set: the WRONG equations plain SINDy
        # actually discovers on this protocol (eval_results/sindy2-noise99-lv,
        # poly2+exp basis [1,z0,z1,z0^2,z0z1,z1^2,e^z0,e^z1]). A useful
        # symmetry regularizer must penalize these noise-fit solutions more
        # than the truth: sep = median pen(plain wrong) / pen(truth).
        def field_of(C):
            Cj = jnp.asarray(C, jnp.float32)

            def h(x):
                feats = jnp.stack(
                    [jnp.ones_like(x[:, 0]), x[:, 0], x[:, 1],
                     x[:, 0] ** 2, x[:, 0] * x[:, 1], x[:, 1] ** 2,
                     jnp.exp(x[:, 0]), jnp.exp(x[:, 1])], axis=1)
                return feats @ Cj.T
            return h

        plain = sorted(glob.glob("eval_results/sindy2-noise99-lv/seed*.npz"))
        pens_plain = []
        for f in plain:
            z = np.load(f)
            if np.all(z["correct_form"] > 0):
                continue  # only the wrong solutions
            pens_plain.append(float(symmreg_r(
                ae_def, ae_params, ae_bstats, gspec, g_state, xs,
                field_of(z["coefficients"]))))
        sep = float(np.median(pens_plain)) / pen if pens_plain else float("nan")

        z, _ = ae_def.encode(ae_params, ae_bstats, xs)
        xr = ae_def.decode(ae_params, z)
        recon = float(jnp.mean((xr - xs) ** 2) / jnp.mean(xs ** 2))
        closure = float(lg.reg_closure(gspec, g_state))
        ortho = float(lg.reg_ortho(gspec, g_state))
        norm = float(lg.reg_norm(gspec, g_state))
        d, n_sw, joint, eq0, eq1, joint25 = downstream(sweep_dirs)
        rows.append((name, pen, disp, discr, sep, recon, closure, ortho,
                     norm, d, n_sw, joint, eq0, eq1, joint25))

    print(f"{'ckpt':5} {'truth-equiv':>11} {'disp':>9} {'discrim':>9} "
          f"{'sep':>7} {'AE recon':>9} {'closure':>8} {'ortho':>8} "
          f"{'norm':>7}  downstream joint/eq0/eq1 (joint@25)")
    for r in rows:
        ds = (f"{r[9]}: {r[11]}/{r[10]} {r[12]}/{r[13]} ({r[14]}/25)"
              if r[9] else "(no sweep)")
        print(f"{r[0]:5} {r[1]:11.3e} {r[2]:9.3e} {r[3]:9.3f} {r[4]:7.2f} "
              f"{r[5]:9.5f} {r[6]:8.2e} {r[7]:8.2e} {r[8]:7.3f}  {ds}")

    # rank statistics over checkpoints WITH downstream evidence, on the
    # common 25-seed budget (round-5 verdict item 3: n>=10 equilibria)
    have = [r for r in rows if r[9] is not None]
    if len(have) >= 3:
        y = [r[14] for r in have]
        print(f"\nrank correlation vs downstream joint@25 "
              f"(n={len(have)} equilibria):")
        for label, idx in (("truth-equiv penalty magnitude", 1),
                           ("transformation displacement", 2),
                           ("discrim (pen/median wrong)", 3),
                           ("sep (plain-wrong/truth)", 4),
                           ("AE recon (lower=better)", 5)):
            xs_c = [r[idx] for r in have]
            print(f"  {label:32} rho = {spearman(xs_c, y):+.3f}")


if __name__ == "__main__":
    main()

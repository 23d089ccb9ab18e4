"""Success-vs-noise curves: plain SINDy vs EquivSINDy-c, one kernel per curve.

The paper's central figure is the noise-robustness curve — symmetry
information keeps equation recovery alive as noise grows. The reference
would produce one point of that curve per (method, level) as a 50-relaunch
bash loop. Here a full curve is one stacked Pallas sweep
(training/sweep.py::sweep_sindy_lbfgs_stacked): levels x 50 seeds of the
complete L-BFGS discovery protocol in seconds.

Protocols per method follow run_configs/{system}/ verbatim:
  sindy   — noise20_sindy.cfg-style (poly2, subsample 0.5, 200 epochs,
            st_freq 50, threshold 5e-2; lv uses its sindy_2 protocol:
            poly2+exp, subsample 0.01, lr 0.1, st_freq 20, threshold 0.15)
  esindy  — noise20_esindy.cfg-style hard constraint (dosc: so2; growth:
            scaling2 + constrained constant; lv/selkov have no fixed-group
            esindy config — reference uses learned symmetry there)
  wsindy  — noise*_wsindy.cfg (per seed one random trajectory + random 80%
            window, 10 weak-solve epochs; vmapped, not Pallas)

Writes eval_results/noisecurve-{system}-{method}-noise{NN}/seed{K}.npz (the
standard aggregate schema) and prints a per-method table + one JSON line.

Usage:
  python tools/noise_curve.py --system dosc [--methods sindy esindy]
                              [--n_seeds 50] [--no_save]
Only levels whose GP caches exist are swept (cache gen ~5 min/level:
python -m symmetry_ode_discovery_tpu.data.gen --system dosc --noise NL --smoothing gp).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL_LEVELS = [0.0, 0.05, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99]

# Fixed-group generators (reference gan.py construct_group_representation)
SO2 = np.array([[0.0, 1.0], [-1.0, 0.0]], dtype=np.float32)
SCALING2 = np.array([[2.0, 0.0], [0.0, 1.0]], dtype=np.float32)


def make_protocol(system, method):
    """(make_config kwargs, LBFGSHParams kwargs, lbfgs_subsample)."""
    if method == "sindy":
        if system == "lv":
            # run_configs/lv/noise99_eq_sindy_2.cfg
            return (dict(poly_order=2, include_exp=True, threshold=0.15),
                    dict(num_epochs=100, lr_sindy=0.1, st_freq=20,
                         threshold=0.15), 0.01)
        if system == "selkov":
            # run_configs/selkov/noise20_eq_sindy.cfg: poly3, 7.5e-2
            return (dict(poly_order=3, threshold=7.5e-2),
                    dict(num_epochs=200, lr_sindy=1.0, st_freq=50,
                         threshold=7.5e-2), 0.5)
        lr = 0.1 if system == "dosc" else 1.0
        # run_configs/{dosc,growth}/noise*_sindy.cfg
        return (dict(poly_order=2, threshold=5e-2),
                dict(num_epochs=200, lr_sindy=lr, st_freq=50,
                     threshold=5e-2), 0.5)
    if method == "esindy":
        if system == "dosc":
            # run_configs/dosc/noise20_esindy.cfg: (1,so2), threshold 1e-2
            return (dict(poly_order=2, L_list=[SO2], threshold=1e-2),
                    dict(num_epochs=100, lr_sindy=1.0, st_freq=100,
                         threshold=1e-2), 0.5)
        if system == "growth":
            # run_configs/growth/noise05_esindy.cfg: scaling2 + const column
            return (dict(poly_order=2, L_list=[SCALING2],
                         constrain_constant=True, threshold=5e-2),
                    dict(num_epochs=100, lr_sindy=1.0, st_freq=100,
                         threshold=5e-2), 0.5)
        raise SystemExit(f"no fixed-group esindy protocol for {system} "
                         "(the reference constrains only dosc/growth)")
    if method == "wsindy":
        # run_configs/*/noise*_wsindy.cfg
        if system == "lv":
            return (dict(poly_order=2, include_exp=True, threshold=0.15),
                    dict(w_sindy_reg=0.0, threshold=0.15), None)
        if system == "selkov":
            return (dict(poly_order=3, threshold=7.5e-2),
                    dict(w_sindy_reg=0.0, threshold=7.5e-2), None)
        reg = 0.05 if system == "growth" else 0.0
        return (dict(poly_order=2, threshold=5e-2),
                dict(w_sindy_reg=reg, threshold=5e-2), None)
    raise SystemExit(f"unknown method {method}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", required=True,
                    choices=["dosc", "growth", "lv", "selkov"])
    ap.add_argument("--methods", nargs="+", default=["sindy", "esindy"])
    ap.add_argument("--n_seeds", type=int, default=50)
    ap.add_argument("--no_save", action="store_true")
    args = ap.parse_args()

    import jax

    from symmetry_ode_discovery_tpu.data.datasets import (DATA_PATH,
                                                           ODEDataset,
                                                           ode_dt_dict)
    from symmetry_ode_discovery_tpu.evaluation import sindy_truth
    from symmetry_ode_discovery_tpu.evaluation.eval_eq import save_eval_results
    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training.siged import LBFGSHParams
    from symmetry_ode_discovery_tpu.training.sweep import (
        sweep_sindy_lbfgs_stacked, sweep_wsindy)

    levels = [nl for nl in ALL_LEVELS if os.path.exists(os.path.join(
        DATA_PATH,
        f"{args.system}-train-noise{int(100 * nl):02d}-gp-x.npy"))]
    skipped = [nl for nl in ALL_LEVELS if nl not in levels]
    if skipped:
        print(f"skipping levels with no GP cache: {skipped} (generate via "
              f"python -m symmetry_ode_discovery_tpu.data.gen)",
              file=sys.stderr)
    if not levels:
        print(json.dumps({"error": f"no {args.system} GP caches present",
                          "skipped_levels": [f"{nl:.2f}" for nl in skipped]}))
        return 1

    ds = [ODEDataset.make(args.system, "train", noise=nl, smoothing="gp")
          for nl in levels]
    seeds = np.arange(args.n_seeds)
    truth = sindy_truth[args.system]

    summary = {}
    walls = {}
    for method in args.methods:
        cfg_kw, hp_kw, subsample = make_protocol(args.system, method)
        cfg, Q = make_config(2, **cfg_kw)

        if method == "wsindy":
            dt = ode_dt_dict[args.system]

            def run():
                return [sweep_wsindy(cfg, d.trajs_x, dt, truth, seeds,
                                     w_sindy_reg=hp_kw["w_sindy_reg"],
                                     threshold=hp_kw["threshold"],
                                     num_epochs=10) for d in ds]
        else:
            hp = LBFGSHParams(w_sindy_x=1.0, w_sindy_reg=0.0,
                              sindy_reg_type="l1", **hp_kw)

            def run():
                return sweep_sindy_lbfgs_stacked(
                    cfg, Q, [d.x for d in ds], [d.dx for d in ds], truth, hp,
                    seeds, lbfgs_subsample=subsample)

        run()  # warmup compile
        t0 = time.time()
        results = run()
        walls[method] = time.time() - t0

        rows = {}
        for nl, res in zip(levels, results):
            ok = np.all(res.correct_form > 0, axis=1)
            rows[f"{nl:.2f}"] = int(ok.sum())
            if not args.no_save:
                per_seed = res.results_list()
                run_name = (f"noisecurve-{args.system}-{method}"
                            f"-noise{int(100 * nl):02d}")
                for i, s in enumerate(seeds):
                    save_eval_results(per_seed[i], run_name, int(s))
        summary[method] = rows

    print(f"\n  {args.system}: joint success /{args.n_seeds} vs noise")
    print(f"  {'noise':>6} " + " ".join(f"{m:>8}" for m in args.methods))
    for nl in levels:
        k = f"{nl:.2f}"
        print(f"  {k:>6} " + " ".join(
            f"{summary[m][k]:>8}" for m in args.methods))
    print()

    print(json.dumps({
        "metric": f"{args.system}_noise_curve",
        "n_seeds": args.n_seeds, "levels": [f"{nl:.2f}" for nl in levels],
        "skipped_levels": [f"{nl:.2f}" for nl in skipped],
        "success_by_noise": summary,
        "wall_s": {m: round(w, 3) for m, w in walls.items()},
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""All-noise-levels LV discovery sweep — the north-star metric, literally.

BASELINE.json: "a full multi-seed discovery sweep (50 seeds, ALL NOISE
LEVELS) on Lotka-Volterra completes in under one minute on a single v5e-8".
The reference would run this as noise_levels x 50 sequential process
relaunches (run_scripts/lv_noise99_eq_sindy2.sh per level). Here the noise
level is just a second sweep axis of the fused Pallas L-BFGS kernel
(training/sweep.py::sweep_sindy_lbfgs_stacked): 11 levels x 50 seeds = 550
full discovery protocols, one compiled kernel, a few seconds on ONE chip.

Protocol per lane = run_configs/lv/noise99_eq_sindy_2.cfg (poly2+exp library,
lbfgs_subsample 0.01, lr 0.1, st_freq 20, threshold 0.15, 100 epochs),
applied at every noise level.

Writes eval_results/allnoise-lv-sindy-noise{NN}/seed{K}.npz per level (the
standard aggregate_results schema) and prints a success-vs-noise table plus
one JSON summary line.

Usage:  python tools/bench_allnoise.py [--n_seeds 50] [--skip_missing]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOISE_LEVELS = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_seeds", type=int, default=50)
    ap.add_argument("--skip_missing", action="store_true",
                    help="only sweep levels whose caches exist (never "
                    "regenerate; cache gen is ~5 min/level on the tunnel)")
    ap.add_argument("--no_save", action="store_true")
    args = ap.parse_args()

    import jax

    from symmetry_ode_discovery_tpu.data.datasets import DATA_PATH, ODEDataset
    from symmetry_ode_discovery_tpu.evaluation import sindy_truth
    from symmetry_ode_discovery_tpu.evaluation.eval_eq import save_eval_results
    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training.siged import LBFGSHParams
    from symmetry_ode_discovery_tpu.training.sweep import sweep_sindy_lbfgs_stacked

    levels = NOISE_LEVELS
    if args.skip_missing:
        levels = [nl for nl in levels if os.path.exists(os.path.join(
            DATA_PATH, f"lv-train-noise{int(100 * nl):02d}-gp-x.npy"))]
        if not levels:
            print(json.dumps({"error": "no LV caches present"}))
            return 1

    t0 = time.time()
    ds = [ODEDataset.make("lv", "train", noise=nl, smoothing="gp")
          for nl in levels]
    t_data = time.time() - t0

    cfg, _ = make_config(2, poly_order=2, include_exp=True, threshold=0.15)
    hp = LBFGSHParams(num_epochs=100, lr_sindy=0.1, w_sindy_x=1.0,
                      w_sindy_reg=0.0, sindy_reg_type="l1",
                      st_freq=20, threshold=0.15)
    seeds = np.arange(args.n_seeds)
    truth = sindy_truth["lv"]

    def run():
        return sweep_sindy_lbfgs_stacked(
            cfg, None, [d.x for d in ds], [d.dx for d in ds], truth, hp,
            seeds, lbfgs_subsample=0.01)

    run()  # warmup: compiles the prep program + the kernel once
    t0 = time.time()
    results = run()
    wall = time.time() - t0

    rows = []
    for nl, res in zip(levels, results):
        ok = np.all(res.correct_form > 0, axis=1)
        rmse = float(np.mean(np.sqrt(res.mse[ok]))) if ok.any() else None
        rows.append({"noise": nl, "joint": int(ok.sum()),
                     "eq0": int((res.correct_form[:, 0] > 0).sum()),
                     "eq1": int((res.correct_form[:, 1] > 0).sum()),
                     "rmse_valid": rmse})
        if not args.no_save:
            per_seed = res.results_list()
            for i, s in enumerate(seeds):
                save_eval_results(per_seed[i],
                                  f"allnoise-lv-sindy-noise{int(100 * nl):02d}",
                                  int(s))

    print(f"\n  LV plain-SINDy discovery, {args.n_seeds} seeds x "
          f"{len(levels)} noise levels = {len(levels) * args.n_seeds} "
          f"L-BFGS protocols")
    print(f"  {'noise':>6} {'joint':>6} {'eq0':>5} {'eq1':>5}  rmse(valid)")
    for r in rows:
        rm = f"{r['rmse_valid']:.4f}" if r["rmse_valid"] is not None else "-"
        print(f"  {r['noise']:>6.2f} {r['joint']:>4}/{args.n_seeds}"
              f" {r['eq0']:>5} {r['eq1']:>5}  {rm}")
    print(f"  sweep wall clock: {wall:.3f} s  (data load: {t_data:.1f} s)\n")

    # vs_baseline pro-rated by coverage: the 60 s budget is for all 11 levels
    print(json.dumps({
        "metric": "lv_allnoise_50seed_sweep_wallclock",
        "value": round(wall, 3), "unit": "s",
        "vs_baseline": round(60.0 * len(levels) / len(NOISE_LEVELS) / wall, 1),
        "n_levels": len(levels), "n_seeds": args.n_seeds,
        "skipped_levels": [nl for nl in NOISE_LEVELS if nl not in levels],
        "data_load_s": round(t_data, 1),
        "success_by_noise": {f"{r['noise']:.2f}": r["joint"] for r in rows},
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Sweep aggregation CLI: counterpart of the reference's
evaluation/eval_eq.aggregate_results + notebooks/eval_results.ipynb.

    python -m symmetry_ode_discovery_tpu.cli.aggregate esindy-noise20-dosc --max_seed 50

--impute_nan reproduces the notebook variant (cell 2: NaN RMSE entries are
replaced by the max observed RMSE before averaging).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    from ..evaluation.eval_eq import aggregate_results

    parser = argparse.ArgumentParser()
    parser.add_argument("run_name")
    parser.add_argument("--min_seed", type=int, default=0)
    parser.add_argument("--max_seed", type=int, default=100)
    parser.add_argument("--mse_multiplier", type=float, default=1.0)
    parser.add_argument("--result_dir", type=str, default="eval_results")
    parser.add_argument("--impute_nan", action="store_true",
                        help="notebook variant: impute NaN RMSE with the max")
    args = parser.parse_args(argv)

    if not args.impute_nan:
        aggregate_results(args.run_name, args.min_seed, args.max_seed,
                          args.mse_multiplier, args.result_dir)
        return

    # notebook variant (eval_results.ipynb cell 2)
    import os

    directory = os.path.join(args.result_dir, args.run_name)
    cf, mse = [], []
    for filename in os.listdir(directory):
        if not filename.endswith(".npz"):
            continue
        seed = int(filename.split(".")[0][4:])
        if seed >= args.max_seed or seed < args.min_seed:
            continue
        res = np.load(os.path.join(directory, filename))
        cf.append(res["correct_form"])
        mse.append(res["mse"])
    cf = np.stack(cf)
    rmse = np.sqrt(np.stack(mse))
    rmse = np.where(np.isnan(rmse), np.nanmax(rmse), rmse)
    n = cf.shape[0]
    print(f"Loaded results from {n} runs.")
    for i in range(cf.shape[1]):
        print(f"Equation {i} success rate = {int(cf[:, i].sum())}/{n}")
    print(f"Joint success rate = {int(np.all(cf, axis=1).sum())}/{n}")
    for i in range(rmse.shape[1]):
        m, s = rmse[:, i].mean() * args.mse_multiplier, rmse[:, i].std() * args.mse_multiplier
        print(f"Equation {i} RMSE (imputed) = {m:.4f} ({s:.4f})")


if __name__ == "__main__":
    main()

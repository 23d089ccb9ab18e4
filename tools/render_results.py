"""Render the RESULTS.md sweep table from eval_results/ directories.

One markdown row per run: joint success, per-equation success, RMSE over
the form-correct seeds (the notebook's valid-only aggregation, reference
notebooks/eval_results.ipynb cell 3) — so RESULTS.md updates after a sweep
are mechanical instead of hand-copied.

Usage:
    python tools/render_results.py [run ...]       # default: every run dir
    python tools/render_results.py --max_seed 50
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from symmetry_ode_discovery_tpu.evaluation.eval_eq import load_seed_results


def row(run: str, result_dir: str, max_seed: int) -> str | None:
    d = os.path.join(result_dir, run)
    cf, mse, cf_all, mse_all = load_seed_results(d, 0, max_seed)
    if not cf:
        return None
    n = len(cf)
    cf = np.stack(cf)          # (n, d)
    joint = int(np.sum(np.asarray(cf_all)))
    per_eq = " ".join(f"eq{i} {int(cf[:, i].sum())}/{n}"
                      for i in range(cf.shape[1]))
    rmse = np.sqrt(np.stack(mse))          # (n, d)
    ok = np.asarray(cf_all, bool)
    if ok.any():
        r = rmse[ok].mean(axis=1)          # per-seed mean over equations
        rmse_txt = f"{r.mean():.4f} ± {r.std():.4f} (n={int(ok.sum())})"
    else:
        rmse_txt = "—"
    return f"| {run} | {joint}/{n} | {per_eq} | {rmse_txt} |"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="*", help="run names (default: all dirs)")
    ap.add_argument("--result_dir", default="eval_results")
    ap.add_argument("--max_seed", type=int, default=50)
    ap.add_argument("--all", action="store_true",
                    help="include _*-prefixed scratch runs")
    args = ap.parse_args(argv)

    runs = args.runs or sorted(
        r for r in os.listdir(args.result_dir)
        if os.path.isdir(os.path.join(args.result_dir, r))
        and (args.all or not r.startswith("_")))
    print("| Run | Joint success | Per-equation | RMSE (valid seeds) |")
    print("|---|---|---|---|")
    for run in runs:
        line = row(run, args.result_dir, args.max_seed)
        if line:
            print(line)


if __name__ == "__main__":
    main()

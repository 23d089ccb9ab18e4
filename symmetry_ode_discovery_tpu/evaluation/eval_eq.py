"""Equation-discovery evaluation: form recovery + coefficient MSE + multi-seed
aggregation.

TPU-native counterpart of reference evaluation/eval_eq.py. The per-seed metric
(`eval_sindy_coefficients`) is pure jnp/numpy so it vmaps across a whole seed
sweep at once; `aggregate_results` reproduces the reference's report format
(success rates, RMSE valid/any) from stacked per-seed arrays or from on-disk
seed{N}.npz files.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# Ground-truth coefficient matrices in the library's term ordering
# (reference evaluation/eval_eq.py:88-105). lv uses poly2+exp (8-col basis
# [1, z0, z1, z0z0, z0z1, z1z1, exp(z0), exp(z1)]); dosc/growth use poly2
# (6 cols); selkov poly3 (10 cols).
sindy_truth: Dict[str, np.ndarray] = {
    "lv": np.array([
        [2 / 3, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -4 / 3],
        [-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0],
    ]),
    "selkov": np.array([
        [0.75, -0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -1.0, 0.0],
        [0.0, 0.1, -1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0],
    ]),
    "dosc": np.array([
        [0.0, -0.1, -1, 0.0, 0.0, 0.0],
        [0.0, 1, -0.1, 0.0, 0.0, 0.0],
    ]),
    "growth": np.array([
        [0.0, -0.3, 0.0, 0.0, 0.0, 0.1],
        [0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
    ]),
}


def eval_sindy_coefficients(coef: np.ndarray, mask: np.ndarray, truth: np.ndarray):
    """Evaluate one fitted coefficient matrix against the ground truth.

    Matches reference eval_sindy_regressor (evaluation/eval_eq.py:7-34):
    correct form = exact support match per equation; MSE over the TRUTH support
    (computed regardless of form correctness).

    Returns dict with coefficients / correct_form / mse / correct_form_all /
    mse_all (the reference's npz schema, main.py:128-134).
    """
    coef = np.asarray(coef)
    mask = np.asarray(mask).astype(bool)
    coef = np.where(mask, coef, 0.0)
    truth_mask = truth != 0
    n_eqs = coef.shape[0]
    correct_form = np.zeros(n_eqs)
    mse = np.ones(n_eqs) * -1.0
    for i in range(n_eqs):
        correct_form[i] = np.all(mask[i, :] == truth_mask[i, :])
        mse[i] = np.mean((coef[i, truth_mask[i, :]] - truth[i, truth_mask[i, :]]) ** 2)
    return {
        "coefficients": coef,
        "correct_form": correct_form,
        "mse": mse,
        "correct_form_all": np.all(correct_form),
        "mse_all": np.mean(mse),
    }


def save_eval_results(results: dict, save_dir: str, seed: int, root: str = "eval_results"):
    """Write eval_results/{save_dir}/seed{N}.npz (reference main.py:128-138)."""
    out = os.path.join(root, save_dir)
    os.makedirs(out, exist_ok=True)
    np.savez(os.path.join(out, f"seed{seed}.npz"), **results)


def load_seed_results(directory: str, min_seed: int = 0, max_seed: int = 100):
    """Load seed{N}.npz results from a run directory (reference
    eval_eq.py:43-51 loading loop). Only strict seed{N}.npz names count —
    a stray summary/backup .npz in the dir must not abort aggregation.

    Returns (correct_form, mse, correct_form_all, mse_all) lists."""
    cf, mse, cf_all, mse_all = [], [], [], []
    for filename in os.listdir(directory):
        if not (filename.startswith("seed") and filename.endswith(".npz")):
            continue
        stem = filename.split(".")[0][4:]
        if not stem.isdigit():
            continue
        seed = int(stem)
        if seed >= max_seed or seed < min_seed:
            continue
        res = np.load(os.path.join(directory, filename))
        cf.append(res["correct_form"])
        mse.append(res["mse"])
        cf_all.append(res["correct_form_all"])
        mse_all.append(res["mse_all"])
    return cf, mse, cf_all, mse_all


def aggregate_results(
    run_name: Optional[str] = None,
    min_seed: int = 0,
    max_seed: int = 100,
    mse_multiplier: float = 1.0,
    result_dir: str = "eval_results",
    results_list: Optional[list] = None,
    verbose: bool = True,
):
    """Aggregate per-seed results into success rates and RMSE stats.

    Reference evaluation/eval_eq.py:38-85. Accepts either a run_name (loads
    seed{N}.npz files) or an in-memory results_list (the vmapped sweep path —
    no filesystem round trip). Returns a summary dict.
    """
    cf, mse, cf_all, mse_all = [], [], [], []
    if results_list is None:
        cf, mse, cf_all, mse_all = load_seed_results(
            os.path.join(result_dir, run_name), min_seed, max_seed)
    else:
        for res in results_list:
            cf.append(res["correct_form"])
            mse.append(res["mse"])
            cf_all.append(res["correct_form_all"])
            mse_all.append(res["mse_all"])

    n = len(cf)
    if verbose:
        print(f"Loaded results from {n} runs.")
    cf = np.stack(cf)
    cf_sum = np.sum(cf, axis=0).astype(int)
    cf_all = np.asarray(cf_all)
    cf_all_sum = int(np.sum(cf_all))
    rmse = np.sqrt(np.stack(mse))
    rmse_all = np.sqrt(np.asarray(mse_all))

    summary = {
        "n_runs": n,
        "success_per_eq": cf_sum,
        "success_joint": cf_all_sum,
        "rmse_valid": [], "rmse_valid_std": [],
        "rmse_any": [], "rmse_any_std": [],
    }
    for i in range(cf.shape[1]):
        sel = np.where(cf[:, i])
        summary["rmse_valid"].append(float(np.mean(rmse[sel, i])) * mse_multiplier if len(sel[0]) else float("nan"))
        summary["rmse_valid_std"].append(float(np.std(rmse[sel, i])) * mse_multiplier if len(sel[0]) else float("nan"))
        summary["rmse_any"].append(float(np.mean(rmse[:, i])) * mse_multiplier)
        summary["rmse_any_std"].append(float(np.std(rmse[:, i])) * mse_multiplier)
    sel = np.where(cf_all)
    summary["rmse_all_valid"] = float(np.mean(rmse_all[sel])) * mse_multiplier if len(sel[0]) else float("nan")
    summary["rmse_all_valid_std"] = float(np.std(rmse_all[sel])) * mse_multiplier if len(sel[0]) else float("nan")
    summary["rmse_all_any"] = float(np.mean(rmse_all)) * mse_multiplier
    summary["rmse_all_any_std"] = float(np.std(rmse_all)) * mse_multiplier

    if verbose:
        for i, s in enumerate(cf_sum):
            print(f"Equation {i} success rate = {s}/{n}")
        print(f"Joint success rate = {cf_all_sum}/{n}")
        for i in range(cf.shape[1]):
            print(f"Equation {i} RMSE = {summary['rmse_valid'][i]:.4f} ({summary['rmse_valid_std'][i]:.4f})")
            print(f"Equation {i} RMSE (any) = {summary['rmse_any'][i]:.4f} ({summary['rmse_any_std'][i]:.4f})")
        print(f"All equations RMSE = {summary['rmse_all_valid']:.4f} ({summary['rmse_all_valid_std']:.4f})")
        print(f"All equations RMSE (any) = {summary['rmse_all_any']:.4f} ({summary['rmse_all_any_std']:.4f})")
    return summary

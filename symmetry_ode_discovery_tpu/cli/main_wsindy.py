"""Weak SINDy entry point (counterpart of reference main_wsindy.py).

Per seed: pick one random trajectory and a random 80%-length window, iterate
the weak-form solve to mask fixpoint, evaluate against sindy_truth.
--n_seeds N runs the whole sweep vmapped.

Usage: python -m symmetry_ode_discovery_tpu.cli.main_wsindy --config lv/noise99_eq_wsindy.cfg --seed 0
"""

from __future__ import annotations

import numpy as np


def run(args: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from ..data.datasets import get_dataset, ode_dt_dict
    from ..evaluation.eval_eq import save_eval_results, sindy_truth
    from ..models.sindy import make_config
    from ..training.sweep import sweep_wsindy
    from ..utils import checkpoint as ckpt

    seed = args["seed"]
    train_ds, _, args = get_dataset(args)
    x = train_ds.trajs_x  # (n_ics, n_steps, dim) view the dataset already holds
    dt = ode_dt_dict[args["task"]]

    cfg, _ = make_config(args["input_dim"], poly_order=args["poly_order"],
                         include_sine=args["include_sine"],
                         include_exp=args["include_exp"],
                         threshold=args["threshold"])
    truth = sindy_truth[args["task"]]
    n_seeds = args.get("n_seeds", 1)
    seeds = np.arange(seed, seed + n_seeds)
    res = sweep_wsindy(cfg, x, dt, truth, seeds,
                       w_sindy_reg=args["w_sindy_reg"],
                       threshold=args["threshold"],
                       num_epochs=args["num_epochs"],
                       n_mesh_devices=args.get("mesh_devices", 0),
                       subsample_rng=args.get("subsample_rng", "jax"))

    results = res.results_list()
    for i, s in enumerate(seeds):
        save_eval_results(results[i], args["save_dir"], int(s))
    ckpt.save_pytree(f"saved_models/{args['save_dir']}/regressor.npz",
                     {"Xi": res.Xi[0], "mask": res.mask[0]})
    if n_seeds == 1:
        print("\n=== Evaluation ===\n")
        print(f"Correct form: {results[0]['correct_form']}")
        print(f"MSE: {np.where(results[0]['correct_form'], results[0]['mse'], 0.0)}")
        print(f"MSE (any): {results[0]['mse']}")
    else:
        print(f"Swept {n_seeds} seeds -> eval_results/{args['save_dir']}")
    return {"results": results}


def main(argv=None):
    from ..utils.config import get_args
    from ..utils.watchdog import probe_first_dispatch

    args = vars(get_args(argv))
    # codified CLAUDE.md stall procedure (see cli/main.py)
    probe_first_dispatch()
    return run(args)


if __name__ == "__main__":
    main()

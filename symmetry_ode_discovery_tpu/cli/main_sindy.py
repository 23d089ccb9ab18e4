"""Direct-STLSQ SINDy entry point.

The reference's main_sindy.py is a broken legacy entry (its call into
train_SINDy matches a shadowed definition, reference train.py:272 vs :872 —
see SURVEY.md §2.11). This is the working equivalent of the surviving
train_SINDy (train.py:872-887): iterate the masked ridge lstsq + threshold to
mask fixpoint on the full dataset, vmappable over seeds with --n_seeds.

Usage: python -m symmetry_ode_discovery_tpu.cli.main_sindy --config dosc/noise20_sindy.cfg
"""

from __future__ import annotations

import numpy as np


def run(args: dict) -> dict:
    from ..data.datasets import get_dataset
    from ..evaluation.eval_eq import save_eval_results, sindy_truth
    from ..models.sindy import make_config
    from ..training.sweep import sweep_sindy_stlsq
    from ..utils import checkpoint as ckpt

    seed = args["seed"]
    train_ds, _, args = get_dataset(args)
    cfg, Q = make_config(args["input_dim"], poly_order=args["poly_order"],
                         include_sine=args["include_sine"],
                         include_exp=args["include_exp"],
                         threshold=args["threshold"])
    truth = sindy_truth[args["task"]]
    seeds = np.arange(seed, seed + args.get("n_seeds", 1))
    res = sweep_sindy_stlsq(cfg, Q, train_ds.x, train_ds.dx, truth, seeds,
                            w_sindy_reg=args["w_sindy_reg"],
                            threshold=args["threshold"],
                            max_iter=max(5, args["num_epochs"] // 20),
                            n_mesh_devices=args.get("mesh_devices", 0))
    results = res.results_list()
    for i, s in enumerate(seeds):
        save_eval_results(results[i], args["save_dir"], int(s))
    ckpt.save_pytree(f"saved_models/{args['save_dir']}/regressor.npz",
                     {"Xi": res.Xi[0], "mask": res.mask[0]})
    if len(seeds) == 1:
        print("\n=== Evaluation ===\n")
        print(f"Correct form: {results[0]['correct_form']}")
        print(f"MSE: {np.where(results[0]['correct_form'], results[0]['mse'], 0.0)}")
    else:
        print(f"Swept {len(seeds)} seeds -> eval_results/{args['save_dir']}")
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

"""Headline benchmark: Lotka-Volterra 50-seed equation-discovery sweep.

The reference runs this as a sequential bash loop — 50 process relaunches,
each doing a full L-BFGS SINDy fit (reference run_scripts/lv_noise99_eq_sindy.sh
+ run_configs/lv/noise99_eq_sindy_2.cfg). Here it is ONE batched TPU program:
vmap over the seed axis (per-seed data subsample + init + 100-epoch L-BFGS
with convergence-triggered thresholding + on-device evaluation).

North-star target (BASELINE.md): < 60 s wall clock on TPU.
vs_baseline = 60 / wall_clock (>1 means beating the target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from symmetry_ode_discovery_tpu.data.datasets import ODEDataset
    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training.siged import LBFGSHParams
    from symmetry_ode_discovery_tpu.training.sweep import sweep_sindy_lbfgs
    from symmetry_ode_discovery_tpu.evaluation import sindy_truth

    # Data: lv noise 0.99, GP-smoothed (cached after first generation).
    ds = ODEDataset.make("lv", "train", noise=0.99, smoothing="gp")
    x, dx = ds.x, ds.dx

    # Protocol of run_configs/lv/noise99_eq_sindy_2.cfg: poly2 + exp library,
    # lbfgs_subsample 0.01, lr 0.1, st_freq 20, threshold 0.15, 100 epochs.
    cfg, _ = make_config(2, poly_order=2, include_exp=True, threshold=0.15)
    hp = LBFGSHParams(num_epochs=100, lr_sindy=0.1, w_sindy_x=1.0,
                      w_sindy_reg=0.0, sindy_reg_type="l1",
                      st_freq=20, threshold=0.15)
    seeds = np.arange(50)

    def run():
        return sweep_sindy_lbfgs(cfg, None, x, dx, sindy_truth["lv"], hp,
                                 seeds, lbfgs_subsample=0.01, backend="pallas")

    # Warmup: compile (first compile through the TPU tunnel is slow and not
    # representative of sweep throughput).
    run()
    t0 = time.time()
    res = run()
    wall = time.time() - t0

    joint = float(np.mean(np.all(res.correct_form > 0, axis=1)))
    rmse = float(np.mean(np.sqrt(res.mse)))
    print(json.dumps({
        "metric": "lv_noise99_50seed_sweep_wallclock",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(60.0 / wall, 2),
        "joint_success_rate": joint,
        "mean_rmse": round(rmse, 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())

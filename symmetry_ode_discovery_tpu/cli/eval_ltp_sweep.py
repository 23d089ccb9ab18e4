"""Long-term-prediction (LTP) evaluation of a completed discovery sweep.

The reference ships `eval_ltp_accuracy` (reference evaluation/eval_ltp.py) as
a standalone utility but never wires it into an experiment. This CLI closes
that loop for sweep outputs: it loads every seed's discovered coefficient
matrix from `eval_results/{save_dir}/seed{N}.npz`, rolls the discovered
dynamics out with RK4 from the clean validation trajectories' initial states,
and reports the long-term prediction error against the ground-truth
trajectories — the paper's "does the discovered equation actually predict"
criterion, complementing the form-recovery tables.

TPU/JAX design: one `vmap` over the seed axis of a `vmap`-over-ICs `lax.scan`
RK4 rollout (ops/integrators.odeint) — all seeds of the sweep predict all
validation trajectories in a single compiled program. Failed discoveries can
(and do) blow up under rollout; the error for a diverged seed saturates to
inf/NaN, so the summary reports medians and the finite fraction rather than
bare means, split by form-correct vs incorrect seeds. The ground-truth
coefficient matrix is rolled out identically as the attainable floor
(nonzero: RK4-at-dt vs the generator's finer-dt discretization).

Usage:
    python -m symmetry_ode_discovery_tpu.cli.eval_ltp_sweep \
        --config lv/noise99_eq_sindy_2.cfg
"""

from __future__ import annotations

import os

import numpy as np


def ltp_sweep_errors(cfg, coefs, x, dt):
    """Relative LTP error for a stack of coefficient matrices.

    coefs: (S, d, p) masked coefficient matrices; x: (n_ics, n_steps, d)
    ground-truth trajectories. Returns (S, n_ics, n_steps-1) per-step relative
    squared error: MSE over dims, normalized by the trajectory's time-variance
    (so systems/scales are comparable).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.integrators import odeint

    x = jnp.asarray(x, jnp.float32)
    n_ics, n_steps, _ = x.shape
    t_max = (n_steps - 1) * dt
    scale = jnp.mean(jnp.var(x, axis=1), axis=-1)  # (n_ics,)

    def roll(coef):
        def fwd(q):
            return cfg.library(q) @ coef.T

        x_pred = odeint(fwd, x[:, 0], t_max, dt, method="rk4",
                        full_traj=True, num_steps=n_steps - 1)
        x_pred = x_pred.transpose(1, 0, 2)  # (n_ics, n_steps-1, d)
        err = jnp.mean((x[:, 1:] - x_pred) ** 2, axis=-1)
        return err / scale[:, None]

    return jax.jit(jax.vmap(roll))(jnp.asarray(coefs, jnp.float32))


def _summ(rel, label):
    """Per-seed time-mean relative error -> robust summary line."""
    # plain mean: any non-finite step (diverged rollout) marks the whole
    # seed non-finite, and the median is taken over the surviving seeds
    per_seed = rel.reshape(rel.shape[0], -1).mean(axis=1) if rel.size else np.array([])
    finite = np.isfinite(per_seed)
    med = float(np.median(per_seed[finite])) if finite.any() else float("nan")
    print(f"  {label}: n={len(per_seed)}, finite={int(finite.sum())}, "
          f"median rel. MSE={med:.4g}")
    return {"n": len(per_seed), "finite": int(finite.sum()), "median": med,
            "per_seed": per_seed}


def run(args: dict) -> dict:
    import numpy as np

    from ..data.datasets import ODEDataset, ode_dt_dict
    from ..evaluation.eval_eq import sindy_truth
    from ..models.sindy import make_config

    task = args["task"]
    run_name = args["save_dir"]

    # Clean ground-truth validation trajectories (noise 0, no smoothing).
    ds = ODEDataset.make(task, "val", noise=0.0, smoothing=None)
    x = ds.trajs_x
    dt = ode_dt_dict[task]

    # The coefficients live in the UNCONSTRAINED layout of the run's library
    # (eval_eq stores Xi*mask); the constraint only changes parameterization.
    cfg, _ = make_config(args["latent_dim"], poly_order=args["poly_order"],
                         include_sine=args["include_sine"],
                         include_exp=args["include_exp"],
                         threshold=args["threshold"])

    # every seed{N}.npz in the run dir (aggregate_results' discovery rule)
    coefs, correct = [], []
    rundir = os.path.join("eval_results", run_name)
    for fn in sorted(os.listdir(rundir) if os.path.isdir(rundir) else []):
        if not (fn.startswith("seed") and fn.endswith(".npz")):
            continue
        z = np.load(os.path.join(rundir, fn))
        coefs.append(z["coefficients"])
        correct.append(bool(np.all(z["correct_form"] > 0)))
    if not coefs:
        raise SystemExit(f"no seed npz under eval_results/{run_name}")
    coefs = np.stack(coefs)
    correct = np.asarray(correct)
    if coefs.shape[-1] != cfg.n_terms:
        raise SystemExit(
            f"library mismatch: run has p={coefs.shape[-1]}, config builds "
            f"p={cfg.n_terms} — pass the run's own --config")

    truth = sindy_truth.get(task)
    if truth is not None and truth.shape != coefs.shape[1:]:
        raise SystemExit(
            f"truth table for {task!r} is {truth.shape} but the run's "
            f"coefficients are {coefs.shape[1:]} — the run used a different "
            f"library than the task's evaluation basis")
    stack = np.concatenate([coefs, truth[None]], axis=0) if truth is not None else coefs
    rel = np.asarray(ltp_sweep_errors(cfg, stack, x, dt))
    rel_seeds, rel_truth = (rel[:-1], rel[-1:]) if truth is not None else (rel, None)

    print(f"LTP — {run_name}: {len(coefs)} seeds x {x.shape[0]} clean val "
          f"trajectories x {x.shape[1] - 1} steps (dt={dt})")
    out = {
        "all": _summ(rel_seeds, "all seeds"),
        "correct_form": _summ(rel_seeds[correct], "correct-form seeds"),
        "wrong_form": _summ(rel_seeds[~correct], "wrong-form seeds"),
    }
    if rel_truth is not None:
        out["truth_floor"] = _summ(rel_truth, "ground-truth floor")
    return out


def main(argv=None):
    # LTP eval is small dense work that runs fine on CPU — pin it there so
    # the documented invocation never contends for the single TPU chip
    # during sweeps (and never blocks at backend init in a tunnel outage).
    # Must go through jax.config BEFORE first device use: the image's
    # sitecustomize pins JAX_PLATFORMS to the axon TPU at interpreter start.
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ..utils.config import get_args

    return run(vars(get_args(argv)))


if __name__ == "__main__":
    main()

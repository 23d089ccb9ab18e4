"""Genetic-programming equation discovery (EquivGP-r / plain GP).

Counterpart of reference main_pysr.py, with the vectorized TPU tape engine
replacing PySR/SymbolicRegression.jl:
- plain mode: independent per-dimension symbolic regression with MSE loss
  (reference main_pysr.py:170-212);
- --pysr_symmreg: two-component system with the reversed-symmetry penalty,
  using g(x)/J_g(x) precomputed through the loaded LaLiGAN autoencoder
  (reference main_pysr.py:59-168).
Writes saved_models/{save_dir}/equation[s]_seed{N}.txt like the reference
(main_pysr.py:228-243).

Usage: python -m symmetry_ode_discovery_tpu.cli.main_gp --config lv/noise99_eq_gp.cfg
"""

from __future__ import annotations

import os

import numpy as np


# per-task GP search-space configs (reference main_pysr.py:135-212)
def _task_spec(task: str, n_vars: int):
    from ..symgp.tape import ADD, SUB, MUL, EXP, TapeSpec

    unary = (EXP,) if task == "lv" else ()
    maxsize = {"lv": 25, "selkov": 40}.get(task, 25)
    return TapeSpec(n_vars=n_vars, max_len=min(maxsize, 40),
                    binary_ops=(ADD, SUB, MUL), unary_ops=unary)


def run(args: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from ..data.datasets import get_dataset
    from ..symgp.evolve import GPConfig, symbolic_regression
    from ..symgp.objective import symbolic_regression_system
    from ..symgp.tape import tape_to_string
    from ..utils import checkpoint as ckpt
    from .main import build_models

    train_ds, _, args = get_dataset(args)
    x_all = np.asarray(train_ds.x)
    dx_all = np.asarray(train_ds.dx)
    subsample_size = int(len(x_all) * args["pysr_subsample"])
    n_vars = x_all.shape[1]
    spec = _task_spec(args["task"], n_vars)
    save_dir = f"saved_models/{args['save_dir']}"
    os.makedirs(save_dir, exist_ok=True)

    gx_fn = None
    if args["pysr_symmreg"]:
        if args.get("gp_select", "penalized") != "penalized":
            # The symmreg path reports the raw-loss winner unconditionally
            # (reference sets model_selection='accuracy', main_pysr.py:137,151)
            print("note: --gp_select is ignored with --pysr_symmreg "
                  "(symm mode always selects by raw loss, PySR 'accuracy')")
        if not args.get("load_laligan"):
            raise ValueError(
                "--pysr_symmreg needs a trained LaLiGAN checkpoint: pass "
                "--load_laligan <run_name> (the symmetry-regularized GP "
                "objective is meaningless without learned g(x)/J_g(x))")
        ae_def, gspec, _ = build_models(args)
        k = jax.random.PRNGKey(0)
        ae_params, ae_bstats = ae_def.init(k)
        from ..models import lie_generator as lg

        g_state = lg.init_generator(k, gspec)
        bundle = {"ae": ae_params, "d": {}, "g": g_state}
        bundle, ae_bstats = ckpt.load_laligan(args["load_laligan"], bundle, ae_bstats)
        ae_params, g_state = bundle["ae"], bundle["g"]

        from ..training.symmreg import make_precompute_symmreg_r

        # one jitted (g(x), J_g(x)) program reused across all seeds
        _pre = make_precompute_symmreg_r(ae_def, ae_params, ae_bstats, gspec,
                                         g_state)

        def gx_fn(x):
            return _pre(jnp.asarray(x))

    n_seeds = args.get("n_seeds", 1)
    seed0 = args["seed"]
    if n_seeds > 1:
        return _run_sweep_mode(args, x_all, dx_all, subsample_size, spec,
                               gx_fn, save_dir, seed0, n_seeds)
    results = []
    for seed in range(seed0, seed0 + n_seeds):
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(x_all), subsample_size, replace=False)
        x, dx = x_all[idx], dx_all[idx]
        cfg = GPConfig(pop_size=args.get("pysr_bs", 1000),
                       n_generations=args.get("gp_generations", 40),
                       seed=seed)
        if args["pysr_symmreg"]:
            gx_list, Jgx_list = gx_fn(x)
            best, hist = symbolic_regression_system(
                x, dx, spec, cfg,
                gx_list=[np.asarray(g) for g in gx_list],
                Jgx_list=[np.asarray(J) for J in Jgx_list],
                w_sym_reg=args["w_sym_reg"], verbose=args.get("print_eq", False))
            eqs = [tape_to_string(best[0][c], best[1][c], best[2][c])
                   for c in range(2)]
            with open(f"{save_dir}/equation_seed{seed}.txt", "w") as f:
                f.write("\n".join(eqs))
        else:
            eqs = []
            for d in range(dx.shape[1]):
                best, hist = symbolic_regression(x, dx[:, d], spec, cfg)
                eqs.append(tape_to_string(*best))
            with open(f"{save_dir}/equations_seed{seed}.txt", "w") as f:
                f.write("\n".join(eqs))
        print(f"seed {seed}:")
        for i, e in enumerate(eqs):
            print(f"  dx{i} = {e}")
        results.append(eqs)
    return {"equations": results}


def _run_sweep_mode(args, x_all, dx_all, subsample_size, spec, gx_fn,
                    save_dir, seed0, n_seeds):
    """Multi-seed sweep: seeds as a device batch axis (symgp/sweep.py),
    evaluated with the standard SINDy tooling via the sympy form projector
    (symgp/eval_gp.py). Writes eval_results/{save_dir}/seed{N}.npz like every
    other entry point, so cli.aggregate works unchanged."""
    import numpy as np

    from ..evaluation.eval_eq import save_eval_results
    from ..symgp.evolve import GPConfig
    from ..symgp.eval_gp import eval_gp_equations
    from ..symgp.sweep import gp_sweep_plain, gp_sweep_system
    from ..symgp.tape import tape_to_string

    # Resume support: a sweep interrupted by a TPU worker restart (the axon
    # tunnel kills long-lived workers; see CLAUDE.md) re-runs only the seeds
    # whose eval npz is missing. Pass --overwrite_eval to redo everything.
    done_seeds = set()
    if not args.get("overwrite_eval"):
        for s in range(seed0, seed0 + n_seeds):
            if os.path.exists(f"eval_results/{args['save_dir']}/seed{s}.npz"):
                done_seeds.add(s)
    if done_seeds:
        print(f"resume: skipping {len(done_seeds)} already-evaluated seeds")

    seeds = [s for s in range(seed0, seed0 + n_seeds) if s not in done_seeds]
    chunk = max(1, args.get("seed_chunk", 10))
    task = args["task"]
    # results keyed by seed so the return value covers resumed seeds too
    # (their equations reload from the saved txt artifacts)
    eq_name = ("equation_seed{}.txt" if args["pysr_symmreg"]
               else "equations_seed{}.txt")
    results = {}
    for s in done_seeds:
        p = f"{save_dir}/{eq_name.format(s)}"
        if os.path.exists(p):
            with open(p) as f:
                results[s] = f.read().strip().splitlines()

    # Sweep-mode fitness batching (reference --pysr_bs analog): the per-seed
    # protocol subsample can reach 10^4 rows (lv/selkov); cap the rows the
    # device evaluates per generation. rng.choice is already uniform, so
    # truncating keeps a uniform subsample of the protocol's subsample.
    cap = args.get("gp_fitness_rows", 2500) or subsample_size
    fit_rows = min(subsample_size, cap)

    for lo in range(0, len(seeds), chunk):
        sub_seeds = seeds[lo:lo + chunk]
        cfg = GPConfig(pop_size=args.get("pysr_bs", 1000),
                       n_generations=args.get("gp_generations", 40),
                       seed=seed0)

        mesh = None
        if args.get("mesh_devices", 0) and args["mesh_devices"] > 1:
            # unit axis (seeds, or seed x dim pairs) sharded over the mesh —
            # same embarrassingly-parallel recipe as the L-BFGS sweeps
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(args["mesh_devices"], axis="seed")

        import jax.numpy as jnp

        eval_dtype = (jnp.bfloat16
                      if args.get("gp_eval_dtype", "f32") == "bf16" else None)
        eval_backend = args.get("gp_eval_backend", "xla")
        grad_backend = args.get("gp_grad_backend", "xla")

        def run_chunk():
            # per-seed subsample + the (g(x), J_g(x)) TPU precompute live
            # INSIDE the retry: a worker restart during the precompute must
            # be retried like one during the sweep itself
            xs, dxs, gxs, Jgs = [], [], [], []
            for seed in sub_seeds:
                rng = np.random.default_rng(seed)
                idx = rng.choice(len(x_all), subsample_size,
                                 replace=False)[:fit_rows]
                xs.append(x_all[idx])
                dxs.append(dx_all[idx])
                if args["pysr_symmreg"]:
                    gx_list, Jgx_list = gx_fn(x_all[idx])
                    gxs.append(np.stack([np.asarray(g) for g in gx_list]))
                    Jgs.append(np.stack([np.asarray(J) for J in Jgx_list]))
            X = np.stack(xs)
            dX = np.stack(dxs)
            if args["pysr_symmreg"]:
                per_seed, _ = gp_sweep_system(
                    X, dX, spec, cfg, sub_seeds,
                    gx_all=np.stack(gxs), Jgx_all=np.stack(Jgs),
                    w_sym_reg=args["w_sym_reg"],
                    verbose=args.get("print_eq", False), mesh=mesh,
                    eval_dtype=eval_dtype, eval_backend=eval_backend,
                    grad_backend=grad_backend)
                return per_seed, "equation_seed{}.txt"
            per_seed, _ = gp_sweep_plain(X, dX, spec, cfg, sub_seeds,
                                         verbose=args.get("print_eq", False),
                                         mesh=mesh, eval_dtype=eval_dtype,
                                         eval_backend=eval_backend,
                                         grad_backend=grad_backend,
                                         select=args.get("gp_select",
                                                         "penalized"))
            return per_seed, "equations_seed{}.txt"

        # One retry per chunk: the axon tunnel occasionally restarts the TPU
        # worker mid-run (FAILED_PRECONDITION on the next dispatch); the
        # second attempt runs against the fresh worker. Completed chunks are
        # already on disk, so a crashed process restarts where it left off.
        import jax

        try:
            per_seed, eq_file = run_chunk()
        except jax.errors.JaxRuntimeError as e:
            print(f"chunk {sub_seeds[0]}-{sub_seeds[-1]} device error "
                  f"({type(e).__name__}); retrying once")
            per_seed, eq_file = run_chunk()
        from ..utils.watchdog import beat

        beat()

        for seed, best in zip(sub_seeds, per_seed):
            eqs = [tape_to_string(*b) for b in best]
            with open(f"{save_dir}/{eq_file.format(seed)}", "w") as f:
                f.write("\n".join(eqs))
            # strictly-below-threshold terms are dropped; keep the cut under
            # the smallest true coefficient (0.1 in dosc/growth)
            res = eval_gp_equations(eqs, task,
                                    threshold=min(args["threshold"], 0.05))
            save_eval_results(res, args["save_dir"], seed)
            results[seed] = eqs
            print(f"seed {seed}: correct_form={res['correct_form']}  "
                  + "  ".join(f"dx{i}={e}" for i, e in enumerate(eqs)))
    print(f"Swept {len(seeds)} GP seeds ({len(done_seeds)} resumed) -> "
          f"eval_results/{args['save_dir']}")
    return {"equations": [results.get(s)
                          for s in range(seed0, seed0 + n_seeds)]}


def main(argv=None):
    from ..utils.config import get_args
    from ..utils.watchdog import probe_first_dispatch

    args = vars(get_args(argv))
    # codified CLAUDE.md stall procedure (see cli/main.py): one watched
    # probe dispatch + a liveness heartbeat for the whole run (beats per GP
    # chunk); self-relaunch once on stall (chunks resume from eval npzs),
    # distinct exit code after
    probe_first_dispatch()
    import jax

    if jax.default_backend() != "cpu":
        from ..utils.watchdog import start_heartbeat

        start_heartbeat(timeout_s=900.0)
    return run(args)


if __name__ == "__main__":
    main()

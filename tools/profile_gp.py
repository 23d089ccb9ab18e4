"""Profile one chunk of the GP (symgp) sweep per generation phase.

Replays the exact gp_sweep_plain generation loop (symgp/sweep.py
_run_sweep) on the real LV noise99 protocol data, but with per-phase
timers: population upload, fused device generation (const-opt + fitness),
result download, host best-tracking, and C++ breeding — attributing the
~68 s/seed wall clock before optimizing any of it.

    python tools/profile_gp.py --seeds 5 --gens 8
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="lv/noise99_eq_gp.cfg")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--gens", type=int, default=8)
    ap.add_argument("--pop", type=int, default=1000)
    ap.add_argument("--topk", type=int, default=None)
    ap.add_argument("--eval_dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--eval_backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--grad_backend", default="xla", choices=["xla", "pallas"])
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from symmetry_ode_discovery_tpu.data.datasets import get_dataset
    from symmetry_ode_discovery_tpu.cli.main_gp import _task_spec
    from symmetry_ode_discovery_tpu.symgp.evolve import GPConfig, breed
    from symmetry_ode_discovery_tpu.symgp.sweep import (
        _plain_unit_loss, make_sweep_gen_step)
    from symmetry_ode_discovery_tpu.symgp.tape import (random_population,
                                                       tape_length)
    from symmetry_ode_discovery_tpu.utils.config import get_args

    args = vars(get_args(["--config", opts.config]))
    train_ds, _, args = get_dataset(args)
    x_all, dx_all = np.asarray(train_ds.x), np.asarray(train_ds.dx)
    spec = _task_spec(args["task"], x_all.shape[1])

    subsample = int(len(x_all) * args["pysr_subsample"])
    cap = args.get("gp_fitness_rows", 2500) or subsample
    fit_rows = min(subsample, cap)
    S, d = opts.seeds, x_all.shape[1]
    xs, dxs = [], []
    for s in range(S):
        rng = np.random.default_rng(s)
        idx = rng.choice(len(x_all), subsample, replace=False)[:fit_rows]
        xs.append(x_all[idx]); dxs.append(dx_all[idx])
    X_all, dX_all = np.stack(xs), np.stack(dxs)
    N = X_all.shape[1]

    cfg = GPConfig(pop_size=opts.pop, n_generations=opts.gens, seed=0)
    topk = opts.topk if opts.topk is not None else max(1, cfg.pop_size // 4)
    rngs = [np.random.default_rng(1000 * s + dim)
            for s in range(S) for dim in range(d)]
    pops = [random_population(r, spec, cfg.pop_size) for r in rngs]
    ops = np.stack([p[0] for p in pops])
    args_t = np.stack([p[1] for p in pops])
    consts = np.stack([p[2] for p in pops])
    U, P = ops.shape[0], cfg.pop_size

    X_u = jnp.asarray(np.repeat(X_all, d, axis=0))
    y_u = jnp.asarray(np.stack([dX_all[s, :, dim]
                                for s in range(S) for dim in range(d)]))
    k = min(N, 512)
    data = (X_u, y_u, X_u[:, :k], y_u[:, :k])
    eval_dtype = jnp.bfloat16 if opts.eval_dtype == "bf16" else None
    fit_loss = (None if eval_dtype is None and opts.eval_backend == "xla"
                else _plain_unit_loss(spec, eval_dtype=eval_dtype,
                                      backend=opts.eval_backend))
    grad_be = "pallas_grad" if opts.grad_backend == "pallas" else "xla"
    gen_step = make_sweep_gen_step(_plain_unit_loss(spec, backend=grad_be),
                                   cfg.const_opt_steps,
                                   cfg.const_opt_lr, topk, group=1, n_data=2,
                                   fit_loss=fit_loss)

    print(f"U={U} units, P={P}, N={N}, L={spec.max_len}, topk={topk}")
    t = {"upload": 0.0, "device": 0.0, "download": 0.0, "host": 0.0,
         "breed": 0.0}
    for gen in range(opts.gens):
        t0 = time.time()
        oj, aj, cj = jnp.asarray(ops), jnp.asarray(args_t), jnp.asarray(consts)
        jax.block_until_ready(cj)
        t1 = time.time()
        out = gen_step(oj, aj, cj, *data)
        jax.block_until_ready(out)
        t2 = time.time()
        c_final, base = jax.device_get(out)
        t3 = time.time()
        consts = c_final
        lens = tape_length(ops.reshape(U * P, -1)).reshape(U, P)
        fit = base + cfg.parsimony * lens
        t4 = time.time()
        new = [breed((ops[u], args_t[u], consts[u]), fit[u], rngs[u], spec, cfg)
               for u in range(U)]
        ops = np.stack([n[0] for n in new])
        args_t = np.stack([n[1] for n in new])
        consts = np.stack([n[2] for n in new])
        t5 = time.time()
        lab = "compile+" if gen == 0 else ""
        print(f"gen {gen}: upload {t1-t0:.2f}  {lab}device {t2-t1:.2f}  "
              f"download {t3-t2:.2f}  host {t4-t3:.2f}  breed {t5-t4:.2f}")
        if gen >= 1:
            for kk, dt in zip(t, (t1-t0, t2-t1, t3-t2, t4-t3, t5-t4)):
                t[kk] += dt
    warm = opts.gens - 1
    print({kk: f"{v/warm:.3f}s/gen" for kk, v in t.items()})
    total = sum(t.values()) / warm
    print(f"warm total {total:.2f} s/gen -> 40 gens x {S} seeds: "
          f"{total*40:.0f} s/chunk = {total*40/S:.1f} s/seed")
    return 0


if __name__ == "__main__":
    sys.exit(main())

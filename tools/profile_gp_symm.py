"""Profile one chunk of the symmetry-regularized GP sweep per generation phase.

Counterpart of tools/profile_gp.py for the EquivGP-r path
(symgp/sweep.py::gp_sweep_system): replays the exact per-generation device
program on the real LV noise99 symm protocol (loaded LaLiGAN checkpoint,
precomputed g(x)/J_g(x)) with per-phase timers, and a --const_opt_steps
knob to split the fused device call into fitness vs constant-optimization
cost.

    python tools/profile_gp_symm.py --seeds 5 --gens 6
    python tools/profile_gp_symm.py --seeds 5 --gens 6 --const_opt_steps 0
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="lv/noise99_eq_gp_symm.cfg")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--gens", type=int, default=6)
    ap.add_argument("--pop", type=int, default=1024)
    ap.add_argument("--topk", type=int, default=None)
    ap.add_argument("--const_opt_steps", type=int, default=None)
    ap.add_argument("--eval_dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--eval_backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--grad_backend", default="xla", choices=["xla", "pallas"])
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from symmetry_ode_discovery_tpu.cli.main import build_models
    from symmetry_ode_discovery_tpu.cli.main_gp import _task_spec
    from symmetry_ode_discovery_tpu.data.datasets import get_dataset
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.symgp.evolve import GPConfig
    from symmetry_ode_discovery_tpu.symgp.objective import (paired_breed,
                                                            paired_population)
    from symmetry_ode_discovery_tpu.symgp.sweep import (_system_unit_loss,
                                                        make_sweep_gen_step)
    from symmetry_ode_discovery_tpu.symgp.tape import tape_length
    from symmetry_ode_discovery_tpu.training.symmreg import (
        make_precompute_symmreg_r)
    from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt
    from symmetry_ode_discovery_tpu.utils.config import get_args

    args = vars(get_args(["--config", opts.config]))
    train_ds, _, args = get_dataset(args)
    x_all, dx_all = np.asarray(train_ds.x), np.asarray(train_ds.dx)
    spec = _task_spec(args["task"], x_all.shape[1])

    ae_def, gspec, _ = build_models(args)
    k = jax.random.PRNGKey(0)
    ae_params, ae_bstats = ae_def.init(k)
    g_state = lg.init_generator(k, gspec)
    bundle = {"ae": ae_params, "d": {}, "g": g_state}
    bundle, ae_bstats = ckpt.load_laligan(args["load_laligan"], bundle,
                                          ae_bstats)
    pre = make_precompute_symmreg_r(ae_def, bundle["ae"], ae_bstats, gspec,
                                    bundle["g"])

    subsample = int(len(x_all) * args["pysr_subsample"])
    cap = args.get("gp_fitness_rows", 2500) or subsample
    fit_rows = min(subsample, cap)
    S = opts.seeds
    xs, dxs, gxs, Jgs = [], [], [], []
    t0 = time.time()
    for s in range(S):
        rng = np.random.default_rng(s)
        idx = rng.choice(len(x_all), subsample, replace=False)[:fit_rows]
        xs.append(x_all[idx]); dxs.append(dx_all[idx])
        gx_list, Jgx_list = pre(jnp.asarray(x_all[idx]))
        gxs.append(np.stack([np.asarray(g) for g in gx_list]))
        Jgs.append(np.stack([np.asarray(J) for J in Jgx_list]))
    X_all, dX_all = np.stack(xs), np.stack(dxs)
    gx_all, Jgx_all = np.stack(gxs), np.stack(Jgs)
    print(f"precompute (incl. first-jit): {time.time()-t0:.2f} s for {S} seeds")
    N, n_g = X_all.shape[1], gx_all.shape[1]

    steps = (GPConfig.const_opt_steps if opts.const_opt_steps is None
             else opts.const_opt_steps)
    cfg = GPConfig(pop_size=opts.pop, n_generations=opts.gens, seed=0,
                   const_opt_steps=steps)
    topk = opts.topk if opts.topk is not None else max(1, cfg.pop_size // 4)
    rngs = [np.random.default_rng(s) for s in range(S)]
    pops = [paired_population(r, spec, cfg.pop_size) for r in rngs]
    ops = np.stack([p[0] for p in pops])
    args_t = np.stack([p[1] for p in pops])
    consts = np.stack([p[2] for p in pops])
    U, P = S, cfg.pop_size

    data = (jnp.asarray(X_all), jnp.asarray(dX_all), jnp.asarray(gx_all),
            jnp.asarray(Jgx_all))
    ks = min(N, 512)
    data_small = (data[0][:, :ks], data[1][:, :ks],
                  data[2][:, :, :ks], data[3][:, :, :ks])
    eval_dtype = jnp.bfloat16 if opts.eval_dtype == "bf16" else None
    fit_loss = (None if eval_dtype is None and opts.eval_backend == "xla"
                else _system_unit_loss(spec, args["w_sym_reg"], n_g,
                                       eval_dtype=eval_dtype,
                                       backend=opts.eval_backend))
    grad_be = "pallas_grad" if opts.grad_backend == "pallas" else "xla"
    gen_step = make_sweep_gen_step(_system_unit_loss(spec, args["w_sym_reg"],
                                                     n_g, backend=grad_be),
                                   cfg.const_opt_steps, cfg.const_opt_lr,
                                   topk, group=2, n_data=4,
                                   fit_loss=fit_loss)
    data = tuple(data) + tuple(data_small)

    print(f"U={U} seeds, P={P} pairs (2P={2*P} tapes), N={N}, n_g={n_g}, "
          f"rows/unit={(1+n_g)*N}, L={spec.max_len}, topk={topk}, "
          f"const_opt_steps={cfg.const_opt_steps}")
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
        lens = tape_length(ops.reshape(U * 2 * P, -1)).reshape(U, P, 2).sum(-1)
        fit = base + cfg.parsimony * lens
        t4 = time.time()
        new = [paired_breed((ops[u], args_t[u], consts[u]), fit[u], rngs[u],
                            spec, cfg) for u in range(U)]
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

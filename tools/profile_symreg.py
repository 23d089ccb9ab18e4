"""Profile one chunk of the EquivSINDy-r (symreg) sweep on the TPU.

Reuses the real CLI pipeline (utils/config parsing, cli.main.build_models,
dataset cache, LaLiGAN checkpoint) for the exact isymreg protocol, then runs
ONE seed chunk of the host-stepped L-BFGS driver with per-host-step timing —
attributing the symreg2-noise99-lv wall clock (RESULTS.md) between compile,
dispatch and device compute, and sizing HBM headroom for bigger chunks.
Writes nothing under eval_results/.

    python tools/profile_symreg.py --seed_chunk 10 --epochs 30
    python tools/profile_symreg.py --seed_chunk 25 --save_policy
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="lv/noise99_eq_isymreg.cfg")
    ap.add_argument("--seed_chunk", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=30,
                    help="epochs to run (full protocol is 100)")
    ap.add_argument("--epochs_per_call", type=int, default=10)
    ap.add_argument("--ae_dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--save_policy", action="store_true",
                    help="checkpoint policy: save dot outputs instead of full remat")
    ap.add_argument("--pallas", action="store_true",
                    help="fused VMEM-resident frozen-AE kernels "
                         "(ops/pallas_symmpen.py) + remat off")
    ap.add_argument("--w_sym_reg", type=float, default=None,
                    help="ablation: override the penalty weight (0 disables "
                         "the whole symreg graph -> base L-BFGS cost)")
    ap.add_argument("--int_t", type=float, default=None,
                    help="ablation: override the rollout horizon "
                         "(int_t/int_dt = number of Euler steps)")
    ap.add_argument("--no_remat", action="store_true",
                    help="ablation: disable jax.checkpoint on the closure")
    ap.add_argument("--trace", default="", help="jax.profiler trace dir (2nd step)")
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from symmetry_ode_discovery_tpu.cli.main import build_models
    from symmetry_ode_discovery_tpu.data.datasets import get_dataset
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training import siged
    from symmetry_ode_discovery_tpu.training.siged import (LBFGSHParams,
                                                           make_lbfgs_stepper)
    from symmetry_ode_discovery_tpu.training.symmreg import make_symmreg_i_fast
    from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt
    from symmetry_ode_discovery_tpu.utils.config import get_args

    args = vars(get_args(["--config", opts.config, "--ae_dtype", opts.ae_dtype]))
    if opts.w_sym_reg is not None:
        args["w_sym_reg"] = opts.w_sym_reg
    if opts.int_t is not None:
        args["int_t"] = opts.int_t
    train_ds, _, args = get_dataset(args)
    ae_def, spec, _ = build_models(args)

    key = jax.random.PRNGKey(0)
    ae_params, ae_bstats = ae_def.init(key)
    g_state = lg.init_generator(jax.random.PRNGKey(1), spec)
    bundle = {"ae": ae_params, "d": {}, "g": g_state}
    bundle, ae_bstats = ckpt.load_laligan(args["load_laligan"], bundle, ae_bstats)
    ae_params, g_state = bundle["ae"], bundle["g"]

    cfg, _ = make_config(args["latent_dim"], poly_order=args["poly_order"],
                         include_sine=args["include_sine"],
                         include_exp=args["include_exp"],
                         threshold=args["threshold"])
    hp = LBFGSHParams(num_epochs=args["num_epochs"], lr_sindy=args["lr_sindy"],
                      w_sindy_x=args["w_sindy_x"], w_sindy_reg=args["w_sindy_reg"],
                      sindy_reg_type=args["sindy_reg_type"],
                      w_sym_reg=args["w_sym_reg"], st_freq=args["st_freq"],
                      threshold=args["threshold"], linesearch=False)
    ae_dtype = jnp.bfloat16 if opts.ae_dtype == "bf16" else None
    prep, pen = make_symmreg_i_fast(ae_def, ae_params, ae_bstats, spec, g_state,
                                    args["int_t"], args["int_dt"],
                                    ae_dtype=ae_dtype, pallas=opts.pallas)

    if opts.save_policy:
        # monkey-patch the remat wrapper with a dots-saveable policy: saves
        # matmul outputs (HBM for recompute) — diagnostic only
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        orig = jax.checkpoint
        siged.jax.checkpoint = lambda f: orig(f, policy=policy)

    init_f, step_f, extract_f = make_lbfgs_stepper(
        cfg, None, hp, pen if hp.w_sym_reg > 0 else None,
        sym_reg_prep=prep if hp.w_sym_reg > 0 else None,
        epochs_per_call=opts.epochs_per_call,
        remat=False if (opts.pallas or opts.no_remat) else None)

    x_all, dx_all = jnp.asarray(train_ds.x), jnp.asarray(train_ds.dx)
    n = x_all.shape[0]
    k_batch = int(n * args["lbfgs_subsample"])

    def prep_seed(s):
        kk = jax.random.fold_in(jax.random.PRNGKey(0), s)
        kperm, kfit, _ = jax.random.split(kk, 3)
        idx = jax.random.permutation(kperm, n)[:k_batch]
        return x_all[idx], dx_all[idx], kfit

    chunk = opts.seed_chunk
    sub = jnp.arange(chunk)
    prep_j = jax.jit(jax.vmap(prep_seed))
    init_j = jax.jit(jax.vmap(init_f))
    step_j = jax.jit(jax.vmap(step_f, in_axes=(0, None)))

    t0 = time.time()
    xs, dxs, keys = prep_j(sub)
    carry = init_j(xs, dxs, keys)
    jax.block_until_ready(carry)
    print(f"prep+init (incl compile): {time.time() - t0:.1f} s "
          f"(k_batch={k_batch}, chunk={chunk})")

    times = []
    for e in range(0, opts.epochs, opts.epochs_per_call):
        t0 = time.time()
        if opts.trace and e == opts.epochs_per_call:
            with jax.profiler.trace(opts.trace):
                carry = step_j(carry, e)
                jax.block_until_ready(carry)
        else:
            carry = step_j(carry, e)
            jax.block_until_ready(carry)
        dt = time.time() - t0
        times.append(dt)
        ndone = int(np.asarray(carry["done"]).sum())
        print(f"step e={e:3d}: {dt:6.2f} s  done={ndone}/{chunk}")

    warm = times[1:] or times
    per_es = float(np.mean(warm)) / opts.epochs_per_call / chunk
    print(f"warm step mean {np.mean(warm):.2f} s -> "
          f"{per_es * 1e3:.1f} ms/epoch/seed; extrapolated 50x100 "
          f"(no early exit): {per_es * 100 * 50:.0f} s device time")
    return 0


if __name__ == "__main__":
    sys.exit(main())

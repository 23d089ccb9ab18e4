"""Device-op profile of the EquivSINDy-r host-stepped sweep.

Builds the LV isymreg stepper exactly as cli/main.py does (same config merge,
same LaLiGAN checkpoint, same fast-path penalty), runs one WARM step_j call
(seed_chunk seeds x epochs_per_call epochs), traces a second call, and prints
the top device ops from the XPlane — where the 6.2-min flagship sweep's
per-epoch device time actually goes (utils/profiling.summarize_xplane).

Usage:
  python tools/profile_symreg.py [--config lv/noise99_eq_isymreg.cfg]
                                 [--symmpen_pallas --ae_dtype f32]
                                 [--seed_chunk 10] [--top 30]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from symmetry_ode_discovery_tpu.cli.main import build_models
    from symmetry_ode_discovery_tpu.data.datasets import get_dataset
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training.siged import (LBFGSHParams,
                                                           make_lbfgs_stepper)
    from symmetry_ode_discovery_tpu.training.symmreg import make_symmreg_i_fast
    from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt
    from symmetry_ode_discovery_tpu.utils.config import get_args
    from symmetry_ode_discovery_tpu.utils.profiling import (summarize_xplane,
                                                            trace)

    argv = sys.argv[1:]
    if not any(a == "--config" for a in argv):
        argv = ["--config", "lv/noise99_eq_isymreg.cfg"] + argv
    top = 30
    if "--top" in argv:  # local flag, not part of the run config surface
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = vars(get_args(argv))

    train_ds, _, args = get_dataset(args)
    ae_def, spec, _ = build_models(args)
    k = jax.random.PRNGKey(0)
    ae_params, ae_bstats = ae_def.init(k)
    g_state = lg.init_generator(k, spec)
    bundle = {"ae": ae_params, "d": {}, "g": g_state}
    bundle, ae_bstats = ckpt.load_laligan(args["load_laligan"], bundle, ae_bstats)
    ae_params, g_state = bundle["ae"], bundle["g"]

    cfg, Q = make_config(args["latent_dim"], poly_order=args["poly_order"],
                         include_sine=args["include_sine"],
                         include_exp=args["include_exp"],
                         threshold=args["threshold"])
    hp = LBFGSHParams(num_epochs=args["num_epochs"], lr_sindy=args["lr_sindy"],
                      w_sindy_x=args["w_sindy_x"], w_sindy_reg=args["w_sindy_reg"],
                      sindy_reg_type=args["sindy_reg_type"],
                      w_sym_reg=args["w_sym_reg"], st_freq=args["st_freq"],
                      threshold=args["threshold"], linesearch=False,
                      dir_backend=args.get("lbfgs_dir_backend", "xla"))
    ae_dtype = {"bf16": jnp.bfloat16, "f32": None}[args.get("ae_dtype", "f32")]
    use_pallas = bool(args.get("symmpen_pallas"))
    fused_lib = None if args.get("no_fused_rollout") else cfg.library
    prep, pen = make_symmreg_i_fast(ae_def, ae_params, ae_bstats, spec, g_state,
                                    args["int_t"], args["int_dt"],
                                    ae_dtype=ae_dtype, pallas=use_pallas,
                                    fused_rollout_lib=fused_lib)
    epc = max(1, min(args.get("epochs_per_call", 10), hp.num_epochs))
    init_f, step_f, _ = make_lbfgs_stepper(cfg, Q, hp, pen, sym_reg_prep=prep,
                                           epochs_per_call=epc,
                                           remat=False if use_pallas else None)

    x_all, dx_all = train_ds.x, train_ds.dx
    n = x_all.shape[0]
    k_batch = int(n * args["lbfgs_subsample"])
    chunk = args.get("seed_chunk", 10)

    def prep_seed(s):
        kk = jax.random.fold_in(jax.random.PRNGKey(0), s)
        kperm, kfit, _ = jax.random.split(kk, 3)
        idx = jax.random.permutation(kperm, n)[:k_batch]
        return x_all[idx], dx_all[idx], kfit

    print(f"batch per seed: {k_batch}, chunk: {chunk}, epochs/call: {epc}, "
          f"pallas={use_pallas}, ae_dtype={args.get('ae_dtype')}")
    xs, dxs, keys = jax.jit(jax.vmap(prep_seed))(jnp.arange(chunk))
    init_j = jax.jit(jax.vmap(init_f))
    step_j = jax.jit(jax.vmap(step_f, in_axes=(0, None)))
    carry = init_j(xs, dxs, keys)
    carry = step_j(carry, 0)  # compile + warm
    jax.block_until_ready(carry)

    t0 = time.perf_counter()
    carry = step_j(carry, epc)
    jax.block_until_ready(carry)
    wall = time.perf_counter() - t0
    per_epoch = wall / epc
    print(f"warm step_j: {wall * 1e3:.1f} ms for {epc} epochs x {chunk} seeds "
          f"-> {per_epoch * 1e3:.1f} ms/epoch, "
          f"{per_epoch * 1e3 / hp.inner_iters:.2f} ms/iteration (chunk-wide)")

    log_dir = "/tmp/sodt-symreg-trace"
    with trace(log_dir):
        carry = step_j(carry, 2 * epc)
        jax.block_until_ready(carry)
    rows = summarize_xplane(log_dir, top=top)
    total = sum(r[1] for r in rows)
    print(f"device total in trace: {total * 1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

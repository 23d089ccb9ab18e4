"""Device-op profile of LaLiGAN adversarial training (VERDICT r3 item 5).

Builds the LV noise99 symmetry-discovery trainer exactly as cli/main.py does
(same config merge, same materialized 2M-window dataset), runs one WARM
epoch, traces a second, and prints the top device ops from the XPlane —
where the ~8-minute 15-epoch LV LaLiGAN wall clock actually goes
(reference train.py:66-189 is the torch counterpart hot loop).

Also times the side costs the epoch trace can't see: dataset window
materialization, the per-epoch full-val eval_metrics call (log_interval=1
runs it every epoch), and the print_li generator fetch.

Usage:
  python tools/profile_lassi.py [--config lv/noise99_sym.cfg]
                                [--batch_size 8192] [--top 30]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from symmetry_ode_discovery_tpu.cli.main import build_models
    from symmetry_ode_discovery_tpu.data.datasets import get_dataset
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.training.lassi import (LassiHParams,
                                                           LassiTrainer)
    from symmetry_ode_discovery_tpu.utils.config import get_args
    from symmetry_ode_discovery_tpu.utils.profiling import (summarize_xplane,
                                                            trace)

    argv = sys.argv[1:]
    if not any(a == "--config" for a in argv):
        argv = ["--config", "lv/noise99_sym.cfg"] + argv
    top = 30
    if "--top" in argv:  # local flag, not part of the run config surface
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = vars(get_args(argv))

    t0 = time.perf_counter()
    train_ds, val_ds, args = get_dataset(args)
    t_ds = time.perf_counter() - t0
    t0 = time.perf_counter()
    x_train, dx_train = train_ds.materialize()
    x_val, dx_val = val_ds.materialize()
    jax.block_until_ready((x_train, x_val))
    t_mat = time.perf_counter() - t0
    print(f"dataset load {t_ds:.1f}s, window materialize {t_mat:.1f}s "
          f"(train {x_train.shape}, val {x_val.shape})")

    ae_def, spec, disc = build_models(args)
    hp = LassiHParams(
        num_epochs=args["num_epochs"], batch_size=args["batch_size"],
        lr_ae=args["lr_ae"], lr_d=args["lr_d"], lr_g=args["lr_g"],
        w_recon=args["w_recon"], w_gan=args["w_gan"],
        w_reg_norm=args["w_reg_norm"], w_reg_sim=args["w_reg_sim"],
        w_reg_ortho=args["w_reg_ortho"], w_reg_closure=args["w_reg_closure"],
        use_original_x=args["use_original_x"],
        gan_st_freq=args["gan_st_freq"], gan_st_thres=args["gan_st_thres"],
        include_sindy=args["include_sindy"], eq_constraint=args["eq_constraint"],
        poly_order=args["poly_order"], w_sindy_z=args["w_sindy_z"],
        w_sindy_x=args["w_sindy_x"], w_sindy_reg=args["w_sindy_reg"],
        sindy_reg_type=args["sindy_reg_type"], lr_sindy=args["lr_sindy"],
        st_freq=args["st_freq"], threshold=args["threshold"],
        matmul_precision=args.get("gan_matmul_precision", "float32"),
    )
    steps_per_epoch = max(1, x_train.shape[0] // args["batch_size"])
    trainer = LassiTrainer(ae_def, spec, disc, hp,
                           steps_per_epoch=steps_per_epoch)
    key = jax.random.PRNGKey(args["seed"])
    key, kinit = jax.random.split(key)
    bundle, bstats, opt_state, sindy_carry = trainer.init(kinit, x_train)
    n_batches = x_train.shape[0] // min(hp.batch_size, x_train.shape[0])
    print(f"batch {hp.batch_size} x {n_batches} batches/epoch, "
          f"precision {hp.matmul_precision}")

    def one_epoch(k):
        return trainer.epoch(bundle, bstats, opt_state, sindy_carry,
                             x_train, dx_train, k)

    key, k1 = jax.random.split(key)
    t0 = time.perf_counter()
    out = one_epoch(k1)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    bundle, bstats, opt_state, sindy_carry, _ = out

    key, k2 = jax.random.split(key)
    t0 = time.perf_counter()
    out = one_epoch(k2)
    jax.block_until_ready(out)
    t_warm = time.perf_counter() - t0
    print(f"epoch: compile+run {t_compile:.1f}s, warm {t_warm:.2f}s "
          f"({t_warm * 1e3 / n_batches:.2f} ms/batch)")

    # per-epoch side costs at log_interval=1
    key, k3 = jax.random.split(key)
    t0 = time.perf_counter()
    em = trainer.eval_metrics(bundle, bstats, sindy_carry, x_val,
                              dx_val if dx_val is not None else x_val, k3)
    jax.block_until_ready(em)
    t_eval_c = time.perf_counter() - t0
    key, k4 = jax.random.split(key)
    t0 = time.perf_counter()
    em = trainer.eval_metrics(bundle, bstats, sindy_carry, x_val,
                              dx_val if dx_val is not None else x_val, k4)
    jax.block_until_ready(em)
    t_eval = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = [np.asarray(L) for L in lg.getLi(trainer.spec, bundle["g"])]
    t_li_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = [np.asarray(L) for L in lg.getLi(trainer.spec, bundle["g"])]
    t_li = time.perf_counter() - t0
    print(f"eval_metrics (full val): compile {t_eval_c:.1f}s, warm "
          f"{t_eval:.2f}s; print_li fetch cold {t_li_cold:.1f}s / "
          f"warm {t_li * 1e3:.1f} ms")

    # the train loop's other per-epoch side costs (training/lassi.py):
    # per-metric float() fetches and the save_interval checkpoint dump
    out2 = one_epoch(jax.random.split(key)[1])
    jax.block_until_ready(out2)  # isolate the fetch cost from the epoch cost
    t0 = time.perf_counter()
    _ = {k: float(v) for k, v in out2[4].items()}
    t_metrics = time.perf_counter() - t0
    from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt
    t0 = time.perf_counter()
    ckpt.save_train_state("/tmp/sodt-prof-ckpt.npz",
                          {"bundle": bundle, "batch_stats": bstats,
                           "opt_state": opt_state,
                           "sindy_carry": sindy_carry, "key": key},
                          [{"loss": 0.0}])
    t_save = time.perf_counter() - t0
    print(f"metrics float() fetch {t_metrics * 1e3:.1f} ms/epoch; "
          f"save_train_state {t_save:.2f}s per save_interval")
    est = t_warm + t_eval + t_li + t_metrics
    print(f"=> steady-state per epoch ~{est:.2f}s (epoch {t_warm:.2f} + "
          f"eval {t_eval:.2f} + print_li {t_li:.2f} + metrics {t_metrics:.2f});"
          f" x{hp.num_epochs} epochs ~{est * hp.num_epochs / 60:.1f} min"
          f" + compile {t_compile:.0f}s + materialize {t_mat:.0f}s")

    log_dir = "/tmp/sodt-lassi-trace"
    key, k5 = jax.random.split(key)
    with trace(log_dir):
        out = one_epoch(k5)
        jax.block_until_ready(out)
    rows = summarize_xplane(log_dir, top=top)
    total = sum(r[1] for r in rows)
    print(f"traced epoch device total (top-{top} ops): {total:.2f}s")


if __name__ == "__main__":
    main()

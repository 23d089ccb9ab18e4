"""Outcome-level EquivSINDy-r cross-run at reduced budget (round-5 item 2).

The full 50-seed x 100-epoch reference isymreg sweep is CPU-infeasible
(>8 h/seed measured, PARITY.md), so parity for the flagship method was
closure-level only (penalty rel diff 9.2e-8, tools/ref_parity_isymreg.py).
This tool buys the missing outcome-level data point at a reduced budget that
IS feasible (~5 min/reference-epoch on this 1-CPU box):

  run the reference's ACTUAL train_SIGED_lbfgs (reference train.py:617-760)
  on the converted LaLiGAN checkpoint for N seeds x E epochs, instrumented to
  record (a) the DataLoader subsample permutation, (b) the torch randn Xi
  init, (c) Xi after every L-BFGS epoch and the mask after every
  thresholding event — then replay OUR host-stepped stepper
  (training/siged.py make_lbfgs_stepper) on the IDENTICAL draws, init, and
  budget, and compare per-epoch Xi trajectories, masks, and final outcomes.

A reduced --st_freq (default 4) makes the sequential-thresholding +
optimizer-reset mechanism fire (twice) inside the 10-epoch budget, so the
comparison covers the full epoch-loop semantics, not just smooth L-BFGS
iterates. Both sides run the identical settings.

Phases:
  setup    /tmp/refrun copy (wandb stub) + .pt caches + converted checkpoint
  ref      instrumented reference runs -> eval_results/ref-isymreg-reduced/
           seed{N}_traj.npz (+ the reference's own eval npz)
  ours     our stepper on the recorded draws -> .../seed{N}_ours.npz
  compare  per-epoch trajectory/mask/outcome table (exit 1 on mismatch)

Usage:
  python tools/ref_isymreg_outcome.py --phase all --seeds 3 --epochs 10
"""

import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
REFRUN = os.environ.get("SODT_REFRUN", "/tmp/refrun")
OUT = os.path.join(REPO, "eval_results", "ref-isymreg-reduced")
CKPT = "laligan-noise99-lv"
CONFIG = "lv/noise99_eq_isymreg.cfg"

# Instrumented runner executed inside /tmp/refrun. The RandomSampler patch
# materializes the iterator the sampler would produce anyway (zero RNG
# perturbation, same as tools/refrun_dump_subsample.py); the train wrapper
# grabs the regressor to record Xi init and per-epoch iterates; LBFGS.step
# is the once-per-epoch boundary (reference train.py:696).
RUNNER = """\
import atexit, os, sys
import numpy as np
import torch
from torch.utils.data.sampler import RandomSampler

_out = os.environ["SODT_TRAJ_OUT"]
_expect = int(os.environ.get("SODT_EXPECT_LEN", "0"))
_rec = {"perm": None, "xi0": None, "xi": [], "mask_after": [],
        "thresh_epochs": []}
_reg = {}

_orig_iter = RandomSampler.__iter__
def _recording_iter(self):
    idxs = list(_orig_iter(self))
    if _rec["perm"] is None and (not _expect or len(idxs) == _expect):
        _rec["perm"] = np.asarray(idxs, np.int64)
    return iter(idxs)
RandomSampler.__iter__ = _recording_iter

import train as _train
_orig_train = _train.train_SIGED_lbfgs
def _wrap_train(*a, **kw):
    _reg["r"] = kw["regressor"]
    _rec["xi0"] = kw["regressor"].Xi.detach().numpy().copy()
    return _orig_train(*a, **kw)
_train.train_SIGED_lbfgs = _wrap_train

_orig_step = torch.optim.LBFGS.step
def _rec_step(self, closure):
    r = _orig_step(self, closure)
    if "r" in _reg:
        _rec["xi"].append(_reg["r"].Xi.detach().numpy().copy())
        _rec["mask_after"].append(_reg["r"].mask.detach().numpy().copy())
    return r
torch.optim.LBFGS.step = _rec_step

from sindy import SINDyRegression
_orig_thr = SINDyRegression.set_threshold
def _rec_thr(self, thr):
    r = _orig_thr(self, thr)
    _rec["thresh_epochs"].append(len(_rec["xi"]))  # fired after epoch k
    return r
SINDyRegression.set_threshold = _rec_thr

def _save():
    if _rec["xi0"] is None:
        sys.stderr.write("runner: train_SIGED_lbfgs never ran\\n")
        os._exit(3)
    keep = int(os.environ.get("SODT_PERM_KEEP", "0"))
    if keep and _rec["perm"] is not None:
        _rec["perm"] = _rec["perm"][:keep]  # the fit consumes only the
        # first batch_size entries; tracked evidence stays small
    np.savez(_out, perm=_rec["perm"], xi0=_rec["xi0"],
             xi=np.stack(_rec["xi"]) if _rec["xi"] else np.zeros((0,)),
             mask_after=np.stack(_rec["mask_after"]),
             mask_final=_reg["r"].mask.detach().numpy(),
             thresh_epochs=np.asarray(_rec["thresh_epochs"], np.int64))
atexit.register(_save)

import runpy
sys.argv = ["main.py"] + sys.argv[1:]
runpy.run_path("main.py", run_name="__main__")
"""


def expect_len():
    import numpy as np

    x = np.load(os.path.join(REPO, "data", "lv-train-noise99-gp-x.npy"),
                mmap_mode="r")
    return int(x.shape[0] * x.shape[1])


def phase_setup():
    from tools.refrun_dump_subsample import phase_setup as base_setup

    base_setup("lv", 0.99)
    with open(os.path.join(REFRUN, "_sodt_traj_runner.py"), "w") as fh:
        fh.write(RUNNER)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_ckpt_to_ref.py"),
         os.path.join(REPO, "saved_models", CKPT), CKPT],
        cwd=REFRUN, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-1500:], r.stderr[-1500:])
        raise RuntimeError("checkpoint conversion failed")
    print(r.stdout.strip())


def phase_ref(seeds, epochs, st_freq, timeout_s):
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(REFRUN, "_sodt_traj_runner.py"), "w") as fh:
        fh.write(RUNNER)  # keep the deployed runner current
    n = expect_len()
    for seed in seeds:
        traj = os.path.join(OUT, f"seed{seed}_traj.npz")
        if os.path.exists(traj):
            print(f"seed {seed}: traj exists, skipping")
            continue
        env = dict(os.environ, SODT_TRAJ_OUT=traj, SODT_EXPECT_LEN=str(n),
                   SODT_PERM_KEEP=str(max(50000, int(n * 0.01))),
                   WANDB_MODE="disabled", OMP_NUM_THREADS="1")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        cmd = [sys.executable, "_sodt_traj_runner.py",
               "--config", CONFIG, "--seed", str(seed),
               "--num_epochs", str(epochs), "--st_freq", str(st_freq),
               "--log_interval", "1000", "--save_interval", "1000",
               "--save_dir", "isymreg-reduced"]
        r = subprocess.run(cmd, cwd=REFRUN, env=env, timeout=timeout_s,
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:])
            raise RuntimeError(f"reference seed {seed} failed")
        ev = os.path.join(REFRUN, "eval_results", "isymreg-reduced",
                          f"seed{seed}.npz")
        if os.path.exists(ev):
            shutil.copy2(ev, os.path.join(OUT, f"seed{seed}_ref_eval.npz"))
        print(f"seed {seed}: reference trajectory recorded")


def phase_ours(seeds, epochs, st_freq):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from symmetry_ode_discovery_tpu.models.autoencoder import AutoEncoderDef
    from symmetry_ode_discovery_tpu.models import lie_generator as lg
    from symmetry_ode_discovery_tpu.models.sindy import make_config
    from symmetry_ode_discovery_tpu.training.siged import (
        LBFGSHParams, make_lbfgs_stepper)
    from symmetry_ode_discovery_tpu.training.symmreg import make_symmreg_i_fast
    from symmetry_ode_discovery_tpu.utils import checkpoint as ckpt
    from symmetry_ode_discovery_tpu.evaluation.eval_eq import (
        eval_sindy_coefficients, sindy_truth)

    # mirror of cli/main.py's isymreg wiring for run_configs/lv/
    # noise99_eq_isymreg.cfg (mlp 512x5, ortho, bn, repr (2,1,2),
    # subsample 0.01, lr 0.1, w_sym_reg 0.1, poly2+exp, threshold 0.15)
    ae_def = AutoEncoderDef(ae_arch="mlp", input_dim=2, hidden_dim=512,
                            latent_dim=2, n_layers=5, n_comps=2,
                            batch_norm=True, ortho_ae=True)
    params, bstats = ae_def.init(jax.random.PRNGKey(0))
    spec = lg.parse_repr("(2,1,2)", "0")
    g0 = lg.init_generator(jax.random.PRNGKey(1), spec)
    bundle = {"ae": params, "d": {}, "g": g0}
    bundle, bstats = ckpt.load_laligan(CKPT, bundle, bstats)

    cfg, _ = make_config(2, poly_order=2, include_exp=True, threshold=0.15)
    hp = LBFGSHParams(num_epochs=epochs, lr_sindy=0.1, w_sindy_x=1.0,
                      w_sindy_reg=0.0, sindy_reg_type="l1", w_sym_reg=0.1,
                      st_freq=st_freq, threshold=0.15, linesearch=False)
    prep, pen = make_symmreg_i_fast(ae_def, bundle["ae"], bstats, spec,
                                    bundle["g"], 0.1, 0.01,
                                    fused_rollout_lib=cfg.library)
    init_f, step_f, extract_f = make_lbfgs_stepper(
        cfg, None, hp, pen, sym_reg_prep=prep, epochs_per_call=1)
    step_j = jax.jit(step_f)
    ext_j = jax.jit(extract_f)

    x = np.load(f"{REPO}/data/lv-train-noise99-gp-x.npy").reshape(-1, 2)
    dx = np.load(f"{REPO}/data/lv-train-noise99-gp-dx.npy").reshape(-1, 2)
    k = int(len(x) * 0.01)

    truth = sindy_truth["lv"]
    for seed in seeds:
        with np.load(os.path.join(OUT, f"seed{seed}_traj.npz")) as z:
            perm, xi0 = z["perm"], z["xi0"]
        idx = perm[:k]
        carry = init_f(jnp.asarray(x[idx], jnp.float32),
                       jnp.asarray(dx[idx], jnp.float32),
                       jax.random.PRNGKey(0),
                       params0={"Xi": jnp.asarray(xi0, jnp.float32)})
        xis, masks = [], []
        for e in range(epochs):
            carry = step_j(carry, e)
            Xi_e, m_e = ext_j(carry)
            xis.append(np.asarray(Xi_e))
            masks.append(np.asarray(m_e))
        res = eval_sindy_coefficients(xis[-1], masks[-1], truth)
        np.savez(os.path.join(OUT, f"seed{seed}_ours.npz"),
                 xi=np.stack(xis), mask=np.stack(masks),
                 coefficients=res["coefficients"],
                 correct_form=res["correct_form"], mse=res["mse"])
        print(f"seed {seed}: our trajectory recorded "
              f"(correct_form={res['correct_form']})")


def phase_compare(seeds, epochs):
    import numpy as np

    all_ok = True
    print(f"{'seed':>4} {'epoch':>5} {'max|dXi|':>10} {'rel':>9} mask==")
    for seed in seeds:
        ref = np.load(os.path.join(OUT, f"seed{seed}_traj.npz"))
        ours = np.load(os.path.join(OUT, f"seed{seed}_ours.npz"))
        E = min(len(ref["xi"]), len(ours["xi"]))
        for e in range(E):
            d = np.abs(ref["xi"][e] - ours["xi"][e]).max()
            rel = d / max(np.abs(ref["xi"][e]).max(), 1e-12)
            # ref mask_after[e] is pre-thresholding of epoch e; our masks
            # are post-epoch — align ref's next-epoch record (or final)
            mref = (ref["mask_after"][e + 1] if e + 1 < len(ref["mask_after"])
                    else ref["mask_final"])
            meq = bool((mref == ours["mask"][e]).all())
            print(f"{seed:>4} {e:>5} {d:>10.3e} {rel:>9.2e} {meq}")
        ref_ev_p = os.path.join(OUT, f"seed{seed}_ref_eval.npz")
        if os.path.exists(ref_ev_p):
            rev = np.load(ref_ev_p)
            same_cf = bool((rev["correct_form"] == ours["correct_form"]).all())
            dcoef = np.abs(rev["coefficients"] - ours["coefficients"]).max()
            print(f"seed {seed}: outcome correct_form ref="
                  f"{rev['correct_form']} ours={ours['correct_form']} "
                  f"agree={same_cf}  max coeff diff {dcoef:.3e}")
            all_ok = all_ok and same_cf
    return 0 if all_ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["setup", "ref", "ours", "compare", "all"])
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--st_freq", type=int, default=4)
    ap.add_argument("--timeout", type=float, default=7200.0)
    args = ap.parse_args()
    seeds = list(range(args.seeds))

    if args.phase in ("setup", "all"):
        phase_setup()
    if args.phase in ("ref", "all"):
        phase_ref(seeds, args.epochs, args.st_freq, args.timeout)
    if args.phase in ("ours", "all"):
        phase_ours(seeds, args.epochs, args.st_freq)
    if args.phase in ("compare", "all"):
        return phase_compare(seeds, args.epochs)
    return 0


if __name__ == "__main__":
    sys.exit(main())

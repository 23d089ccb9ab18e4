"""Torch-RNG subsample cross-check: reproduce the reference's per-seed
DataLoader draws exactly and replay our sweep on them.

Closes the last visible quality delta (dosc plain SINDy 28-vs-40/50,
PARITY.md "knife-edge" analysis): per-seed success is a coin flip dominated
by WHICH random half-subsample the seed draws, so distribution-level parity
is already established — this tool establishes bit-level parity by feeding
our sweep the reference's ACTUAL draws.

Phases (all idempotent; run in order or all at once):
  setup    copy /root/reference -> /tmp/refrun (wandb stub), convert our
           .npy caches to the .pt files the reference loads
  run      for each seed: execute the reference's REAL main.py
           (runpy, instrumented RandomSampler that records the shuffle
           permutation — zero RNG perturbation) to completion, keeping its
           eval_results/seedN.npz
  collect  bundle per-seed first-batch indices -> eval_results/
           ref-<run>-perms.npz {seeds, idx} and copy the reference's
           per-seed eval npzs -> eval_results/ref-<run>/ (tracked evidence)
  compare  run OUR sweep with --subsample_perms semantics (the same idx
           rows) and print the per-seed agreement table

The permutation is recorded by materializing RandomSampler.__iter__ — the
sampler's own RNG consumption (one global int64 draw seeding a private
generator, then randperm on that generator: torch utils/data/sampler.py) is
unchanged, so the instrumented run IS the reference run.

Reference anchors: main.py:36-38 (DataLoader(shuffle=True) with
batch_size = lbfgs_subsample * n), train.py:626-629 (the fit consumes only
`next(iter(train_loader))` — the first batch = the first k entries of one
randperm drawn AFTER all model inits).

Usage:
  python tools/refrun_dump_subsample.py --phase all \
      --config dosc/noise20_sindy.cfg --task dosc --noise 0.2 --seeds 50
"""

import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # `python tools/<me>.py` puts tools/ first instead
    sys.path.insert(0, REPO)
REFRUN = os.environ.get("SODT_REFRUN", "/tmp/refrun")
REF = "/root/reference"

WANDB_STUB = """\
# wandb stub: the reference logs to wandb unconditionally; this no-op module
# keeps its control flow intact without network access.
class _Obj:
    def __getattr__(self, k):
        return _Obj()
    def __call__(self, *a, **k):
        return _Obj()
def init(*a, **k):
    return _Obj()
def log(*a, **k):
    pass
def finish(*a, **k):
    pass
config = _Obj()
"""

# Runs inside /tmp/refrun. Imports consume no RNG; the patch only
# materializes the iterator the sampler would produce anyway. The recorded
# permutation must come from the L-BFGS train loader, not just whichever
# shuffled loader iterates first (a joint LaLiGAN stage would construct an
# earlier shuffled loader): when SODT_EXPECT_LEN is set, only a sampler over
# a dataset of exactly that length is saved, and the run fails loudly if
# none matched.
RUNNER = """\
import atexit
import os, sys
import numpy as np
import torch
from torch.utils.data.sampler import RandomSampler

_orig_iter = RandomSampler.__iter__
_state = {"saved": False}
_expect = int(os.environ.get("SODT_EXPECT_LEN", "0"))

def _recording_iter(self):
    idxs = list(_orig_iter(self))
    if not _state["saved"] and (not _expect or len(idxs) == _expect):
        np.save(os.environ["SODT_PERM_OUT"], np.asarray(idxs, np.int64))
        _state["saved"] = True
    return iter(idxs)

RandomSampler.__iter__ = _recording_iter

def _check_saved():
    if _expect and not _state["saved"]:
        sys.stderr.write(
            "SODT runner: no RandomSampler of length %d was iterated; "
            "the expected train loader never ran\\n" % _expect)
        os._exit(3)

atexit.register(_check_saved)

import runpy
entry = os.environ.get("SODT_ENTRY", "main.py")
sys.argv = [entry] + sys.argv[1:]
runpy.run_path(entry, run_name="__main__")
"""


def phase_setup(task: str, noise: float):
    os.makedirs(REFRUN, exist_ok=True)
    for f in os.listdir(REF):
        src = os.path.join(REF, f)
        dst = os.path.join(REFRUN, f)
        if f in (".git", "data", "eval_results", "saved_models"):
            continue
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)
    with open(os.path.join(REFRUN, "wandb.py"), "w") as fh:
        fh.write(WANDB_STUB)
    with open(os.path.join(REFRUN, "_sodt_runner.py"), "w") as fh:
        fh.write(RUNNER)
    os.makedirs(os.path.join(REFRUN, "data"), exist_ok=True)
    os.makedirs(os.path.join(REFRUN, "perms"), exist_ok=True)

    # caches: generate ours if missing, then convert npy -> pt
    from symmetry_ode_discovery_tpu.data.datasets import DATA_PATH, ODEDataset

    import torch

    tag = f"noise{int(100 * noise):02d}-gp"
    for mode in ("train", "val"):
        stem = os.path.join(DATA_PATH, f"{task}-{mode}-{tag}")
        if not os.path.exists(f"{stem}-x.npy"):
            print(f"generating {task} {mode} cache...")
            ODEDataset.make(task, mode, noise=noise, smoothing="gp")
        for part in ("x", "dx"):
            import numpy as np

            pt = os.path.join(REFRUN, "data", f"{task}-{mode}-{tag}-{part}.pt")
            if not os.path.exists(pt):
                torch.save(torch.from_numpy(np.load(f"{stem}-{part}.npy")), pt)
    print(f"refrun ready at {REFRUN}")


def phase_run(config: str, run_name: str, n_seeds: int, timeout_s: float,
              entry: str = "main.py", expect_len: int = 0):
    """entry: the reference script to run. main_wsindy.py draws its
    subsample with plain np.random (main_wsindy.py:36-38) — derivable
    without instrumentation, so no perm file is produced there; progress is
    tracked by the reference's own eval npz instead.

    expect_len: when > 0, the recorder saves only a RandomSampler over a
    dataset of exactly this length (the train set), so a config that builds
    another shuffled DataLoader first cannot silently record the wrong one."""
    os.makedirs(os.path.join(REFRUN, "perms", run_name), exist_ok=True)
    for seed in range(n_seeds):
        perm_out = os.path.join(REFRUN, "perms", run_name, f"seed{seed}.npy")
        done_marker = (perm_out if entry == "main.py" else os.path.join(
            REFRUN, "eval_results", run_name, f"seed{seed}.npz"))
        if os.path.exists(done_marker):
            continue
        env = dict(os.environ, SODT_PERM_OUT=perm_out,
                   SODT_ENTRY=entry, WANDB_MODE="disabled",
                   SODT_EXPECT_LEN=str(expect_len if entry == "main.py" else 0))
        # drop the axon pin so the subprocess doesn't touch the TPU tunnel
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run(
            [sys.executable, "_sodt_runner.py", "--config", config,
             "--seed", str(seed)],
            cwd=REFRUN, env=env, timeout=timeout_s, capture_output=True,
            text=True)
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:])
            raise RuntimeError(f"reference seed {seed} failed")
        print(f"seed {seed}: eval recorded")


def phase_collect(run_name: str, n_seeds: int, k: int):
    import numpy as np

    seeds = np.arange(n_seeds)
    pdir = os.path.join(REFRUN, "perms", run_name)
    if not os.path.isdir(pdir):  # layout of the first (dosc) dump
        pdir = os.path.join(REFRUN, "perms")
    out = None
    if os.path.exists(os.path.join(pdir, "seed0.npy")):
        idx = np.stack([np.load(os.path.join(pdir, f"seed{s}.npy"))[:k]
                        for s in seeds]).astype(np.int32)
        out = os.path.join(REPO, "eval_results", f"ref-{run_name}-perms.npz")
        np.savez(out, seeds=seeds.astype(np.int32), idx=idx)
    dst = os.path.join(REPO, "eval_results", f"ref-{run_name}")
    os.makedirs(dst, exist_ok=True)
    for s in seeds:
        shutil.copy2(os.path.join(REFRUN, "eval_results", run_name,
                                  f"seed{s}.npz"),
                     os.path.join(dst, f"seed{s}.npz"))
    print(f"collected -> {out or '(no perms)'} and "
          f"eval_results/ref-{run_name}/")


def phase_compare(run_name: str, ours_name: str, n_seeds: int):
    import numpy as np

    ref_cf, our_cf = [], []
    for s in range(n_seeds):
        with np.load(os.path.join(REPO, "eval_results", f"ref-{run_name}",
                                  f"seed{s}.npz")) as z:
            ref_cf.append(np.all(z["correct_form"] > 0))
        with np.load(os.path.join(REPO, "eval_results", ours_name,
                                  f"seed{s}.npz")) as z:
            our_cf.append(np.all(z["correct_form"] > 0))
    ref_cf, our_cf = np.asarray(ref_cf), np.asarray(our_cf)
    agree = int((ref_cf == our_cf).sum())
    print(f"reference joint: {int(ref_cf.sum())}/{n_seeds}   "
          f"ours (ref draws): {int(our_cf.sum())}/{n_seeds}   "
          f"per-seed agreement: {agree}/{n_seeds}")
    diff = np.nonzero(ref_cf != our_cf)[0]
    if len(diff):
        print(f"disagreeing seeds: {diff.tolist()}")
    return agree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["setup", "run", "collect", "compare", "all"])
    ap.add_argument("--config", default="dosc/noise20_sindy.cfg")
    ap.add_argument("--task", default="dosc")
    ap.add_argument("--noise", type=float, default=0.2)
    ap.add_argument("--run_name", default="sindy-noise20-dosc",
                    help="the reference config's save_dir")
    ap.add_argument("--ours_name", default="sindy-noise20-dosc-refperms",
                    help="our sweep's save_dir for the compare phase")
    ap.add_argument("--seeds", type=int, default=50)
    ap.add_argument("--subsample", type=float, default=0.5)
    ap.add_argument("--timeout", type=float, default=1800.0)
    ap.add_argument("--entry", default="main.py",
                    help="reference entry script (main.py / main_wsindy.py)")
    args = ap.parse_args()

    if args.phase in ("setup", "all"):
        phase_setup(args.task, args.noise)
    if args.phase in ("run", "all"):
        import numpy as np

        expect_len = 0
        cache = os.path.join(
            REPO, "data",
            f"{args.task}-train-noise{int(100 * args.noise):02d}-gp-x.npy")
        if os.path.exists(cache):
            x = np.load(cache, mmap_mode="r")
            expect_len = int(x.shape[0] * x.shape[1])
        phase_run(args.config, args.run_name, args.seeds, args.timeout,
                  entry=args.entry, expect_len=expect_len)
    if args.phase in ("collect", "all"):
        import numpy as np

        k = 0
        cache = os.path.join(
            REPO, "data",
            f"{args.task}-train-noise{int(100 * args.noise):02d}-gp-x.npy")
        if os.path.exists(cache):  # absent for no-perm entries (main_wsindy)
            x = np.load(cache)
            k = int(x.shape[0] * x.shape[1] * args.subsample)
        phase_collect(args.run_name, args.seeds, k)
    if args.phase == "compare":
        phase_compare(args.run_name, args.ours_name, args.seeds)


if __name__ == "__main__":
    main()

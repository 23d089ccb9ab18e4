"""Prove the selkov plain-SINDy per-seed chaos on the reference's own runs.

PARITY.md diagnosed the 6 selkov replay disagreements (44/50 per-seed match)
as whole-solution bifurcations of the iterated STLSQ/L-BFGS fixpoint under
f32 reduction-order differences (reference sindy.py:250-324). This tool
turns that diagnosis into a controlled experiment ON THE REFERENCE ITSELF:
rerun the reference (same code, same seeds, same cached data, same draws)
with `ATEN_CPU_CAPABILITY=default OMP_NUM_THREADS=1`, which only changes
torch's CPU kernel ISA dispatch (AVX2 -> generic) and therefore only the
f32 reduction order — then compare its per-seed outcomes to its own
original run.

Result (2026-08-20, 50 seeds): the reference disagrees with ITSELF on
13/50 seeds while the aggregate is unchanged (joint 3/50 both, flips
cancel) — i.e. the reference's own per-seed selkov outcomes are chaotic
under f32 reduction order, and our 44/50 replay agreement EXCEEDS the
reference's 37/50 self-agreement. Evidence:
  eval_results/ref-sindy-noise20-selkov          (original AVX run)
  eval_results/ref-sindy-noise20-selkov-atendef  (ISA-perturbed run)
Rerun recipe: /tmp/refrun + `ATEN_CPU_CAPABILITY=default OMP_NUM_THREADS=1
python main.py --config selkov/noise20_eq_sindy.cfg --seed N
--save_dir sindy-noise20-selkov-atendef` per seed.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_outcomes(d, n=50):
    out = {}
    for s in range(n):
        f = os.path.join(d, f"seed{s}.npz")
        if os.path.exists(f):
            out[s] = tuple(int(v) for v in np.load(f)["correct_form"])
    return out


def main():
    a = load_outcomes(os.path.join(REPO, "eval_results",
                                   "ref-sindy-noise20-selkov"))
    b = load_outcomes(os.path.join(REPO, "eval_results",
                                   "ref-sindy-noise20-selkov-atendef"))
    common = sorted(set(a) & set(b))
    joint_a = sum(all(a[s]) for s in common)
    joint_b = sum(all(b[s]) for s in common)
    eq_a = np.sum([a[s] for s in common], axis=0)
    eq_b = np.sum([b[s] for s in common], axis=0)
    flips = [(s, a[s], b[s]) for s in common if a[s] != b[s]]
    print(f"seeds compared: {len(common)}")
    print(f"reference original (AVX):       joint {joint_a}/{len(common)}  "
          f"per-eq {tuple(int(x) for x in eq_a)}")
    print(f"reference ISA-perturbed:        joint {joint_b}/{len(common)}  "
          f"per-eq {tuple(int(x) for x in eq_b)}")
    print(f"reference self-agreement: {len(common) - len(flips)}/{len(common)}"
          f"  ({len(flips)} per-seed flips under ISA-only change)")
    for s, oa, ob in flips:
        print(f"  seed {s:2d}: {oa} -> {ob}")
    return len(flips)


if __name__ == "__main__":
    main()

"""Unified data-generation CLI.

Replaces the reference's four per-system `__main__` blocks
(data_utils/{lotka,damped_oscillator,growth,selkov}.py:28-64) with one entry
point driven by the System registry's per-protocol defaults. Writes the .npy
caches ODEDataset loads; `--torch` additionally exports reference-compatible
.pt tensors so the PyTorch reference can be cross-run on identical data
(reference dataset.py:176-177 load path).

Usage:
  python -m symmetry_ode_discovery_tpu.data.gen --system lv --noise 0.99 --smoothing gp
  python -m symmetry_ode_discovery_tpu.data.gen --system dosc --noise 0.2 --smoothing gp --torch
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--system", required=True, choices=["lv", "dosc", "growth", "selkov"])
    parser.add_argument("--modes", nargs="+", default=["train", "val"])
    parser.add_argument("--noise", type=float, default=0.0)
    parser.add_argument("--smoothing", type=str, default=None)
    parser.add_argument("--n_ics", type=int, default=None,
                        help="override train IC count (val uses the system default)")
    parser.add_argument("--num_steps", type=int, default=None)
    parser.add_argument("--dt", type=float, default=None)
    parser.add_argument("--subsample_rate", type=int, default=None)
    parser.add_argument("--gp_sigma_in", type=float, default=None)
    parser.add_argument("--save_dir", type=str, default=None,
                        help="cache directory (default: DATA_PATH)")
    parser.add_argument("--torch", action="store_true",
                        help="also export .pt tensors for the PyTorch reference")
    args = parser.parse_args(argv)

    import numpy as np

    from .datasets import (DATA_PATH, _cache_stem, cache_prng_key,
                           default_n_ics, save_cache)
    from .generate import gen_data
    from .systems import SYSTEMS

    system = SYSTEMS[args.system]
    path = args.save_dir or DATA_PATH
    os.makedirs(path, exist_ok=True)

    for mode in args.modes:
        n_ics = (args.n_ics if args.n_ics is not None and "train" in mode
                 else default_n_ics(system, mode))
        # key/stem/save come from datasets.py so CLI-written caches always
        # match what the loader would regenerate on a cache miss
        x, dx = gen_data(system, cache_prng_key(mode, args.noise),
                         n_ics=n_ics, dt=args.dt,
                         num_steps=args.num_steps,
                         subsample_rate=args.subsample_rate,
                         noise=args.noise,
                         multiplicative_noise=system.multiplicative_noise,
                         smoothing=args.smoothing,
                         gp_sigma_in=args.gp_sigma_in)
        stem = os.path.join(path, _cache_stem(args.system, mode, args.noise,
                                              args.smoothing))
        save_cache(stem, x, dx)
        print(f"wrote {stem}-{{x,dx}}.npy  shape={tuple(x.shape)}")
        if args.torch:
            import torch

            torch.save(torch.from_numpy(np.asarray(x, np.float32)), f"{stem}-x.pt")
            torch.save(torch.from_numpy(np.asarray(dx, np.float32)), f"{stem}-dx.pt")
            print(f"wrote {stem}-{{x,dx}}.pt")


if __name__ == "__main__":
    main()

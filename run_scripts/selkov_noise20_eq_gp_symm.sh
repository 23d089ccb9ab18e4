#!/bin/bash
# Multi-seed GP sweep: seeds batched as a device axis in chunks
# (replaces the reference's sequential per-seed PySR loop, main_pysr.py:48)
python -m symmetry_ode_discovery_tpu.cli.main_gp --seed 0 --n_seeds 50 --seed_chunk 5 --config selkov/noise20_eq_gp_symm.cfg
# symm objective doubles the per-seed eval graph (reversed-symmetry penalty through g(x), J_g(x)); chunk 5 fits v5e HBM, chunk 10 fails remote compile

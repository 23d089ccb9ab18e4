#!/bin/bash
# Multi-seed GP sweep: seeds batched as a device axis in chunks
# (replaces the reference's sequential per-seed PySR loop, main_pysr.py:48)
python -m symmetry_ode_discovery_tpu.cli.main_gp --seed 0 --n_seeds 50 --seed_chunk 5 --config lv/noise99_eq_gp_symm.cfg
# symm objective evaluates (1+n_g)N rows x 2 components per unit; chunk 10 fits v5e HBM since the one-hot evaluator rewrite

#!/bin/bash
# Multi-seed GP sweep: seeds batched as a device axis in chunks
# (replaces the reference's sequential per-seed PySR loop, main_pysr.py:48)
python -m symmetry_ode_discovery_tpu.cli.main_gp --seed 0 --n_seeds 50 --seed_chunk 10 --config dosc/noise20_gp.cfg

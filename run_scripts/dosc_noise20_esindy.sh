#!/bin/bash
# 50-seed sweep as ONE vmapped TPU program (replaces the reference's
# sequential per-seed bash loop)
python -m symmetry_ode_discovery_tpu.cli.main --seed 0 --n_seeds 50 --config dosc/noise20_esindy.cfg

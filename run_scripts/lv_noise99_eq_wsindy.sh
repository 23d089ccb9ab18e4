#!/bin/bash
python -m symmetry_ode_discovery_tpu.cli.main_wsindy --seed 0 --n_seeds 50 --config lv/noise99_eq_wsindy.cfg

#!/bin/bash
python -m symmetry_ode_discovery_tpu.cli.main --config lv/noise99_sym.cfg

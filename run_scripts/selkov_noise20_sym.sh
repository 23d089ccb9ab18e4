#!/bin/bash
python -m symmetry_ode_discovery_tpu.cli.main --config selkov/noise20_sym.cfg

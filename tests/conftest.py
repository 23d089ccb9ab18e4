"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: this image's sitecustomize imports jax at interpreter startup (axon TPU
tunnel), so env vars alone are too late — we must go through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# SYMODE_TEST_TPU=1 keeps the real backend for the full-budget golden tier
# (floors calibrated against TPU-produced tracked npzs); everything else
# runs on the virtual 8-device CPU mesh.
if os.environ.get("SYMODE_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

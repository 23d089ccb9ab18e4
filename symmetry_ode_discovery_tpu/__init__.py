"""symmetry_ode_discovery_tpu: TPU-native symmetry-informed governing equation discovery.

A JAX/XLA re-architecture of the capabilities of the reference PyTorch codebase
(Rose-STL-Lab/symmetry-ode-discovery, NeurIPS 2024 "Symmetry-Informed Governing
Equation Discovery"). The pipeline:

1. Generate noisy ODE trajectory data (4 synthetic systems + reaction-diffusion),
   with Gaussian-process smoothing/differentiation.
2. Discover Lie-group symmetries with LaLiGAN (autoencoder + Lie-algebra
   generator + discriminator).
3. Discover governing equations by sparse regression (SINDy / Weak SINDy) or a
   vectorized genetic-programming engine, optionally constrained (EquivSINDy-c)
   or regularized (EquivSINDy-r / EquivGP-r) by the discovered symmetry.
4. Evaluate equation-form recovery and coefficient RMSE over multi-seed sweeps.

Design is TPU-first: functional pytree states, `lax.scan`/`while_loop` control
flow, seeds as a vmapped/sharded batch axis over the device mesh instead of the
reference's sequential bash loops.
"""

__version__ = "0.1.0"

# Numerical-precision default: TPU matmuls use bfloat16 inputs unless told
# otherwise, which quantizes discovered coefficients (observed: Q @ beta
# reconstructions landing exactly on the bf16 grid and L-BFGS convergence
# degrading). Equation discovery is small dense linear algebra where
# coefficient accuracy IS the product, so this framework defaults matmuls to
# float32. Opt back into fast bf16 per-call with
# `with jax.default_matmul_precision('bfloat16'): ...`, or globally via
# SODT_MATMUL_PRECISION=default.
import os as _os

if _os.environ.get("SODT_MATMUL_PRECISION", "float32") != "default":
    import jax as _jax

    _jax.config.update(
        "jax_default_matmul_precision",
        _os.environ.get("SODT_MATMUL_PRECISION", "float32"),
    )

# Persistent compilation cache: the axon TPU tunnel compiles remotely at
# 20-60 s per program shape; caching compiled executables on disk removes
# that cost from every rerun (sweeps re-invoke identical shapes constantly).
# Disable with SODT_COMPILATION_CACHE=0.
if _os.environ.get("SODT_COMPILATION_CACHE", "1") != "0":
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ.get("SODT_COMPILATION_CACHE_DIR",
                                       _os.path.expanduser("~/.cache/sodt_jax")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

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

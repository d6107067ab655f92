"""femus_tpu — a TPU-native multiphysics finite-element framework.

Built from scratch on JAX/XLA/Pallas with the capabilities of the FEMuS
reference library (FeMTTU/femus): multilevel meshes, 5 FE families, batched
AD-driven element assembly, a sharded sparse linear-algebra stack (SpMV,
Krylov, geometric multigrid with Galerkin PtAP), coupled multiphysics systems,
transient integrators, particles, and UQ — designed SPMD-first over
``jax.sharding`` device meshes.
"""

__version__ = "0.1.0"

"""mulut_tpu — a TPU-native (JAX/XLA/Pallas) super-resolution framework.

Re-implements the full capability surface of the MuLUT method (ECCV 2022 /
T-PAMI 2024): train a tiny multi-branch CNN, exhaustively cache it into 4-D
look-up tables, fine-tune the LUTs with a straight-through estimator, and
deploy via pure LUT retrieval + 4-D simplex interpolation — designed from
scratch for TPU hardware (static shapes, branchless integer kernels, device
meshes via jax.sharding, Pallas for the hot gather path).
"""

__version__ = "0.1.0"

"""NeuroFluid-TPU: a TPU-native JAX framework for fluid-dynamics grounding with
particle-driven neural radiance fields.

A ground-up rebuild of the capabilities of syguan96/NeuroFluid (ICML 2022,
"NeuroFluid: Fluid Dynamics Grounding with Particle-Driven Neural Radiance
Fields") designed for TPU hardware:

- the continuous-convolution particle transition model (reference:
  models/transmodel.py) runs as fixed-radius neighbor search + gather-matmul
  contractions that map onto the MXU,
- the particle-driven NeRF renderer (reference: models/renderer.py,
  models/nerf.py, utils/ray_utils.py) is a single jit-compiled batched pipeline
  (no host-side ray chunk loop),
- training loops are functional `jit(grad(...))` steps with optax/orbax,
- multi-device scaling uses `jax.sharding.Mesh` + shard_map with XLA
  collectives over ICI (a new capability: the reference is single-GPU only).
"""

__version__ = "0.1.0"

from neurofluid_tpu import data, models, ops, parallel, train, utils  # noqa: F401

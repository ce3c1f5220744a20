"""Data pipeline: Blender multi-view scenes, windowed particle sequences,
particle/pointcloud I/O, and a synthetic scene generator."""

from neurofluid_tpu.data import io, synthetic  # noqa: F401
from neurofluid_tpu.data.blender import BlenderDataset  # noqa: F401
from neurofluid_tpu.data.particles import ParticleDataset  # noqa: F401

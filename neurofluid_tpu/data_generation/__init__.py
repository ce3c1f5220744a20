"""Offline ground-truth data generation: SPlisHSPlasH scene driver, classic
bgeo particle I/O (partio replacement), and surface meshing."""

from neurofluid_tpu.data_generation import bgeo, physics_scenes, surface_meshes  # noqa: F401

"""Device mesh construction.

New capability relative to the reference, which is strictly single-GPU
(SURVEY.md section 2.4: hardcoded torch.device('cuda'), no torch.distributed).
The natural parallel axes of this workload:

- 'rays': shard the ray batch of the renderer (the overwhelming FLOP source)
  across chips — the analog of sequence/data parallelism; gradient psum over
  ICI,
- 'particles': shard particle state for very large scenes (spatial
  parallelism; used by parallel/sharding.sharded_particle_step).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "rays") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                "(set --xla_force_host_platform_device_count for CPU testing)"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))

"""Multi-device execution: meshes, ray-sharded rendering/training, and
particle-sharded transition steps."""

from neurofluid_tpu.parallel.mesh import make_mesh  # noqa: F401
from neurofluid_tpu.parallel.sharding import (  # noqa: F401
    make_sharded_e2e_step,
    make_sharded_particle_step,
    make_sharded_render_fn,
    shard_ray_batch,
)

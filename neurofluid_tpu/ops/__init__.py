"""TPU-native compute kernels: neighbor search, continuous convolution,
ray sampling/compositing, chamfer distance."""

from neurofluid_tpu.ops import cconv, chamfer, neighbor_search, ray_ops  # noqa: F401
from neurofluid_tpu.ops.cconv import (  # noqa: F401
    ball_to_cube_volume_preserving,
    continuous_conv,
    window_poly6,
)
from neurofluid_tpu.ops.chamfer import chamfer_distance, nearest_neighbor_dists  # noqa: F401
from neurofluid_tpu.ops.neighbor_search import (  # noqa: F401
    CellGrid,
    NeighborList,
    ball_query,
    build_cell_grid,
    gather_neighbor_positions,
    radius_search,
    radius_search_brute,
    radius_search_grid,
)

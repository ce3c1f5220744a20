"""Native C++ geometry kernels vs scipy oracles."""

import numpy as np
import pytest

from neurofluid_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable; native lib not built"
)


def test_nearest_neighbors_matches_scipy(rng):
    from scipy.spatial import cKDTree

    points = rng.uniform(-1, 1, size=(5000, 3)).astype(np.float32)
    queries = rng.uniform(-1.2, 1.2, size=(777, 3)).astype(np.float32)
    d, i = native.nearest_neighbor_distances(points, queries)
    d_ref, i_ref = cKDTree(points).query(queries)
    np.testing.assert_allclose(d, d_ref, rtol=1e-5, atol=1e-6)
    # indices may differ only at exact ties; distances decide
    np.testing.assert_allclose(
        np.linalg.norm(points[i] - queries, axis=-1), d_ref, rtol=1e-5, atol=1e-6
    )


def test_nearest_neighbors_clustered(rng):
    """Non-uniform distribution exercises the ring-expansion pruning."""
    from scipy.spatial import cKDTree

    a = rng.normal(scale=0.01, size=(400, 3))
    b = rng.normal(scale=0.01, size=(400, 3)) + 5.0
    points = np.concatenate([a, b]).astype(np.float32)
    queries = rng.uniform(-1, 6, size=(300, 3)).astype(np.float32)
    d, _ = native.nearest_neighbor_distances(points, queries)
    d_ref, _ = cKDTree(points).query(queries)
    np.testing.assert_allclose(d, d_ref, rtol=1e-5, atol=1e-5)


def test_chamfer_matches_scipy(rng):
    from neurofluid_tpu.utils.metrics import chamfer_distance_np

    x = rng.uniform(-1, 1, size=(800, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(600, 3)).astype(np.float32)
    np.testing.assert_allclose(
        native.chamfer(x, y), chamfer_distance_np(x, y), rtol=1e-4
    )


def test_radius_counts_matches_scipy(rng):
    from scipy.spatial import cKDTree

    points = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    tree = cKDTree(points)
    counts = native.radius_counts(points, points, 0.2, exclude_self=True)
    ref = np.asarray(
        [len(tree.query_ball_point(p, 0.2)) - 1 for p in points], np.int32
    )
    np.testing.assert_array_equal(counts, ref)


def test_empty_points():
    d, i = native.nearest_neighbor_distances(
        np.zeros((0, 3), np.float32), np.zeros((5, 3), np.float32)
    )
    assert np.all(np.isinf(d)) and np.all(i == -1)

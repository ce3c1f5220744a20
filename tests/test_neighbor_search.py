"""Neighbor search vs numpy/scipy brute-force oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from neurofluid_tpu.ops import neighbor_search as ns


def _np_neighbors(queries, points, radius, inclusive, exclude_self):
    d2 = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    within = d2 <= radius**2 if inclusive else d2 < radius**2
    if exclude_self:
        within &= d2 > 0
    return d2, within


def _check_result(res, d2, within, k, order):
    q, n = within.shape
    idx_np = np.asarray(res.idx)
    sq_np = np.asarray(res.sq_dists)
    count_np = np.asarray(res.count)
    for i in range(q):
        true_idx = np.nonzero(within[i])[0]
        assert count_np[i] == len(true_idx)
        got = idx_np[i]
        valid = got >= 0
        expect_n = min(k, len(true_idx))
        assert valid.sum() == expect_n
        got_set = set(got[valid].tolist())
        if order == "index":
            assert got_set == set(true_idx[:k].tolist())
        else:
            order_d = true_idx[np.argsort(d2[i, true_idx], kind="stable")]
            # nearest-k: compare distance values (ties may swap indices)
            np.testing.assert_allclose(
                np.sort(sq_np[i][valid]),
                np.sort(d2[i, order_d[:k]]),
                rtol=1e-4, atol=1e-5,
            )
        # distances match the gathered indices; padding is exactly zero
        for slot in range(k):
            if valid[slot]:
                np.testing.assert_allclose(
                    sq_np[i, slot], d2[i, got[slot]], rtol=1e-4, atol=1e-5
                )
            else:
                assert sq_np[i, slot] == 0.0
                assert got[slot] == -1


@pytest.mark.parametrize("order", ["index", "nearest"])
def test_brute_matches_numpy(rng, order):
    queries = rng.uniform(-1, 1, size=(37, 3)).astype(np.float32)
    points = rng.uniform(-1, 1, size=(211, 3)).astype(np.float32)
    radius, k = 0.4, 8
    res = ns.radius_search_brute(
        jnp.asarray(queries), jnp.asarray(points), radius, k, order=order
    )
    d2, within = _np_neighbors(queries, points, radius, True, False)
    _check_result(res, d2, within, k, order)


def test_brute_chunked_equals_unchunked(rng):
    queries = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    points = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    a = ns.radius_search_brute(jnp.asarray(queries), jnp.asarray(points), 0.5, 5,
                              order="index", query_chunk=16)
    b = ns.radius_search_brute(jnp.asarray(queries), jnp.asarray(points), 0.5, 5,
                              order="index", query_chunk=1000)
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_allclose(np.asarray(a.sq_dists), np.asarray(b.sq_dists), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))


def test_exclude_self(rng):
    points = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    res = ns.radius_search_brute(
        jnp.asarray(points), jnp.asarray(points), 0.3, 10,
        order="nearest", exclude_self=True,
    )
    # no point may list itself
    idx_np = np.asarray(res.idx)
    for i in range(50):
        assert i not in set(idx_np[i].tolist())
    d2, within = _np_neighbors(points, points, 0.3, True, True)
    np.testing.assert_array_equal(np.asarray(res.count), within.sum(-1))


def test_ball_query_pytorch3d_semantics(rng):
    """First-K by index, strict <, squared dists, 0/-1 padding."""
    queries = rng.uniform(-1, 1, size=(20, 3)).astype(np.float32)
    points = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    res = ns.ball_query(jnp.asarray(queries), jnp.asarray(points), 0.5, 6)
    d2, within = _np_neighbors(queries, points, 0.5, False, False)
    _check_result(res, d2, within, 6, "index")


def test_gather_neighbor_positions_zero_padding(rng):
    queries = rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)
    points = rng.uniform(-1, 1, size=(30, 3)).astype(np.float32) + 5.0  # far away
    res = ns.ball_query(jnp.asarray(queries), jnp.asarray(points), 0.2, 4)
    gathered = np.asarray(ns.gather_neighbor_positions(jnp.asarray(points), res))
    assert gathered.shape == (10, 4, 3)
    np.testing.assert_allclose(gathered, 0.0)  # nothing in radius -> all origin


@pytest.mark.parametrize("order", ["index", "nearest"])
def test_grid_matches_brute(rng, order):
    points = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32)
    queries = rng.uniform(-1.1, 1.1, size=(77, 3)).astype(np.float32)
    radius, k = 0.25, 12
    grid = ns.build_cell_grid(
        jnp.asarray(points), (-1, -1, -1), (1, 1, 1), radius, max_per_cell=128
    )
    res, overflow = ns.radius_search_grid(
        jnp.asarray(queries), grid, radius, k, order=order
    )
    assert not bool(overflow)
    ref = ns.radius_search_brute(jnp.asarray(queries), jnp.asarray(points), radius, k, order=order)
    np.testing.assert_array_equal(np.asarray(res.count), np.asarray(ref.count))
    if order == "index":
        np.testing.assert_array_equal(np.asarray(res.idx), np.asarray(ref.idx))
        np.testing.assert_allclose(
            np.asarray(res.sq_dists), np.asarray(ref.sq_dists), rtol=1e-4, atol=1e-5
        )
    else:
        np.testing.assert_allclose(
            np.sort(np.asarray(res.sq_dists), -1),
            np.sort(np.asarray(ref.sq_dists), -1),
            rtol=1e-4, atol=1e-5,
        )


def test_grid_overflow_flag(rng):
    # cram many points into one cell with tiny capacity -> overflow reported
    points = (rng.uniform(0, 0.05, size=(40, 3))).astype(np.float32)
    queries = points[:3]
    grid = ns.build_cell_grid(
        jnp.asarray(points), (0, 0, 0), (1, 1, 1), 0.2, max_per_cell=4
    )
    _, overflow = ns.radius_search_grid(jnp.asarray(queries), grid, 0.2, 8)
    assert bool(overflow)


def test_grid_points_outside_box_still_found(rng):
    # escaped particles are clamped into border cells but must remain findable
    points = np.asarray([[1.3, 0.0, 0.0], [0.9, 0.0, 0.0]], np.float32)
    queries = np.asarray([[1.1, 0.0, 0.0]], np.float32)
    grid = ns.build_cell_grid(jnp.asarray(points), (-1, -1, -1), (1, 1, 1), 0.3)
    res, _ = ns.radius_search_grid(jnp.asarray(queries), grid, 0.3, 4, order="nearest")
    found = set(np.asarray(res.idx[0]).tolist()) - {-1}
    assert found == {0, 1}


def test_grid_culled_matches_uncull(rng):
    """AABB culling must be math-identical when capacity suffices."""
    points = rng.uniform(-0.4, 0.4, size=(300, 3)).astype(np.float32)
    # queries along a "ray": many outside the particle AABB
    t = np.linspace(-3, 3, 128, dtype=np.float32)
    queries = np.stack([t, np.zeros_like(t), np.zeros_like(t)], -1)
    grid = ns.build_cell_grid(jnp.asarray(points), (-1, -1, -1), (1, 1, 1), 0.225)
    ref, ov_ref = ns.radius_search_grid(
        jnp.asarray(queries), grid, 0.225, 8, order="index", inclusive=False
    )
    got, ov = ns.radius_search_grid_culled(
        jnp.asarray(queries), grid, 0.225, 8, capacity=64,
        order="index", inclusive=False,
    )
    assert not bool(ov)
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(ref.count))
    np.testing.assert_allclose(
        np.asarray(got.sq_dists), np.asarray(ref.sq_dists), atol=1e-6
    )


def test_grid_culled_overflow_when_capacity_too_small(rng):
    points = rng.uniform(-0.4, 0.4, size=(200, 3)).astype(np.float32)
    queries = rng.uniform(-0.3, 0.3, size=(64, 3)).astype(np.float32)  # all inside
    grid = ns.build_cell_grid(jnp.asarray(points), (-1, -1, -1), (1, 1, 1), 0.225)
    _, ov = ns.radius_search_grid_culled(
        jnp.asarray(queries), grid, 0.225, 8, capacity=16,
        order="index", inclusive=False,
    )
    assert bool(ov)


def test_precomputed_xyz_gradients_match_brute(rng):
    """gather3_values (search-emitted coordinates, plan-based adjoint) must
    give the same position gradients as the plain gather path."""
    import jax

    points = rng.uniform(-0.4, 0.4, size=(150, 3)).astype(np.float32)
    queries = rng.uniform(-0.3, 0.3, size=(32, 3)).astype(np.float32)

    def loss_grid(p):
        grid = ns.build_cell_grid(p, (-1, -1, -1), (1, 1, 1), 0.225)
        res, _ = ns.radius_search_grid(
            jnp.asarray(queries), grid, 0.225, 8, order="index", inclusive=False
        )
        return jnp.sum(res.sq_dists**2)

    def loss_brute(p):
        res = ns.radius_search_brute(
            jnp.asarray(queries), p, 0.225, 8, order="index", inclusive=False
        )
        return jnp.sum(res.sq_dists**2)

    g_grid = jax.grad(loss_grid)(jnp.asarray(points))
    g_brute = jax.grad(loss_brute)(jnp.asarray(points))
    assert np.any(np.asarray(g_brute) != 0)
    np.testing.assert_allclose(
        np.asarray(g_grid), np.asarray(g_brute), rtol=1e-5, atol=1e-7
    )

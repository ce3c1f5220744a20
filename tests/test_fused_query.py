"""Tests for the fused compact ball query (ops/fused_query).

Contract: same neighbor SETS, counts, masks and overflow as the exact grid
search whenever count <= k (the selection-order deviation only reorders /
re-subsets, see module docstring); payload coordinates must equal the point
table at the emitted ids; pallas (interpret) must match the XLA reference
bit-for-bit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurofluid_tpu.ops import fused_query as fq
from neurofluid_tpu.ops import neighbor_search as ns

LOWER = (-1.05, -1.05, -1.05)
UPPER = (1.05, 1.05, 1.05)
RADIUS = 0.1125


def _scene(rng, n=600, spread=0.5):
    # clustered cloud: realistic occupancy, some empty cells
    centers = rng.uniform(-spread, spread, (8, 3))
    pts = (centers[rng.integers(0, 8, n)]
           + rng.normal(size=(n, 3)) * 0.08).astype(np.float32)
    return jnp.clip(jnp.asarray(pts), -1.0, 1.0)


def _grid(points, cap=32):
    return ns.build_cell_grid(points, LOWER, UPPER, RADIUS, max_per_cell=cap)


@pytest.mark.parametrize("exclude_self", [False, True])
def test_matches_exact_search_sets(rng, exclude_self):
    points = _scene(rng)
    queries = points if exclude_self else _scene(rng, n=256)
    grid = _grid(points)
    k = 64  # generous: count <= k everywhere at this density

    nb, over = fq.ball_query_compact(
        queries, grid, LOWER, UPPER, RADIUS, k,
        exclude_self=exclude_self, backend="xla",
    )
    ref, over_ref = ns.radius_search_grid(
        queries, grid, RADIUS, k, order="nearest", inclusive=True,
        exclude_self=exclude_self,
    )
    assert not bool(over) and not bool(over_ref)
    np.testing.assert_array_equal(np.asarray(nb.count), np.asarray(ref.count))
    assert int(jnp.max(ref.count)) <= k  # precondition: sets must coincide
    for i in range(queries.shape[0]):
        a = set(np.asarray(nb.idx[i][nb.mask[i]]).tolist())
        b = set(np.asarray(ref.idx[i][ref.mask[i]]).tolist())
        assert a == b, f"query {i}: {a ^ b}"


def test_payload_coordinates_match_table(rng):
    points = _scene(rng)
    grid = _grid(points)
    nb, _ = fq.ball_query_compact(
        points, grid, LOWER, UPPER, RADIUS, 48,
        exclude_self=True, backend="xla", emit_xyz=True,
    )
    idx = np.asarray(nb.idx)
    mask = np.asarray(nb.mask)
    pts = np.asarray(points)
    for ax in range(3):
        got = np.asarray(nb.xyz[ax])[mask]
        want = pts[idx[mask], ax]
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # sq_dists matches the recomputed distance of the selected pairs
    ref_sq = np.zeros_like(np.asarray(nb.sq_dists))
    q = pts
    for ax in range(3):
        d = np.where(mask, pts[np.maximum(idx, 0), ax] - q[:, ax, None], 0.0)
        ref_sq += d * d
    np.testing.assert_allclose(np.asarray(nb.sq_dists), ref_sq, atol=1e-6)


def test_truncation_keeps_first_k_and_true_count(rng):
    # overfull neighborhoods: k tiny so count > k for most queries
    points = _scene(rng, n=400, spread=0.1)
    grid = _grid(points, cap=128)
    k = 4
    nb, over = fq.ball_query_compact(
        points, grid, LOWER, UPPER, RADIUS, k,
        exclude_self=True, backend="xla",
    )
    assert not bool(over)
    ref, _ = ns.radius_search_grid(
        points, grid, RADIUS, k, order="nearest", inclusive=True,
        exclude_self=True,
    )
    # true counts agree even when capped
    np.testing.assert_array_equal(np.asarray(nb.count), np.asarray(ref.count))
    # every selected id is a genuine in-radius neighbor, and exactly
    # min(count, k) slots are filled
    pts = np.asarray(points)
    idx = np.asarray(nb.idx)
    mask = np.asarray(nb.mask)
    cnt = np.asarray(nb.count)
    assert (mask.sum(axis=1) == np.minimum(cnt, k)).all()
    for i in range(points.shape[0]):
        sel = idx[i][mask[i]]
        assert len(set(sel.tolist())) == len(sel)  # no duplicates
        d2 = ((pts[sel] - pts[i]) ** 2).sum(axis=1)
        assert (d2 <= RADIUS * RADIUS + 1e-12).all()
        assert (d2 > 0).all()


@pytest.mark.parametrize("emit_xyz", [False, True])
def test_pallas_interpret_matches_xla(rng, emit_xyz):
    points = _scene(rng)
    grid = _grid(points)
    a, over_a = fq.ball_query_compact(
        points, grid, LOWER, UPPER, RADIUS, 48,
        exclude_self=True, backend="xla", emit_xyz=emit_xyz,
    )
    b, over_b = fq.ball_query_compact(
        points, grid, LOWER, UPPER, RADIUS, 48,
        exclude_self=True, backend="pallas", emit_xyz=emit_xyz,
    )
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    if emit_xyz:
        for ax in range(3):
            np.testing.assert_allclose(
                np.asarray(a.xyz[ax]), np.asarray(b.xyz[ax]), atol=0
            )
    else:
        assert a.xyz is None and b.xyz is None
        # ids-only mode recomputes sq differentiably from the point table
        np.testing.assert_allclose(
            np.asarray(a.sq_dists), np.asarray(b.sq_dists), atol=1e-6
        )


def test_ids_only_matches_xyz_mode(rng):
    """emit_xyz only changes what the kernel EMITS, never the selection."""
    points = _scene(rng)
    grid = _grid(points)
    a, _ = fq.ball_query_compact(
        points, grid, LOWER, UPPER, RADIUS, 32,
        exclude_self=True, backend="xla", emit_xyz=False,
    )
    b, _ = fq.ball_query_compact(
        points, grid, LOWER, UPPER, RADIUS, 32,
        exclude_self=True, backend="xla", emit_xyz=True,
    )
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    np.testing.assert_allclose(
        np.asarray(a.sq_dists), np.asarray(b.sq_dists), atol=1e-6
    )


def test_empty_and_out_of_aabb_queries(rng):
    points = _scene(rng)
    grid = _grid(points)
    far = jnp.asarray([[50.0, 50.0, 50.0], [0.0, 0.0, 0.0]], jnp.float32)
    nb, _ = fq.ball_query_compact(
        far, grid, LOWER, UPPER, RADIUS, 16, backend="xla"
    )
    assert int(nb.count[0]) == 0
    assert not bool(jnp.any(nb.mask[0]))
    assert (np.asarray(nb.idx[0]) == -1).all()


def test_particle_net_fused_matches_grid(rng):
    """ParticleNet with search_backend='fused' must reproduce the 'grid'
    backend bit-close (outputs differ only by neighbor summation order)
    and propagate identical search-health flags."""
    import flax
    from neurofluid_tpu.models.particle_net import ParticleNet

    common = dict(
        fluid_neighbor_k=64, obstacle_neighbor_k=48, grid_max_per_cell=32,
        gravity=(0, 0, -9.81),
    )
    net_g = ParticleNet(search_backend="grid", **common)
    net_f = ParticleNet(search_backend="fused", **common)
    pos = _scene(rng, n=512, spread=0.3)
    vel = jnp.asarray(rng.normal(size=(512, 3)) * 0.1, jnp.float32)
    box = _scene(rng, n=256, spread=0.8)
    nrm = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    params = net_g.init(jax.random.key(0), pos, vel, box, nrm)

    def run(net):
        p, v, nn, diag = net.apply(
            params, pos, vel, box, nrm, return_diag=True
        )
        return p, v, nn, diag

    pg, vg, nng, dg = run(net_g)
    pf_, vf, nnf, df = run(net_f)
    np.testing.assert_array_equal(np.asarray(nng), np.asarray(nnf))
    np.testing.assert_allclose(np.asarray(pg), np.asarray(pf_), atol=2e-6)
    np.testing.assert_allclose(np.asarray(vg), np.asarray(vf), atol=1e-4)
    assert bool(dg["grid_overflow"]) == bool(df["grid_overflow"])
    assert bool(dg["cap_exceeded"]) == bool(df["cap_exceeded"])

    def loss(net):
        def f(p, x):
            p1, v1, nn = net.apply(p, x, vel, box, nrm)
            return jnp.sum(p1**2) + 0.1 * jnp.sum(v1**2) + jnp.sum(nn)
        return f

    gg = jax.grad(loss(net_g), argnums=(0, 1))(params, pos)
    gf = jax.grad(loss(net_f), argnums=(0, 1))(params, pos)
    for a, b in zip(jax.tree_util.tree_leaves(gg), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

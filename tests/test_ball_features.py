"""Tests for the fused ball-feature-sums op (ops/ball_features.py).

Pins: exact counts vs the list-path search; full sum equivalence with the
NeighborList semantics wherever count <= k (selection immaterial there); the
documented candidate-order selection rule against a naive oracle for
count > k; position gradients against autodiff of a naive differentiable
implementation; cull overflow flagging.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neurofluid_tpu.ops import ball_features as bf
from neurofluid_tpu.ops import neighbor_search as ns

LOWER = (-1.05, -1.05, -1.05)
UPPER = (1.05, 1.05, 2.55)
R = 0.225


def _scene(rng, n=400, q=600, span=0.8):
    pts = jnp.asarray(rng.uniform(-span, span, (n, 3)).astype(np.float32))
    qs = jnp.asarray(rng.uniform(-1.0, 1.0, (q, 3)).astype(np.float32))
    return pts, qs


def _naive_sums(points, queries, k, max_per_cell=64):
    """Differentiable naive implementation with the SAME candidate-order
    selection (cell-major rows, in-cell slots by original index)."""
    grid, *_ = bf.build_tables(points, LOWER, UPPER, R, max_per_cell)
    dims = bf._cell_dims(LOWER, UPPER, R)
    rows = bf._neighbor_rows(
        jnp.clip(
            jnp.floor((jax.lax.stop_gradient(queries) - jnp.asarray(LOWER)) / R)
            .astype(jnp.int32),
            0,
            jnp.asarray(dims, jnp.int32) - 1,
        )
        .astype(jnp.int32)
        .dot(jnp.asarray([dims[1] * dims[2], dims[2], 1], jnp.int32)),
        dims,
    )  # (Q, 27)
    idx = grid.table_idx[rows].reshape(queries.shape[0], -1)  # (Q, 27*cap)
    valid = idx >= 0
    cand = points[jnp.maximum(idx, 0)]  # differentiable gather (Q, M, 3)
    diff = cand - queries[:, None, :]
    d2 = jnp.sum(diff**2, axis=-1)
    within = (d2 < R * R) & valid
    rank = jnp.cumsum(within.astype(jnp.int32), axis=-1)
    sel = jax.lax.stop_gradient(within & (rank <= k))
    nn = jax.lax.stop_gradient(sel & (d2 > 0))
    sf = sel.astype(jnp.float32)
    nnf = nn.astype(jnp.float32)
    d = jnp.sqrt(jnp.maximum(d2, 1e-24))
    w = jnp.maximum(1.0 - (d / R) ** 3, 0.0) * sf
    cols = [
        within.sum(-1).astype(jnp.float32), sf.sum(-1), nnf.sum(-1), w.sum(-1),
    ]
    for ax in range(3):
        cols.append((w * cand[..., ax]).sum(-1))
    for ax in range(3):
        cols.append((nnf * diff[..., ax]).sum(-1))
    for ax in range(3):
        cols.append((nnf * diff[..., ax] ** 2).sum(-1))
    return jnp.stack(cols, axis=-1)


def test_counts_and_low_occupancy_sums_match_list_path(rng):
    pts, qs = _scene(rng)
    k = 8
    sums, overflow = bf.ball_feature_sums(
        qs, pts, R, k, LOWER, UPPER, max_per_cell=64, capacity_frac=1.0,
        backend="xla",
    )
    assert not bool(overflow)
    nl = ns.radius_search_brute(qs, pts, R, 64, order="index", inclusive=False)
    cnt = np.asarray(nl.count)
    np.testing.assert_array_equal(np.asarray(sums[:, 0]), cnt)
    np.testing.assert_array_equal(np.asarray(sums[:, 1]), np.minimum(cnt, k))
    # wherever count <= k the selection is the full in-radius set -> the
    # sums must match the list-path values regardless of selection order
    mask = np.asarray(nl.mask)
    sq = np.asarray(nl.sq_dists)
    w = np.maximum(1 - (np.sqrt(sq) / R) ** 3, 0) * mask
    low = cnt <= k
    np.testing.assert_allclose(
        np.asarray(sums[:, 3])[low], w.sum(1)[low], atol=1e-5
    )
    safe = np.maximum(np.asarray(nl.idx), 0)
    gathered = np.asarray(pts)[safe] * mask[..., None]
    for ax in range(3):
        np.testing.assert_allclose(
            np.asarray(sums[:, 4 + ax])[low],
            (w * gathered[..., ax]).sum(1)[low],
            atol=1e-5,
        )


def test_selection_order_oracle_when_over_k(rng):
    """count > k: selection must follow the documented candidate order."""
    pts, qs = _scene(rng, n=2000, q=200, span=0.3)  # dense -> count >> k
    k = 6
    sums, _ = bf.ball_feature_sums(
        qs, pts, R, k, LOWER, UPPER, max_per_cell=256, capacity_frac=1.0,
        backend="xla",
    )
    oracle = _naive_sums(pts, qs, k, max_per_cell=256)
    assert float(jnp.max(sums[:, 0])) > k  # the regime under test
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(oracle), rtol=1e-4, atol=1e-4
    )


def test_position_gradients_match_naive_autodiff(rng):
    pts, qs = _scene(rng, n=300, q=160, span=0.5)
    k = 6
    cot = jnp.asarray(
        rng.normal(size=(160, bf.N_SUMS)).astype(np.float32)
    )
    # discrete columns (count, n_sel, nn_count) carry no gradient
    cot = cot.at[:, :3].set(0.0)

    def f_op(p):
        s, _ = bf.ball_feature_sums(
            qs, p, R, k, LOWER, UPPER, max_per_cell=64, capacity_frac=1.0,
            backend="xla",
        )
        return jnp.sum(s * cot)

    def f_naive(p):
        return jnp.sum(_naive_sums(p, qs, k) * cot)

    g_op = jax.grad(f_op)(pts)
    g_naive = jax.grad(f_naive)(pts)
    np.testing.assert_allclose(
        np.asarray(g_op), np.asarray(g_naive), rtol=2e-3, atol=2e-4
    )


def test_cull_capacity_flags_and_zeroes(rng):
    pts, qs = _scene(rng, n=300, q=2048, span=0.8)
    sums, overflow = bf.ball_feature_sums(
        qs, pts, R, 8, LOWER, UPPER, max_per_cell=64, capacity_frac=0.125,
        backend="xla",
    )
    assert bool(overflow)  # more in-AABB queries than capacity -> loud
    # out-of-AABB queries always produce exact zero sums
    outside = np.asarray(
        jnp.any((qs < pts.min(0) - R) | (qs > pts.max(0) + R), axis=-1)
    )
    np.testing.assert_array_equal(
        np.asarray(sums)[outside], 0.0
    )


def test_assemble_features_matches_list_path_math(rng):
    """density / smoothed_pos / var assembled from the sums must equal the
    NeighborList-path feature math (origin-padding artifact included) on a
    count <= k scene."""
    pts, qs = _scene(rng, n=200, q=300, span=0.8)
    k = 16
    sums, _ = bf.ball_feature_sums(
        qs, pts, R, k, LOWER, UPPER, max_per_cell=64, capacity_frac=1.0,
        backend="xla",
    )
    nl = ns.radius_search_brute(qs, pts, R, k, order="index", inclusive=False)
    assert int(jnp.max(nl.count)) <= k

    density, smoothed, var, num_nn, count = bf.assemble_features(
        sums, qs, R, k
    )

    # list-path math (RenderNet._local_features)
    mask = np.asarray(nl.mask)
    safe = np.maximum(np.asarray(nl.idx), 0)
    nb = np.asarray(pts)[safe] * mask[..., None]
    qnp = np.asarray(qs)
    d_eu = np.sqrt(
        np.maximum(((nb - qnp[:, None, :]) ** 2).sum(-1), 1e-24)
    )
    w = np.maximum(1 - (d_eu / R) ** 3, 0)
    w_sum = w.sum(1, keepdims=True)
    sm = (w[..., None] * nb).sum(1) / (w_sum + 1e-12)
    np.testing.assert_allclose(np.asarray(density), w_sum, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(smoothed), sm, rtol=1e-3, atol=1e-5)

    sq = ((nb - qnp[:, None, :]) ** 2).sum(-1) * mask
    nn_mask = sq != 0
    nnk = np.minimum(np.asarray(nl.count), k)[:, None] + 1e-12
    vec = np.where(nn_mask[..., None], nb - qnp[:, None, :], 0)
    vm = vec.sum(1) / nnk
    vv = np.where(nn_mask[..., None], (vec - vm[:, None, :]) ** 2, 0)
    var_ref = vv.sum(1) / nnk
    np.testing.assert_allclose(np.asarray(var), var_ref, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(num_nn)[:, 0], nnk[:, 0] - 1e-12,
                               atol=1e-5)


@pytest.mark.slow
def test_rendernet_dense_matches_list_when_under_k(rng):
    """Full renderer forward: dense path == list path wherever count <= K
    (the selection rules coincide there)."""
    from neurofluid_tpu.models.render_net import RenderNet

    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (400, 3)).astype(np.float32))
    ro = jnp.asarray([0.0, -11.0, 0.0], np.float32)
    d = rng.normal(size=(32, 3)).astype(np.float32) * 0.03
    d[:, 1] += 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([np.broadcast_to(ro, d.shape), d], -1))

    kwargs = dict(n_samples=8, n_importance=8, nerf_depth=2, nerf_width=32,
                  num_neighbors=48, search_backend="brute",
                  search_selection="sort", cull_capacity=0.0)
    # guard: the equivalence regime requires count <= K everywhere
    zs = jnp.linspace(9.0, 13.0, 8)
    samples = (rays[:, None, :3] + rays[:, None, 3:] * zs[None, :, None])
    nl = ns.radius_search_brute(
        samples.reshape(-1, 3), pts, 0.225, 64, order="index", inclusive=False
    )
    assert int(jnp.max(nl.count)) <= 48

    net_l = RenderNet(search_mode="list", **kwargs)
    params = net_l.init(jax.random.PRNGKey(0), pts, ro, rays[:4])
    out_l = net_l.apply(params, pts, ro, rays)

    net_d = RenderNet(search_mode="dense", **kwargs)
    out_d = net_d.apply(params, pts, ro, rays)

    for key in ("rgb0", "rgb1", "depth0", "depth1", "num_nn_0", "num_nn_1"):
        np.testing.assert_allclose(
            np.asarray(out_l[key]), np.asarray(out_d[key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )


@pytest.mark.slow
def test_rendernet_dense_gradients_flow_to_particles(rng):
    from neurofluid_tpu.models.render_net import RenderNet

    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (300, 3)).astype(np.float32))
    ro = jnp.asarray([0.0, -11.0, 0.0], np.float32)
    d = rng.normal(size=(16, 3)).astype(np.float32) * 0.02
    d[:, 1] += 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([np.broadcast_to(ro, d.shape), d], -1))

    net = RenderNet(search_mode="dense", n_samples=8, n_importance=8,
                    nerf_depth=2, nerf_width=32, num_neighbors=8)
    params = net.init(jax.random.PRNGKey(0), pts, ro, rays[:4])

    def loss(p):
        out = net.apply(params, p, ro, rays)
        return jnp.mean(out["rgb1"] ** 2) + jnp.mean(out["rgb0"] ** 2)

    g = jax.grad(loss)(pts)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.linalg.norm(g)) > 0.0


def test_block_sums_loop_matches_vectorized(rng):
    """The Mosaic-friendly 27-iteration loop (_block_sums, used by the Pallas
    kernels) and the vectorized XLA twin must be the same math."""
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (16, 3)).astype(np.float32))
    rows = [
        jnp.asarray(rng.uniform(-0.6, 0.6, (1, 32)).astype(np.float32))
        for _ in range(81)
    ]
    loop = bf._block_sums(
        q[:, 0:1], q[:, 1:2], q[:, 2:3],
        rows[:27], rows[27:54], rows[54:], R, 5,
    )
    vec = bf._block_sums_vec(
        q, jnp.concatenate(rows[:27]), jnp.concatenate(rows[27:54]),
        jnp.concatenate(rows[54:]), R, 5,
    )
    np.testing.assert_allclose(np.asarray(loop), np.asarray(vec), atol=1e-5)


@pytest.mark.slow
def test_pallas_interpret_matches_xla(rng):
    """Tiny end-to-end pin of the Pallas kernels (interpret mode on CPU)
    against the XLA backend, forward AND backward."""
    pts = jnp.asarray(rng.uniform(-0.3, 0.3, (150, 3)).astype(np.float32))
    qs = jnp.asarray(rng.uniform(-0.5, 0.5, (96, 3)).astype(np.float32))
    kw = dict(max_per_cell=32, capacity_frac=1.0)
    s_x, _ = bf.ball_feature_sums(qs, pts, R, 6, LOWER, UPPER, backend="xla", **kw)
    s_p, _ = bf.ball_feature_sums(qs, pts, R, 6, LOWER, UPPER, backend="pallas", **kw)
    np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_p), atol=1e-5)

    cot = jnp.asarray(rng.normal(size=s_x.shape).astype(np.float32))
    cot = cot.at[:, :3].set(0.0)

    def loss(backend):
        def f(p):
            s, _ = bf.ball_feature_sums(
                qs, p, R, 6, LOWER, UPPER, backend=backend, **kw
            )
            return jnp.sum(s * cot)
        return jax.grad(f)(pts)

    np.testing.assert_allclose(
        np.asarray(loss("xla")), np.asarray(loss("pallas")), atol=1e-4
    )

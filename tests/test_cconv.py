"""Continuous convolution: coordinate mapping, interpolation, and conv math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neurofluid_tpu.ops import cconv
from neurofluid_tpu.ops import neighbor_search as ns


def _uniform_ball(rng, n):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    r = rng.uniform(0, 1, size=(n, 1)) ** (1 / 3)
    return (v * r).astype(np.float32)


class TestBallToCube:
    def test_stays_in_cube(self, rng):
        pts = _uniform_ball(rng, 5000)
        out = np.asarray(cconv.ball_to_cube_volume_preserving(jnp.asarray(pts)))
        assert np.all(np.abs(out) <= 1.0 + 1e-5)
        assert np.all(np.isfinite(out))

    def test_uniformity_preserved(self, rng):
        """Uniform samples in the ball must map to uniform samples in the cube
        (the defining property of the volume-preserving mapping)."""
        pts = _uniform_ball(rng, 200_000)
        out = np.asarray(cconv.ball_to_cube_volume_preserving(jnp.asarray(pts)))
        # each coordinate marginal of uniform-in-cube is U(-1, 1):
        for axis in range(3):
            hist, _ = np.histogram(out[:, axis], bins=8, range=(-1, 1))
            expected = len(pts) / 8
            assert np.all(np.abs(hist - expected) < 0.05 * len(pts)), (axis, hist)
        # joint uniformity: 4^3 equal-volume boxes
        hist3, _ = np.histogramdd(out, bins=(4, 4, 4), range=[(-1, 1)] * 3)
        expected = len(pts) / 64
        assert np.all(np.abs(hist3 - expected) < 0.25 * expected), hist3

    def test_surface_maps_to_surface(self, rng):
        v = rng.normal(size=(1000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        out = np.asarray(cconv.ball_to_cube_volume_preserving(jnp.asarray(v.astype(np.float32))))
        # unit sphere -> cube surface: max |coord| == 1
        np.testing.assert_allclose(np.max(np.abs(out), axis=-1), 1.0, atol=1e-4)

    def test_origin_and_axes(self):
        pts = jnp.asarray(
            [[0, 0, 0], [0, 0, 1.0], [0, 0, -1.0], [1.0, 0, 0], [0, 1.0, 0]],
            jnp.float32,
        )
        out = np.asarray(cconv.ball_to_cube_volume_preserving(pts))
        np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(out[1], [0, 0, 1], atol=1e-4)
        np.testing.assert_allclose(out[2], [0, 0, -1], atol=1e-4)
        np.testing.assert_allclose(out[3], [1, 0, 0], atol=1e-4)
        np.testing.assert_allclose(out[4], [0, 1, 0], atol=1e-4)

    def test_continuity_across_branches(self, rng):
        """No jumps at the cap/side interface (5/4 z^2 = x^2+y^2) or the
        |x|=|y| wedge boundaries."""
        # points straddling the cone interface
        z = 0.4
        rho = np.sqrt(1.25) * z
        for eps in (-1e-4, 1e-4):
            a = cconv.ball_to_cube_volume_preserving(
                jnp.asarray([[rho + eps, 0.0, z]], jnp.float32)
            )
            b = cconv.ball_to_cube_volume_preserving(
                jnp.asarray([[rho - 1e-4, 0.0, z]], jnp.float32)
            )
            assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 5e-3
        # wedge boundary x == y
        a = cconv.ball_to_cube_volume_preserving(jnp.asarray([[0.3, 0.3 + 1e-5, 0.1]]))
        b = cconv.ball_to_cube_volume_preserving(jnp.asarray([[0.3, 0.3 - 1e-5, 0.1]]))
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 5e-3

    def test_differentiable(self, rng):
        pts = jnp.asarray(_uniform_ball(rng, 16) * 0.9)
        jac = jax.jacfwd(lambda p: cconv.ball_to_cube_volume_preserving(p).sum())(pts)
        assert np.all(np.isfinite(np.asarray(jac)))


class TestTrilinear:
    def test_partition_of_unity(self, rng):
        xyz = jnp.asarray(rng.uniform(-1, 1, size=(100, 3)).astype(np.float32))
        corner, w = cconv.trilinear_taps(xyz, (4, 4, 4))
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
        assert np.all(np.asarray(corner) >= 0) and np.all(np.asarray(corner) < 64)

    def test_align_corners_grid_points(self):
        """At cube corners (+-1), exactly one tap gets weight 1."""
        xyz = jnp.asarray([[-1.0, -1, -1], [1, 1, 1]], jnp.float32)
        corner, w = cconv.trilinear_taps(xyz, (4, 4, 4))
        w = np.asarray(w)
        for row in w:
            assert np.isclose(row.max(), 1.0, atol=1e-6)
        # (-1,-1,-1) -> tap 0; (1,1,1) -> tap 63
        c = np.asarray(corner)
        assert c[0][np.argmax(w[0])] == 0
        assert c[1][np.argmax(w[1])] == 63

    def test_center_point(self):
        """Center of a 4-grid with align_corners: coord 1.5 -> equal split."""
        corner, w = cconv.trilinear_taps(jnp.zeros((1, 3)), (4, 4, 4))
        np.testing.assert_allclose(np.sort(np.asarray(w[0])), 0.125, atol=1e-6)


def test_window_poly6():
    r = jnp.asarray([0.0, 0.5, 1.0, 2.0])
    w = np.asarray(cconv.window_poly6(r))
    np.testing.assert_allclose(w, [1.0, 0.125, 0.0, 0.0], atol=1e-6)


def _np_ball_to_cube(p):
    """Independent float64 numpy implementation of the documented mapping."""
    x, y, z = float(p[0]), float(p[1]), float(p[2])
    r2 = x * x + y * y + z * z
    if r2 < 1e-16:
        return np.zeros(3)
    r = np.sqrt(r2)
    # ball -> cylinder
    if 1.25 * z * z > x * x + y * y:
        s = np.sqrt(3.0 * r / (r + abs(z)))
        x, y, z = x * s, y * s, np.sign(z) * r
    else:
        s = r / np.sqrt(x * x + y * y)
        x, y, z = x * s, y * s, 1.5 * z
    # cylinder -> cube (inverse concentric map on x, y)
    rho = np.sqrt(x * x + y * y)
    if rho < 1e-12:
        return np.array([0.0, 0.0, z])
    if abs(x) >= abs(y):
        a = np.sign(x) * rho
        b = (4.0 / np.pi) * a * np.arctan(y / x)
        return np.array([a, b, z])
    b = np.sign(y) * rho
    a = (4.0 / np.pi) * b * np.arctan(x / y)
    return np.array([a, b, z])


def _naive_cconv(filters, points, feats, queries, radius, inclusive=True,
                 exclude_self=False, use_window=True):
    """Straight-line numpy (float64) oracle implementing the documented math."""
    kz, ky, kx = filters.shape[:3]
    q_out = np.zeros((len(queries), filters.shape[-1]), np.float64)
    for qi, q in enumerate(queries):
        for pi, p in enumerate(points):
            d2 = ((p.astype(np.float64) - q) ** 2).sum()
            if d2 > radius**2 or (exclude_self and d2 == 0):
                continue
            off = (p - q) / radius
            cube = _np_ball_to_cube(off)
            t = (cube * 0.5 + 0.5) * (np.array([kx, ky, kz]) - 1.0)
            t = np.clip(t, 0, np.array([kx, ky, kz]) - 1.0)
            i0 = np.minimum(np.floor(t).astype(int), np.array([kx, ky, kz]) - 2)
            f = t - i0
            w = min(max((1.0 - d2 / radius**2) ** 3, 0.0), 1.0) if use_window else 1.0
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        wt = (
                            (f[2] if dz else 1 - f[2])
                            * (f[1] if dy else 1 - f[1])
                            * (f[0] if dx else 1 - f[0])
                        )
                        tap = filters[i0[2] + dz, i0[1] + dy, i0[0] + dx]  # (Cin, Cout)
                        q_out[qi] += w * wt * feats[pi] @ tap
    return q_out


@pytest.mark.parametrize("chunked", [False, True])
def test_cconv_matches_naive(rng, chunked):
    n, q, cin, cout = 40, 13, 5, 7
    radius = 0.35
    points = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    queries = rng.uniform(-1, 1, size=(q, 3)).astype(np.float32)
    filters = rng.normal(size=(4, 4, 4, cin, cout)).astype(np.float32) * 0.1

    nbrs = ns.radius_search(jnp.asarray(queries), jnp.asarray(points), radius, k=32,
                            order="nearest", inclusive=True)
    out = cconv.continuous_conv(
        jnp.asarray(filters), jnp.asarray(points), jnp.asarray(feats),
        jnp.asarray(queries), nbrs, extent=2 * radius,
        query_chunk=4 if chunked else 1024,
    )
    expect = _naive_cconv(filters, points, feats, queries, radius)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)


def test_cconv_position_gradients(rng):
    """The whole point of NeuroFluid: image/particle losses differentiate
    through the conv w.r.t. positions. Check against finite differences."""
    n, q, cin, cout = 12, 4, 3, 2
    radius = 0.5
    points = rng.uniform(-0.4, 0.4, size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    queries = rng.uniform(-0.3, 0.3, size=(q, 3)).astype(np.float32)
    filters = rng.normal(size=(4, 4, 4, cin, cout)).astype(np.float32) * 0.1

    def loss(pts64):
        pts = pts64.astype(jnp.float64)
        nbrs = ns.radius_search(jnp.asarray(queries, jnp.float64), pts, radius, k=16,
                                order="nearest")
        out = cconv.continuous_conv(
            jnp.asarray(filters, jnp.float64), pts, jnp.asarray(feats, jnp.float64),
            jnp.asarray(queries, jnp.float64), nbrs, extent=2 * radius)
        return jnp.sum(out**2)

    jax.config.update("jax_enable_x64", True)
    try:
        p64 = jnp.asarray(points, jnp.float64)
        g = jax.grad(loss)(p64)
        l0 = float(loss(p64))
        # The ball->cube mapping is C0 but has derivative kinks at its branch
        # boundaries (cone / wedge interfaces), so at a kink the analytic
        # gradient must lie between the one-sided finite differences.
        eps = 1e-5
        for (i, d) in [(0, 0), (3, 1), (7, 2)]:
            pp = np.asarray(p64, np.float64).copy()
            pp[i, d] += eps
            lp = float(loss(jnp.asarray(pp)))
            pp[i, d] -= 2 * eps
            lm = float(loss(jnp.asarray(pp)))
            fd_plus = (lp - l0) / eps
            fd_minus = (l0 - lm) / eps
            lo = min(fd_plus, fd_minus)
            hi = max(fd_plus, fd_minus)
            slack = 1e-4 + 1e-2 * (hi - lo) + 1e-3 * max(abs(lo), abs(hi))
            assert lo - slack <= float(g[i, d]) <= hi + slack, (
                i, d, float(g[i, d]), fd_minus, fd_plus
            )
    finally:
        jax.config.update("jax_enable_x64", False)


def test_cconv_empty_neighborhood(rng):
    points = rng.uniform(5, 6, size=(10, 3)).astype(np.float32)  # far away
    feats = rng.normal(size=(10, 4)).astype(np.float32)
    queries = jnp.zeros((3, 3))
    filters = rng.normal(size=(4, 4, 4, 4, 8)).astype(np.float32)
    nbrs = ns.radius_search(queries, jnp.asarray(points), 0.5, k=8)
    out = cconv.continuous_conv(jnp.asarray(filters), jnp.asarray(points),
                                jnp.asarray(feats), queries, nbrs, extent=1.0)
    np.testing.assert_allclose(np.asarray(out), 0.0)

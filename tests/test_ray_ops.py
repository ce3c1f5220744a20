"""Golden tests for ray generation, sampling, and compositing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neurofluid_tpu.ops import ray_ops


def test_ray_directions_center_pixel():
    H = W = 4
    focal = 10.0
    dirs = np.asarray(ray_ops.get_ray_directions(H, W, focal))
    assert dirs.shape == (H, W, 3)
    # pixel (0,0): i=0, j=0 -> ((0-2)/f, -(0-2)/f, -1)
    np.testing.assert_allclose(dirs[0, 0], [-0.2, 0.2, -1.0], atol=1e-6)
    # x grows along width, y decreases along height, z constant -1
    assert dirs[0, 3, 0] > dirs[0, 0, 0]
    assert dirs[3, 0, 1] < dirs[0, 0, 1]
    np.testing.assert_allclose(dirs[..., 2], -1.0)


def test_get_rays_world_space():
    H = W = 3
    dirs = ray_ops.get_ray_directions(H, W, 5.0)
    # camera at (1, 2, 3) with identity rotation
    c2w = jnp.asarray([[1.0, 0, 0, 1.0], [0, 1, 0, 2.0], [0, 0, 1, 3.0]])
    rays_o, rays_d = ray_ops.get_rays(dirs, c2w)
    np.testing.assert_allclose(np.asarray(rays_o), np.broadcast_to([1.0, 2, 3], (3, 3, 3)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-6)
    # pixel (1,1) of 3x3: i=j=1 -> dir ((1-1.5)/5, -(1-1.5)/5, -1) normalized
    np.testing.assert_allclose(
        np.asarray(rays_d[1, 1]), [-0.0991, 0.0991, -0.9901], atol=1e-3
    )


def _random_rays(n, rng):
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate([o, d], -1))


def test_coarse_sample_linear_and_disp(rng):
    rays = _random_rays(5, rng)
    z, xyz = ray_ops.coarse_sample_rays(2.0, 6.0, rays, 5)
    np.testing.assert_allclose(np.asarray(z[0]), [2, 3, 4, 5, 6], atol=1e-5)
    expect = np.asarray(rays)[:, None, :3] + np.asarray(rays)[:, None, 3:] * np.asarray(z)[..., None]
    np.testing.assert_allclose(np.asarray(xyz), expect, atol=1e-5)

    z_disp, _ = ray_ops.coarse_sample_rays(2.0, 6.0, rays, 3, use_disp=True)
    np.testing.assert_allclose(np.asarray(z_disp[0]), [2.0, 3.0, 6.0], atol=1e-5)


def test_coarse_sample_perturb_within_bins(rng):
    rays = _random_rays(4, rng)
    key = jax.random.PRNGKey(0)
    z, _ = ray_ops.coarse_sample_rays(1.0, 2.0, rays, 8, perturb=1.0, key=key)
    z = np.asarray(z)
    zl, _ = ray_ops.coarse_sample_rays(1.0, 2.0, rays, 8)
    zl = np.asarray(zl)
    mid = 0.5 * (zl[:, :-1] + zl[:, 1:])
    upper = np.concatenate([mid, zl[:, -1:]], -1)
    lower = np.concatenate([zl[:, :1], mid], -1)
    assert np.all(z >= lower - 1e-6) and np.all(z <= upper + 1e-6)
    assert np.all(np.diff(z, axis=-1) > 0)


def test_sample_pdf_deterministic_concentrates_mass():
    # all mass in bin [0.4, 0.5] -> deterministic samples land there
    bins = jnp.asarray(np.linspace(0, 1, 11, dtype=np.float32))[None].repeat(2, 0)
    weights = np.zeros((2, 10), np.float32)
    weights[:, 4] = 1.0
    samples = np.asarray(ray_ops.sample_pdf(bins, jnp.asarray(weights), 16, det=True))
    assert samples.shape == (2, 16)
    # (1e-5 smoothing leaks a little mass; >80% of samples must be in the bin)
    frac = np.mean((samples >= 0.4 - 1e-3) & (samples <= 0.5 + 1e-3))
    assert frac > 0.8


def test_sample_pdf_uniform_matches_linspace():
    bins = jnp.asarray(np.linspace(2, 3, 5, dtype=np.float32))[None]
    weights = jnp.ones((1, 4), jnp.float32)
    s = np.asarray(ray_ops.sample_pdf(bins, weights, 5, det=True))
    np.testing.assert_allclose(s[0], np.linspace(2, 3, 5), atol=1e-3)


def test_importance_sampling_sorted_and_contains_coarse(rng):
    rays = _random_rays(3, rng)
    z, _ = ray_ops.coarse_sample_rays(1.0, 2.0, rays, 8)
    weights = jnp.asarray(rng.uniform(size=(3, 8)).astype(np.float32))
    xyz, z_all = ray_ops.importance_sampling(z, weights, 4, rays[:, :3], rays[:, 3:], det=True)
    assert z_all.shape == (3, 12)
    z_np = np.asarray(z_all)
    assert np.all(np.diff(z_np, axis=-1) >= 0)
    # coarse z values are all present in the merged set
    for zc in np.asarray(z)[0]:
        assert np.min(np.abs(z_np[0] - zc)) < 1e-6
    expect = np.asarray(rays)[:, None, :3] + np.asarray(rays)[:, None, 3:] * z_np[..., None]
    np.testing.assert_allclose(np.asarray(xyz), expect, atol=1e-5)


def test_composite_closed_form_opaque_sample():
    # single fully opaque sample in the middle: pixel = its rgb, depth = its z
    n_s = 4
    z = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    rgbsigma = np.zeros((1, n_s, 4), np.float32)
    rgbsigma[0, 1, :3] = [0.2, 0.4, 0.6]
    rgbsigma[0, 1, 3] = 1e8  # opaque
    rays = jnp.asarray([[0, 0, 0, 0, 0, 1.0]])
    rgb, depth, w = ray_ops.composite(jnp.asarray(rgbsigma), z, rays, white_background=False)
    np.testing.assert_allclose(np.asarray(rgb[0]), [0.2, 0.4, 0.6], atol=1e-5)
    np.testing.assert_allclose(float(depth[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w[0]), [0, 1, 0, 0], atol=1e-5)


def test_composite_empty_space_white_background():
    z = jnp.asarray([[1.0, 2.0, 3.0]])
    rgbsigma = jnp.zeros((1, 3, 4))
    rays = jnp.asarray([[0, 0, 0, 0, 0, 1.0]])
    rgb, depth, w = ray_ops.composite(rgbsigma, z, rays, white_background=True)
    np.testing.assert_allclose(np.asarray(rgb[0]), [1.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(float(depth[0]), 0.0, atol=1e-6)


def test_composite_alpha_formula_matches_numpy(rng):
    n, s = 6, 10
    z = np.sort(rng.uniform(1, 5, size=(n, s)).astype(np.float32), axis=-1)
    rgbsigma = rng.uniform(0, 1, size=(n, s, 4)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rays = np.concatenate([np.zeros((n, 3), np.float32), d], -1)

    rgb, depth, w = ray_ops.composite(
        jnp.asarray(rgbsigma), jnp.asarray(z), jnp.asarray(rays), white_background=True
    )

    deltas = np.concatenate([z[:, 1:] - z[:, :-1], np.full((n, 1), 1e10, np.float32)], -1)
    deltas = deltas * np.linalg.norm(d, axis=-1, keepdims=True)
    alphas = 1 - np.exp(-deltas * np.maximum(rgbsigma[..., 3], 0))
    shifted = np.concatenate([np.ones((n, 1), np.float32), 1 - alphas + 1e-10], -1)
    weights = alphas * np.cumprod(shifted, -1)[:, :-1]
    rgb_np = (weights[..., None] * rgbsigma[..., :3]).sum(-2) + (
        1 - weights.sum(-1, keepdims=True)
    )
    np.testing.assert_allclose(np.asarray(rgb), rgb_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w), weights, atol=1e-4)


def test_composite_grad_flows():
    z = jnp.asarray([[1.0, 2.0, 3.0]])
    rays = jnp.asarray([[0, 0, 0, 0, 0, 1.0]])

    # distinct per-sample colors so the pixel actually depends on sigma
    colors = jnp.asarray(np.linspace(0.1, 0.9, 9, dtype=np.float32).reshape(1, 3, 3))

    def loss(sig):
        rgbsigma = jnp.concatenate([colors, sig[None, :, None]], axis=-1)
        rgb, _, _ = ray_ops.composite(rgbsigma, z, rays)
        return jnp.sum(rgb**2)

    g = jax.grad(loss)(jnp.asarray([0.1, 0.2, 0.3]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)

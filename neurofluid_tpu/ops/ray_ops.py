"""Ray generation, stratified/importance sampling, and volume compositing.

Pure fixed-shape JAX functions; everything here jit-compiles to fused XLA and
is trivially vmap/shard_map-able over the ray axis. Behavioral contract comes
from the reference implementation:

- `get_ray_directions` / `get_rays`: reference utils/ray_utils.py:85-130
- `coarse_sample_rays`: reference utils/ray_utils.py:232-256
- `sample_pdf` / `importance_sampling`: reference utils/ray_utils.py:178-229
- `composite`: reference models/renderer.py:182-208

Conventions match the reference: rays are (..., 6) with origin in [..., :3]
and *normalized* world direction in [..., 3:]; pixel rays use the Blender
camera convention (x right, y up, camera looks along -z), without the +0.5
pixel-center offset (reference utils/ray_utils.py:99-102).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_to_ray_distance(points: jax.Array, rays_o: jax.Array, rays_d: jax.Array):
    """Perpendicular distance from each point to each ray.

    points (P, 3); rays_o/rays_d (R, 3), directions normalized.
    Returns (P, R). Vectorized replacement for the reference's chunked helper
    (reference utils/ray_utils.py:19-34).
    """
    vec = points[:, None, :] - rays_o[None, :, :]  # (P, R, 3)
    t = jnp.einsum("prc,rc->pr", vec, rays_d)
    closest = rays_o[None] + t[..., None] * rays_d[None]
    return jnp.linalg.norm(points[:, None, :] - closest, axis=-1)


def assign_particles_to_rays(points: jax.Array, rays: jax.Array) -> jax.Array:
    """Index of the nearest ray per particle (reference utils/ray_utils.py:36-82,
    which built a python dict over chunks; here one vectorized argmin)."""
    dists = point_to_ray_distance(points, rays[:, :3], rays[:, 3:])
    return jnp.argmin(dists, axis=-1)


def get_ray_directions(height: int, width: int, focal) -> jax.Array:
    """Per-pixel ray directions in camera coordinates, (H, W, 3).

    Mirrors reference utils/ray_utils.py:85-104 (kornia create_meshgrid with
    normalized_coordinates=False => pixel indices 0..W-1 / 0..H-1).
    """
    j, i = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    directions = jnp.stack(
        [(i - width / 2) / focal, -(j - height / 2) / focal, -jnp.ones_like(i)],
        axis=-1,
    )
    return directions


def get_rays(directions: jax.Array, c2w: jax.Array):
    """World-space rays for one camera. Returns (rays_o, rays_d), each (H, W, 3).

    Mirrors reference utils/ray_utils.py:107-130: rotate camera-space dirs by
    c2w[:, :3], normalize, and broadcast the camera origin c2w[:, 3].
    """
    rays_d = directions @ c2w[:, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    return rays_o, rays_d


def make_ray_bundle(directions: jax.Array, c2w: jax.Array) -> jax.Array:
    """(H, W, 6) concatenated [rays_o, rays_d] bundle (reference dataset.py:100)."""
    rays_o, rays_d = get_rays(directions, c2w)
    return jnp.concatenate([rays_o, rays_d], axis=-1)


def get_ndc_rays(height, width, focal, near, rays_o, rays_d):
    """Rays in normalized device coordinates (reference utils/ray_utils.py:133-174).

    Unused by the NeuroFluid pipeline but part of the public API surface.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (width / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (height / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (width / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (height / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)


def coarse_sample_rays(
    near: float,
    far: float,
    rays: jax.Array,
    n_samples: int,
    use_disp: bool = False,
    perturb: float = 0.0,
    key: jax.Array | None = None,
):
    """Coarse z values + sample points along each ray.

    Mirrors reference utils/ray_utils.py:232-256. Returns
    (z_vals (N_rays, S), xyz (N_rays, S, 3)).

    `perturb > 0` requires a PRNG `key`; stratified jitter samples uniformly in
    the [lower, upper] bins exactly like the reference.
    """
    n_rays = rays.shape[0]
    z_steps = jnp.linspace(0.0, 1.0, n_samples, dtype=rays.dtype)
    if not use_disp:
        z_vals = near * (1.0 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)
    z_vals = jnp.broadcast_to(z_vals, (n_rays, n_samples))

    if perturb > 0:
        if key is None:
            raise ValueError("perturb > 0 requires a PRNG key")
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([z_mid, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], z_mid], axis=-1)
        u = perturb * jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * u

    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[:, :, None]
    return z_vals, xyz


def sample_pdf(
    bins: jax.Array,
    weights: jax.Array,
    n_samples: int,
    det: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """Inverse-CDF sampling of `n_samples` z values from a piecewise pdf.

    Mirrors reference utils/ray_utils.py:178-220 (the classic NeRF
    hierarchical sampler): bins (N, B), weights (N, B-1) -> samples (N, S).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (N, B)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        if key is None:
            raise ValueError("stochastic sample_pdf requires a PRNG key")
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)

    # searchsorted(right) per row; gradients do not flow through the cdf here,
    # matching `torch.searchsorted(cdf.detach(), u)` in the reference.
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        jax.lax.stop_gradient(cdf), u
    )
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def importance_sampling(
    z_vals: jax.Array,
    weights: jax.Array,
    n_importance: int,
    rays_o: jax.Array,
    rays_d: jax.Array,
    det: bool,
    key: jax.Array | None = None,
):
    """Fine-pass sample placement from coarse weights.

    Mirrors reference utils/ray_utils.py:222-229: sample from the pdf over
    midpoint bins using weights[:, 1:-1], merge with the coarse z values, and
    sort. New samples are detached (stop_gradient), as in the reference.
    Returns (xyz (N, S0+Si, 3), z_vals (N, S0+Si)).
    """
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(z_mid, weights[:, 1:-1], n_importance, det=det, key=key)
    z_samples = jax.lax.stop_gradient(z_samples)
    z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    xyz = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
    return xyz, z_all


def composite(
    rgbsigma: jax.Array,
    z_vals: jax.Array,
    rays: jax.Array,
    noise_std: float = 0.0,
    white_background: bool = True,
    key: jax.Array | None = None,
    backend: str = "auto",
):
    """Volume rendering compositing of per-sample (rgb, sigma) into pixels.

    Mirrors reference models/renderer.py:182-208:
      deltas_i = (z_{i+1} - z_i) * ||d||, last delta = 1e10
      alpha_i  = 1 - exp(-delta_i * relu(sigma_i + noise))
      w_i      = alpha_i * prod_{j<i}(1 - alpha_j + 1e-10)
      rgb      = sum w_i rgb_i (+ (1 - sum w) if white background)

    Returns (rgb (N, 3), depth (N,), weights (N, S)).

    `backend`: 'xla' = plain jnp chain (cumprod); 'pallas' = the fused
    VMEM-resident weight kernel with its analytic custom VJP
    (ops/pallas_kernels.composite_weights, MXU log-space cumprod/cumsuffix);
    'auto' = pallas on TPU, xla elsewhere. Numerically equivalent (tested).
    """
    rgbs = rgbsigma[..., :3]
    sigmas = rgbsigma[..., 3]

    if noise_std > 0.0:
        if key is None:
            raise ValueError("noise_std > 0 requires a PRNG key")
        sigmas = sigmas + jax.random.normal(key, sigmas.shape, sigmas.dtype) * noise_std

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    if backend == "pallas":
        from neurofluid_tpu.ops import pallas_kernels

        dnorm = jnp.linalg.norm(rays[:, 3:], axis=-1, keepdims=True)
        weights = pallas_kernels.composite_weights(sigmas, z_vals, dnorm)
    else:
        deltas = z_vals[:, 1:] - z_vals[:, :-1]
        delta_inf = jnp.full_like(deltas[:, :1], 1e10)
        deltas = jnp.concatenate([deltas, delta_inf], axis=-1)
        deltas = deltas * jnp.linalg.norm(rays[:, None, 3:], axis=-1)

        alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))
        shifted = jnp.concatenate(
            [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1
        )
        weights = alphas * jnp.cumprod(shifted, axis=-1)[:, :-1]

    weights_sum = weights.sum(axis=1)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)

    if white_background:
        rgb = rgb + (1.0 - weights_sum[..., None])
    return rgb, depth, weights

"""Pallas kernels vs their XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from neurofluid_tpu.ops import ray_ops
from neurofluid_tpu.ops.pallas_kernels import composite_weights_pallas


def _problem(rng, n=70, s=24):
    z = np.sort(rng.uniform(1, 5, size=(n, s)).astype(np.float32), axis=-1)
    sigmas = rng.uniform(-1, 3, size=(n, s)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rays = np.concatenate([np.zeros((n, 3), np.float32), d], -1)
    return jnp.asarray(sigmas), jnp.asarray(z), jnp.asarray(rays)


def test_composite_weights_matches_xla(rng):
    sigmas, z, rays = _problem(rng)
    rgbsigma = jnp.concatenate(
        [jnp.zeros(sigmas.shape + (3,)), sigmas[..., None]], axis=-1
    )
    _, _, w_ref = ray_ops.composite(rgbsigma, z, rays, white_background=False)
    w = composite_weights_pallas(sigmas, z, rays, block_rays=32, interpret=True)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=2e-4, atol=2e-6)


def test_composite_weights_padding_path(rng):
    # n not divisible by block: padding rows must not leak into outputs
    sigmas, z, rays = _problem(rng, n=33, s=16)
    rgbsigma = jnp.concatenate(
        [jnp.zeros(sigmas.shape + (3,)), sigmas[..., None]], axis=-1
    )
    _, _, w_ref = ray_ops.composite(rgbsigma, z, rays, white_background=False)
    w = composite_weights_pallas(sigmas, z, rays, block_rays=32, interpret=True)
    assert w.shape == (33, 16)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=2e-4, atol=2e-6)

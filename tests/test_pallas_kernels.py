"""Pallas kernels vs their XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from neurofluid_tpu.ops import ray_ops
from neurofluid_tpu.ops.pallas_kernels import (
    composite_weights,
    composite_weights_pallas,
)


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


def _xla_weights(sigmas, z, rays):
    rgbsigma = jnp.concatenate(
        [jnp.zeros(sigmas.shape + (3,)), sigmas[..., None]], axis=-1
    )
    _, _, w = ray_ops.composite(rgbsigma, z, rays, white_background=False,
                                backend="xla")
    return w


def test_composite_weights_custom_vjp_forward(rng):
    sigmas, z, rays = _problem(rng, n=40, s=24)
    dnorm = jnp.linalg.norm(rays[:, 3:], axis=-1, keepdims=True)
    w = composite_weights(sigmas, z, dnorm, 32, True)
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(_xla_weights(sigmas, z, rays)),
        rtol=2e-4, atol=2e-6,
    )


def test_composite_weights_custom_vjp_gradients(rng):
    """The analytic Pallas backward must match autodiff of the XLA chain."""
    sigmas, z, rays = _problem(rng, n=24, s=16)
    dnorm = jnp.linalg.norm(rays[:, 3:], axis=-1, keepdims=True)
    cot = jnp.asarray(rng.normal(size=sigmas.shape).astype(np.float32))

    def loss_pallas(s):
        return jnp.sum(composite_weights(s, z, dnorm, 32, True) * cot)

    def loss_xla(s):
        return jnp.sum(_xla_weights(s, z, rays) * cot)

    g_pallas = jax.grad(loss_pallas)(sigmas)
    g_xla = jax.grad(loss_xla)(sigmas)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=5e-4, atol=1e-5
    )


def test_composite_weights_vmap(rng):
    """The train step vmaps composite over views; the kernel must batch."""
    sigmas, z, rays = _problem(rng, n=16, s=8)
    dnorm = jnp.linalg.norm(rays[:, 3:], axis=-1, keepdims=True)
    sig_v = jnp.stack([sigmas, sigmas * 0.5])
    z_v = jnp.stack([z, z])
    dn_v = jnp.stack([dnorm, dnorm])
    w_v = jax.vmap(lambda s, zz, dn: composite_weights(s, zz, dn, 16, True))(
        sig_v, z_v, dn_v
    )
    np.testing.assert_allclose(
        np.asarray(w_v[0]),
        np.asarray(composite_weights(sigmas, z, dnorm, 16, True)),
        rtol=2e-4, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(w_v[1]),
        np.asarray(composite_weights(sigmas * 0.5, z, dnorm, 16, True)),
        rtol=2e-4, atol=2e-6,
    )

"""Pallas TPU kernels.

`composite_weights_pallas`: fused volume-rendering weight computation — the
per-ray chain deltas -> alphas -> exclusive transmittance cumprod -> weights
(reference models/renderer.py:182-208) in one VMEM-resident kernel per ray
block. The sequential cumprod is reformulated as a strictly-lower-triangular
matmul in log space, so the scan runs on the MXU instead of a VPU loop:

    T_i = prod_{j<i} (1 - alpha_j + eps)
        = exp( sum_{j<i} log(1 - alpha_j + eps) )  -> tril-ones matmul

The kernel is numerically equivalent to ops.ray_ops.composite's weights
(verified in tests against the XLA path, including interpret mode on CPU)
and is exposed behind `ray_ops.composite(..., use_pallas=True)`-style opt-in
by callers; the default path remains plain XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _composite_kernel(z_ref, dnorm_ref, sigma_ref, tri_ref, w_ref):
    z = z_ref[:]  # (B, S)
    sigmas = sigma_ref[:]  # (B, S)
    dnorm = dnorm_ref[:]  # (B, 1) ||ray_d||

    deltas = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=1
    )
    deltas = deltas * dnorm
    # survival = 1 - alpha computed directly: the textbook `1 - alpha + eps`
    # loses the eps to reassociation when alpha == 1 (log -> -inf -> NaN)
    survival = jnp.exp(-deltas * jnp.maximum(sigmas, 0.0))
    alphas = 1.0 - survival
    log_surv = jnp.log(survival + 1e-10)  # (B, S)
    # exclusive cumsum along S as a strictly-lower-triangular matmul (MXU)
    log_t = jax.lax.dot_general(
        log_surv, tri_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w_ref[:] = alphas * jnp.exp(log_t)


@functools.partial(jax.jit, static_argnames=("block_rays", "interpret"))
def composite_weights_pallas(
    sigmas: jax.Array,
    z_vals: jax.Array,
    rays: jax.Array,
    block_rays: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Volume-rendering weights (N, S) from sigmas (N, S), z (N, S), rays (N, 6).

    Matches ops.ray_ops.composite's `weights` output (noise_std = 0).
    """
    n, s = sigmas.shape
    block = min(block_rays, n)
    n_blocks = -(-n // block)
    pad = n_blocks * block - n

    dnorm = jnp.linalg.norm(rays[:, 3:], axis=-1, keepdims=True)
    if pad:
        sigmas = jnp.pad(sigmas, ((0, pad), (0, 0)))
        z_vals = jnp.pad(z_vals, ((0, pad), (0, 0)))
        dnorm = jnp.pad(dnorm, ((0, pad), (0, 0)))

    # strictly lower triangular (as columns of the contraction): tri[j, i] = 1
    # iff j < i, so (log_surv @ tri)[b, i] = sum_{j<i} log_surv[b, j]
    tri = jnp.asarray(
        jnp.tril(jnp.ones((s, s), jnp.float32), k=-1).T
    )

    weights = pl.pallas_call(
        _composite_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block, s), jnp.float32),
        interpret=interpret,
    )(z_vals, dnorm, sigmas, tri)
    return weights[:n]

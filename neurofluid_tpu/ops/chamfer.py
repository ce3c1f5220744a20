"""Chamfer distance between point sets.

TPU replacement for pytorch3d's CUDA `chamfer_distance` used by the trainers
(reference trainer/basetrainer.py:14,129-134): symmetric sum of mean squared
nearest-neighbor distances. For the particle counts in play (~1e4) the tiled
N x M squared-distance matrix rides the MXU and needs no spatial structure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _min_sq_dists(x: jax.Array, y: jax.Array, chunk: int = 4096) -> jax.Array:
    """min_j ||x_i - y_j||^2 for each i, computed in query chunks."""
    n = x.shape[0]
    chunk = min(chunk, max(n, 1))
    n_chunks = max(1, -(-n // chunk))
    pad = n_chunks * chunk - n
    xp = jnp.pad(x, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)

    y_sq = jnp.sum(y**2, axis=-1)

    def body(xc):
        d2 = (
            jnp.sum(xc**2, axis=-1, keepdims=True)
            + y_sq[None, :]
            - 2.0 * xc @ y.T
        )
        return jnp.min(jnp.maximum(d2, 0.0), axis=-1)

    if n_chunks == 1:
        out = body(xp[0])
    else:
        out = jax.lax.map(body, xp).reshape(-1)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("chunk",))
def chamfer_distance(x: jax.Array, y: jax.Array, chunk: int = 4096) -> jax.Array:
    """Symmetric chamfer distance: mean_i min_j d2 + mean_j min_i d2.

    Matches pytorch3d.loss.chamfer_distance defaults (squared distances,
    mean point reduction, sum over the two directions).
    """
    return jnp.mean(_min_sq_dists(x, y, chunk)) + jnp.mean(_min_sq_dists(y, x, chunk))


def nearest_neighbor_dists(x: jax.Array, y: jax.Array, chunk: int = 4096) -> jax.Array:
    """Euclidean distance from each x to its nearest y (device-side cKDTree
    replacement for metric evaluation, reference utils/point_eval.py:11-14)."""
    return jnp.sqrt(_min_sq_dists(x, y, chunk))

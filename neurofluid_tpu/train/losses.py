"""Loss functions shared by the three training stages.

Contracts from the reference:
- RGB MSE + PSNR (reference trainer/trainer_e2e.py:24-25, 238-243),
- neighbor-weighted particle distance loss with importance
  exp(-n_neighbors / 40) and dist^0.5 (reference trainer/basetrainer.py:146-161),
- boundary L1 against the clipped positions for the z-up container
  x, y in +-(1 - r), z in [-1 + r, 2.4552 - r] (reference
  trainer/basetrainer.py:58-70, 141-143).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PARTICLE_RADIUS = 0.025


class BoxBounds(NamedTuple):
    lower: jax.Array  # (3,)
    upper: jax.Array  # (3,)


def default_box_bounds(particle_radius: float = PARTICLE_RADIUS) -> BoxBounds:
    """The reference's hardcoded container (trainer/basetrainer.py:58-62)."""
    lower = jnp.asarray(
        [-1.0 + particle_radius, -1.0 + particle_radius, -1.0 + particle_radius]
    )
    upper = jnp.asarray(
        [1.0 - particle_radius, 1.0 - particle_radius, 2.4552 - particle_radius]
    )
    return BoxBounds(lower, upper)


def clip_to_box(pos: jax.Array, bounds: BoxBounds) -> jax.Array:
    return jnp.clip(pos, bounds.lower, bounds.upper)


def boundary_loss(pos: jax.Array, bounds: BoxBounds) -> jax.Array:
    """Mean L1 distance to the clipped position (reference basetrainer.py:141-143)."""
    return jnp.mean(jnp.abs(pos - clip_to_box(pos, bounds)))


def weighted_mse_loss(
    pred_pos: jax.Array,
    gt_pos: jax.Array,
    num_fluid_neighbors: jax.Array,
    gamma: float = 0.5,
    neighbor_scale: float = 1.0 / 40.0,
) -> jax.Array:
    """Importance-weighted particle distance (reference basetrainer.py:146-161)."""
    importance = jnp.exp(-neighbor_scale * num_fluid_neighbors)
    dist = jnp.sqrt(jnp.sum((pred_pos - gt_pos) ** 2, axis=-1) + 1e-12)
    return jnp.mean(importance * dist**gamma)


def ema_update(teacher_params, student_params, global_step, factor: float = 0.99):
    """Mean-teacher EMA update (reference trainer/basetrainer.py:164-168):
    uses the true average until the exponential average is more correct."""
    f = jnp.minimum(1.0 - 1.0 / (global_step + 1.0), factor)
    return jax.tree_util.tree_map(
        lambda t, s: t * f + s * (1.0 - f), teacher_params, student_params
    )


def img_mse(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean((pred - gt) ** 2)


def mse_to_psnr(mse: jax.Array) -> jax.Array:
    """PSNR = -10 log10(mse) for [0,1] images (reference trainer_e2e.py:25)."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)

"""Learning-rate schedules (optax-compatible callables).

Contracts from the reference:
- continuous exponential decay lr * gamma^(step / decay_epochs)
  (reference utils/lr_schedulers.py:3-12),
- linear warmup then exponential decay (reference utils/lr_schedulers.py:14-35),
- piecewise factors chosen by `step > boundary` with the e2e boundary tables
  (reference trainer/trainer_e2e.py:87-141).
"""

from __future__ import annotations

import jax.numpy as jnp

# e2e stage tables (reference trainer_e2e.py:88-130)
E2E_RENDERER_BOUNDARIES = (10_000, 75_000, 150_000)
E2E_RENDERER_FACTORS = (1.0, 0.5, 0.25, 0.125)
E2E_TRANSITION_BOUNDARIES = (10_000, 30_000, 50_000, 100_000, 300_000)
E2E_TRANSITION_FACTORS = (1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125)


def exponential_decay(init_value: float, decay_epochs: int, gamma: float = 0.1):
    def schedule(step):
        return init_value * gamma ** (step / decay_epochs)

    return schedule


def warmup_exponential_decay(
    init_value: float, decay_epochs: int, warmup_epochs: int = 10_000,
    gamma: float = 0.1,
):
    def schedule(step):
        warm = init_value * (step + 1.0) / warmup_epochs
        decayed = init_value * gamma ** (step / decay_epochs)
        return jnp.where(step < warmup_epochs, warm, decayed)

    return schedule


def piecewise_factors(init_value: float, boundaries, factors):
    """factor = factors[#boundaries strictly below step] (reference `x > b`)."""
    assert len(factors) == len(boundaries) + 1
    b = jnp.asarray(boundaries)
    f = jnp.asarray(factors)

    def schedule(step):
        idx = jnp.sum(step > b)
        return init_value * f[idx]

    return schedule


def e2e_renderer_schedule(init_value: float = 3e-4):
    return piecewise_factors(init_value, E2E_RENDERER_BOUNDARIES, E2E_RENDERER_FACTORS)


def e2e_transition_schedule(init_value: float = 1e-5):
    return piecewise_factors(
        init_value, E2E_TRANSITION_BOUNDARIES, E2E_TRANSITION_FACTORS
    )

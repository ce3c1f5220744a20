"""Sinusoidal positional encoding.

Mirrors the reference `Embedding` (reference models/nerf.py:4-38): the output
is [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] with log-spaced
frequency bands f_k = 2^k by default — note the interleaved (sin, cos)
per-frequency ordering, which checkpoint-level parity depends on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def embedding_channels(in_channels: int, n_freqs: int) -> int:
    return in_channels * (2 * n_freqs + 1)


def positional_encoding(x: jax.Array, n_freqs: int, logscale: bool = True) -> jax.Array:
    """(..., C) -> (..., C * (2 * n_freqs + 1))."""
    if logscale:
        freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs, dtype=x.dtype)
    out = [x]
    for i in range(n_freqs):
        out.append(jnp.sin(freqs[i] * x))
        out.append(jnp.cos(freqs[i] * x))
    return jnp.concatenate(out, axis=-1)

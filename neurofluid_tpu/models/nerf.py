"""NeRF MLP (flax linen).

Same architecture contract as the reference `NeRF` (reference
models/nerf.py:41-123): D=8 hidden layers of width W=256 with a skip
concatenation of the xyz embedding at layer index 4, a sigma head off the
trunk, and an rgb head conditioned on the direction embedding through a
W/2-wide layer with sigmoid output. `sigma_only` evaluates just the trunk +
sigma head (used by the fine-rendering path, reference renderer.py:310-342).

TPU notes: the MLP is the FLOP hot spot of the whole renderer (~200k sample
evaluations per 1024-ray fine chunk). `compute_dtype=bfloat16` runs the
matmuls on the MXU at full rate with f32 params and f32 head outputs;
activations stay wide (256) so layers tile cleanly.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class NeRF(nn.Module):
    depth: int = 8
    width: int = 256
    in_channels_xyz: int = 63
    in_channels_dir: int = 27
    skips: tuple = (4,)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, sigma_only: bool = False) -> jax.Array:
        """x: (B, in_xyz) if sigma_only else (B, in_xyz + in_dir).

        Returns (B, 1) sigma or (B, 4) [rgb, sigma].
        """
        if sigma_only:
            input_xyz = x
            input_dir = None
        else:
            input_xyz = x[..., : self.in_channels_xyz]
            input_dir = x[..., self.in_channels_xyz :]

        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, dtype=self.compute_dtype, param_dtype=jnp.float32, name=name
        )

        h = input_xyz.astype(self.compute_dtype)
        for i in range(self.depth):
            if i in self.skips:
                h = jnp.concatenate([input_xyz.astype(self.compute_dtype), h], axis=-1)
            h = nn.relu(dense(self.width, f"xyz_encoding_{i + 1}")(h))

        sigma = dense(1, "sigma")(h).astype(jnp.float32)
        if sigma_only:
            return sigma

        feat = dense(self.width, "xyz_encoding_final")(h)
        d = jnp.concatenate([feat, input_dir.astype(self.compute_dtype)], axis=-1)
        d = nn.relu(dense(self.width // 2, "dir_encoding")(d))
        rgb = nn.sigmoid(dense(3, "rgb")(d).astype(jnp.float32))
        return jnp.concatenate([rgb, sigma], axis=-1)

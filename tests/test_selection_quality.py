"""Selection-mode quality pins (VERDICT round-1 weak item 6).

The renderer's default slot selection is `approx` (TPU PartialReduce,
recall ~0.95); the exact pytorch3d-faithful mode is `sort`. Two guarantees:

1. CPU (this file): the two modes are MATH-IDENTICAL whenever the selection
   scores are tie-free — for the renderer's first-K-by-index scores
   (distinct integer indices) ties are impossible, so any divergence is a
   code-path bug, not an approximation. (On CPU `lax.approx_max_k` falls
   back to an exact reduction, so this pins path equivalence; the genuine
   recall<1 behavior only exists on TPU.)
2. TPU (tools/quality_pin_tpu.py, results recorded in BASELINE.md): warmup
   training driven to convergence under both modes must land within
   tolerance in loss and eval PSNR on the real PartialReduce op.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # statistical selection-quality sweeps

from neurofluid_tpu.models.render_net import RenderNet


def _scene(rng, n=3000):
    pos = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
    pos[:, 2] = rng.uniform(-0.5, 0.2, size=n).astype(np.float32)
    ro = np.asarray([0.0, -11.0, 0.0], np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32) * 0.03
    d[:, 1] += 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([np.broadcast_to(ro, d.shape), d], -1)
    return jnp.asarray(pos), jnp.asarray(ro), jnp.asarray(rays)


def _render(selection, pos, ro, rays, params=None):
    net = RenderNet(
        n_samples=16, n_importance=16, nerf_depth=2, nerf_width=32,
        search_backend="grid", search_selection=selection,
        grid_max_per_cell=256,
    )
    if params is None:
        params = net.init(jax.random.PRNGKey(0), pos, ro, rays[:4])
    out = net.apply(params, pos, ro, rays)
    return out, params


def test_approx_matches_sort_when_tie_free(rng):
    """First-K-by-index scores are distinct, so approx and sort must agree
    exactly (up to fp reduction order) regardless of recall."""
    pos, ro, rays = _scene(rng)
    out_s, params = _render("sort", pos, ro, rays)
    out_a, _ = _render("approx", pos, ro, rays, params=params)
    np.testing.assert_allclose(
        np.asarray(out_s["rgb0"]), np.asarray(out_a["rgb0"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_s["rgb1"]), np.asarray(out_a["rgb1"]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_s["num_nn_1"]), np.asarray(out_a["num_nn_1"])
    )

"""Scatter-free segment reductions (ops/segment_ops).

The gather adjoints these ops implement are the TPU replacement for the
scatter-add every neighbor-gather backward needs (reference's CUDA ops
scatter natively; XLA:TPU scatter is a serialized loop). The Pallas
natural-order accumulate path (segment_sum_accumulate) must match the
sort/plan-based reference bit-for-bit up to f32 accumulation order.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurofluid_tpu.ops import segment_ops as so


def test_segment_sum_accumulate_matches_planned():
    rng = np.random.default_rng(0)
    m, c, n = 5000, 96, 337
    vals = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(-1, n, size=(m,)).astype(np.int32))
    plan = so.adjoint_plan(idx, n)
    ref = so._segment_sum_planned(vals, plan.order, plan.starts)
    ids = jnp.where((idx < 0) | (idx >= n), n, idx)
    out = so.segment_sum_accumulate(vals, ids, n, block=1024, streams=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_segment_sum_accumulate_ragged_tail():
    # m NOT a multiple of the block: padding must land in the trash row
    rng = np.random.default_rng(1)
    m, c, n = 777, 8, 50
    vals = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(m,)).astype(np.int32))
    out = so.segment_sum_accumulate(vals, idx, n, block=256, streams=4)
    ref = jax.ops.segment_sum(vals, idx, num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_take_rows_planned_grad_pallas_flag_parity():
    """take_rows_planned backward must be identical with NF_SEGSUM_PALLAS on."""
    rng = np.random.default_rng(2)
    n, c, q, k = 200, 32, 150, 12
    table = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(q, k)).astype(np.int32))
    plan = so.adjoint_plan(idx, n)
    ct = jnp.asarray(rng.normal(size=(q, k, c)).astype(np.float32))

    def loss(t):
        return jnp.sum(so.take_rows_planned(t, idx, plan.order, plan.starts) * ct)

    old = os.environ.get("NF_SEGSUM_PALLAS")
    try:
        os.environ["NF_SEGSUM_PALLAS"] = "0"
        g_ref = jax.grad(loss)(table)
        os.environ["NF_SEGSUM_PALLAS"] = "1"
        g_pallas = jax.grad(loss)(table)
    finally:
        if old is None:
            os.environ.pop("NF_SEGSUM_PALLAS", None)
        else:
            os.environ["NF_SEGSUM_PALLAS"] = old
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-4)

"""Parity tests for ops/fused_cconv (the selection-free fused CConv).

Oracle: the brute-force UNCAPPED pipeline (radius_search_brute with K = N
+ ops/cconv.continuous_conv), i.e. the reference Open3D semantics
(reference models/transmodel.py:80-98). The fused op must match it exactly
(up to f32 roundoff) because the poly6 window zeroes every out-of-radius
candidate — see the module docstring.

Kernels run in Pallas interpret mode on CPU (the same code path the TPU
compiles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurofluid_tpu.ops import cconv as cconv_ops
from neurofluid_tpu.ops import fused_cconv as fc
from neurofluid_tpu.ops import neighbor_search as ns

LOWER = (-1.0, -1.0, -1.0)
UPPER = (1.0, 1.0, 1.0)
RADIUS = 0.25


def _scene(n, seed=0, spread=0.9):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    return jnp.asarray(pos)


def _fused_self(pos, feats, w, radius=RADIUS, t_g=16, s_cap=128):
    plan = fc.build_plan(pos, LOWER, UPPER, radius, group_size=t_g,
                         slab_cap=s_cap)
    pos_s = fc.sort_values(pos, plan, pad_rows=plan.slab_cap,
                           pad_value=fc._SENTINEL)
    feats_s = fc.sort_values(feats, plan, pad_rows=plan.slab_cap)
    out_s, cnt_s = fc.fused_cconv(
        w, plan, pos_s, plan, pos_s, feats_s, radius,
        exclude_self=True, interpret=True,
    )
    return (fc.unsort_values(out_s, plan),
            fc.unsort_values(cnt_s[:, None], plan)[:, 0], plan)


def _oracle_self(pos, feats, w, radius=RADIUS):
    n = pos.shape[0]
    nbrs = ns.radius_search_brute(
        pos, pos, radius, n, order="nearest", inclusive=True,
        exclude_self=True,
    )
    out = cconv_ops.continuous_conv(
        w, pos, feats, pos, nbrs, extent=2 * radius
    )
    return out, nbrs.count.astype(jnp.float32)


class TestForward:
    def test_matches_uncapped_brute_oracle(self):
        rng = np.random.RandomState(3)
        pos = _scene(180)
        feats = jnp.asarray(rng.randn(180, 5).astype(np.float32))
        w = jnp.asarray((rng.randn(4, 4, 4, 5, 7) * 0.1).astype(np.float32))
        out, cnt, plan = _fused_self(pos, feats, w)
        ref, cnt_ref = _oracle_self(pos, feats, w)
        assert not bool(plan.overflow)
        np.testing.assert_allclose(out, ref, atol=2e-6)
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))

    def test_dense_clump_single_cell(self):
        # many points in one cell: exercises multi-group columns and the
        # in-column slab ranges
        rng = np.random.RandomState(4)
        pos = jnp.asarray(
            rng.uniform(-0.1, 0.1, (90, 3)).astype(np.float32)
        )
        feats = jnp.asarray(rng.randn(90, 3).astype(np.float32))
        w = jnp.asarray((rng.randn(4, 4, 4, 3, 4) * 0.1).astype(np.float32))
        out, cnt, plan = _fused_self(pos, feats, w)
        ref, cnt_ref = _oracle_self(pos, feats, w)
        assert not bool(plan.overflow)
        np.testing.assert_allclose(out, ref, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))

    def test_cross_mode_box(self):
        # fluid queries against a separate static candidate set
        # (conv0_obstacle role, exclude_self=False)
        rng = np.random.RandomState(5)
        qpos = _scene(120, seed=6)
        cpos = _scene(60, seed=7)
        cfeats = jnp.asarray(rng.randn(60, 3).astype(np.float32))
        w = jnp.asarray((rng.randn(4, 4, 4, 3, 6) * 0.1).astype(np.float32))
        qplan = fc.build_plan(qpos, LOWER, UPPER, RADIUS)
        cplan = fc.build_plan(cpos, LOWER, UPPER, RADIUS, with_groups=False)
        over = fc.slab_overflow(qplan, cplan)
        qpos_s = fc.sort_values(qpos, qplan, pad_rows=qplan.slab_cap,
                                pad_value=fc._SENTINEL)
        cpos_s = fc.sort_values(cpos, cplan, pad_rows=cplan.slab_cap,
                                pad_value=fc._SENTINEL)
        cfeats_s = fc.sort_values(cfeats, cplan, pad_rows=cplan.slab_cap)
        out_s, cnt_s = fc.fused_cconv(
            w, qplan, qpos_s, cplan, cpos_s, cfeats_s, RADIUS,
            exclude_self=False, interpret=True,
        )
        out = fc.unsort_values(out_s, qplan)
        assert not bool(over)

        nq = qpos.shape[0]
        nbrs = ns.radius_search_brute(
            qpos, cpos, RADIUS, cpos.shape[0], order="nearest",
            inclusive=True, exclude_self=False,
        )
        ref = cconv_ops.continuous_conv(
            w, cpos, cfeats, qpos, nbrs, extent=2 * RADIUS
        )
        np.testing.assert_allclose(out, ref, atol=2e-6)
        cnt = fc.unsort_values(cnt_s[:, None], qplan)[:, 0]
        np.testing.assert_array_equal(
            np.asarray(cnt), np.asarray(nbrs.count.astype(jnp.float32))
        )

    def test_coincident_points(self):
        # exact duplicates: self-exclusion is POSITIONAL (d == 0), so the
        # coincident twin is excluded along with the query itself — both the
        # fused op and the brute oracle implement Open3D's
        # ignore_query_point semantics
        pos = jnp.asarray(
            [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.1, 0.0, 0.0]], jnp.float32
        )
        feats = jnp.ones((3, 2), jnp.float32)
        w = jnp.asarray(
            np.random.RandomState(0).randn(4, 4, 4, 2, 2).astype(np.float32)
        )
        out, cnt, _ = _fused_self(pos, feats, w)
        ref, cnt_ref = _oracle_self(pos, feats, w)
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestGradients:
    def test_grads_match_oracle(self):
        rng = np.random.RandomState(8)
        n = 150
        pos0 = _scene(n, seed=9)
        feats0 = jnp.asarray(rng.randn(n, 4).astype(np.float32))
        w0 = jnp.asarray((rng.randn(4, 4, 4, 4, 5) * 0.1).astype(np.float32))
        plan = fc.build_plan(pos0, LOWER, UPPER, RADIUS)

        def loss_fused(p, f, w):
            ps = fc.sort_values(p, plan, pad_rows=plan.slab_cap,
                                pad_value=fc._SENTINEL)
            fs = fc.sort_values(f, plan, pad_rows=plan.slab_cap)
            o, _ = fc.fused_cconv(w, plan, ps, plan, ps, fs, RADIUS,
                                  exclude_self=True, interpret=True)
            return jnp.sum(jnp.sin(fc.unsort_values(o, plan)))

        def loss_ref(p, f, w):
            nb = ns.radius_search_brute(p, p, RADIUS, n, order="nearest",
                                        inclusive=True, exclude_self=True)
            o = cconv_ops.continuous_conv(w, p, f, p, nb, extent=2 * RADIUS)
            return jnp.sum(jnp.sin(o))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(pos0, feats0, w0)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(pos0, feats0, w0)
        for a, b, tol in zip(g1, g2, (5e-5, 5e-6, 5e-6)):
            assert bool(jnp.all(jnp.isfinite(a)))
            scale = float(jnp.max(jnp.abs(b))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=tol * max(scale, 1.0)
            )


class TestOverflow:
    def test_exact_beyond_slab_cap(self):
        # slab lengths FAR past slab_cap: the segment-packed walk covers
        # the true occupancy, so the result stays exact and no overflow is
        # flagged (the cap only sizes padding; fused_cconv.py "NO CAPACITY
        # CONDITION")
        rng = np.random.RandomState(10)
        pos = jnp.asarray(
            rng.uniform(-0.05, 0.05, (300, 3)).astype(np.float32)
        )
        feats = jnp.asarray(rng.randn(300, 3).astype(np.float32))
        w = jnp.asarray((rng.randn(4, 4, 4, 3, 5) * 0.1).astype(np.float32))
        plan = fc.build_plan(pos, LOWER, UPPER, RADIUS, slab_cap=64)
        assert not bool(plan.overflow)
        pos_s = fc.sort_values(pos, plan, pad_rows=plan.slab_cap,
                               pad_value=fc._SENTINEL)
        feats_s = fc.sort_values(feats, plan, pad_rows=plan.slab_cap)
        out_s, cnt_s = fc.fused_cconv(
            w, plan, pos_s, plan, pos_s, feats_s, RADIUS,
            exclude_self=True, interpret=True,
        )
        out = fc.unsort_values(out_s, plan)
        nbrs = ns.radius_search_brute(
            pos, pos, RADIUS, 300, order="nearest", inclusive=True,
            exclude_self=True,
        )
        ref = cconv_ops.continuous_conv(
            w, pos, feats, pos, nbrs, extent=2 * RADIUS
        )
        np.testing.assert_allclose(out, ref, atol=2e-5)
        cnt = fc.unsort_values(cnt_s[:, None], plan)[:, 0]
        np.testing.assert_array_equal(
            np.asarray(cnt), np.asarray(nbrs.count.astype(jnp.float32))
        )

    def test_no_overflow_when_capacity_suffices(self):
        pos = _scene(100, seed=11)
        plan = fc.build_plan(pos, LOWER, UPPER, RADIUS)
        assert not bool(plan.overflow)

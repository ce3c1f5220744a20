"""Pallas TPU kernels for the fused ball-feature-sums op (ops/ball_features).

Cell-major execution: queries arrive pre-sorted by cell and repacked into
fixed-size groups that each live in ONE cell (ops/ball_features.group_queries),
so every program instance reads exactly 27 candidate-table rows per group,
computes the per-pair terms for its <= T queries entirely in VMEM, and
reduces them to the 13 per-query feature sums — no HBM-resident
(Q, candidates) intermediates, no top-k, no payload gathers. The candidate
tables are small (container-hugging grid, ~1.6k cells x 128 slots x 4B =
0.8 MB per coordinate) and stay VMEM-resident across the whole grid. Each
program processes GPB=8 groups (Mosaic block-shape constraint on the output,
and it amortizes per-program overhead).

The backward kernel is query-major too: it recomputes the forward block and
applies the upstream sum-cotangents via jax.vjp IN-KERNEL, emitting
per-group-reduced cotangents for the 27 candidate rows; ops/ball_features
finishes with a monotone segment-sum over groups (queries sorted by cell) and
27 static shifted adds — scatter-free end to end.

Both kernels share `ball_features._block_sums` with the XLA reference
backend, so the three implementations are the same math by construction;
tests additionally pin them numerically (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurofluid_tpu.ops import ball_features as bf

N_SUMS = bf.N_SUMS
N_SUMS_PAD = bf.N_SUMS_PAD
GPB = 1       # groups per program block. 1 keeps the Mosaic program small
              # (compile time scales with GPB * 27 unrolled cell bodies; at
              # GPB=8 the forward kernel took ~14 min to compile for ~2 ms
              # of runtime win) and the backward's in-kernel vjp residuals
              # (~6 MB/group) inside scoped VMEM.
GPB_BWD = 1


def _group_rows(gcell_ref, g, dims):
    """27 neighbor-table row ids for group g, computed from the prefetched
    per-group cell id with scalar arithmetic (a full (NG, 27) row table would
    blow the 1 MB SMEM budget). Out-of-grid offsets and the sentinel cell map
    to the all-invalid sentinel row."""
    num_cells = dims[0] * dims[1] * dims[2]
    c = gcell_ref[g]
    cz = jax.lax.rem(c, dims[2])
    cy = jax.lax.rem(jax.lax.div(c, dims[2]), dims[1])
    cx = jax.lax.div(c, dims[1] * dims[2])
    rows = []
    for ox, oy, oz, delta in bf._offsets(dims):
        ok = (
            (c < num_cells)
            & (cx + ox >= 0) & (cx + ox < dims[0])
            & (cy + oy >= 0) & (cy + oy < dims[1])
            & (cz + oz >= 0) & (cz + oz < dims[2])
        )
        rows.append(jnp.where(ok, c + delta, num_cells))
    return rows


def _gather_rows(tab_ref, rows):
    # 27 dynamic single-row loads from the VMEM-resident table
    return [tab_ref[pl.ds(r, 1), :] for r in rows]


def _pad_groups(ng, gpb):
    return -(-ng // gpb) * gpb


def _fwd_kernel(rows_ref, qx_ref, qy_ref, qz_ref, tx_ref, ty_ref, tz_ref,
                out_ref, *, radius: float, k: int, t: int, dims: tuple):
    gb = pl.program_id(0)
    for j in range(GPB):
        g = gb * GPB + j
        qx, qy, qz = qx_ref[j], qy_ref[j], qz_ref[j]  # (T, 1) each
        rows = _group_rows(rows_ref, g, dims)
        cx = _gather_rows(tx_ref, rows)  # 27 x (1, cap)
        cy = _gather_rows(ty_ref, rows)
        cz = _gather_rows(tz_ref, rows)
        sums = bf._block_sums(qx, qy, qz, cx, cy, cz, radius, k)  # (T, 16)
        out_ref[j : j + 1, :, :] = sums.reshape(1, t, N_SUMS_PAD)


def forward(q_rep, tx, ty, tz, gcell, dims, radius, k, t,
            interpret: bool | None = None):
    """q_rep (NG*T, 3) -> (NG*T, N_SUMS). See module docstring."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ng = gcell.shape[0]
    ngp = _pad_groups(ng, GPB)
    num_cells = dims[0] * dims[1] * dims[2]
    gcell_p = jnp.pad(gcell, (0, ngp - ng), constant_values=num_cells)
    q3 = jnp.pad(
        q_rep.reshape(ng, t, 3), ((0, ngp - ng), (0, 0), (0, 0)),
        constant_values=bf._SENTINEL,
    )
    qx_in = q3[:, :, 0:1]
    qy_in = q3[:, :, 1:2]
    qz_in = q3[:, :, 2:3]

    qspec = pl.BlockSpec((GPB, t, 1), lambda g, rows: (g, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngp // GPB,),
        in_specs=[
            qspec, qspec, qspec,
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        ],
        out_specs=pl.BlockSpec((GPB, t, N_SUMS_PAD), lambda g, rows: (g, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, radius=float(radius), k=int(k),
                          t=int(t), dims=tuple(dims)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngp, t, N_SUMS_PAD), jnp.float32),
        interpret=interpret,
    )(gcell_p.astype(jnp.int32), qx_in, qy_in, qz_in, tx, ty, tz)
    return out[:ng].reshape(ng * t, N_SUMS_PAD)[:, :N_SUMS]


def _bwd_kernel(rows_ref, qx_ref, qy_ref, qz_ref, cot_ref, tx_ref, ty_ref,
                tz_ref, out_ref, *, radius: float, k: int, t: int, dims: tuple):
    gb = pl.program_id(0)
    for j in range(GPB_BWD):
        g = gb * GPB_BWD + j
        qx, qy, qz = qx_ref[j], qy_ref[j], qz_ref[j]  # (T, 1) each
        cot = cot_ref[j]  # (T, N_SUMS_PAD); pad-column cotangents are inert
        rows = _group_rows(rows_ref, g, dims)
        cx = _gather_rows(tx_ref, rows)
        cy = _gather_rows(ty_ref, rows)
        cz = _gather_rows(tz_ref, rows)

        def f(a, b, c):
            return bf._block_sums(qx, qy, qz, a, b, c, radius, k)

        _, vjp = jax.vjp(f, cx, cy, cz)
        da, db, dc = vjp(cot)  # 27 x (1, cap) each
        cap = cx[0].shape[-1]
        out_ref[j : j + 1, 0:1, :] = jnp.concatenate(da, axis=1).reshape(
            1, 1, 27 * cap
        )
        out_ref[j : j + 1, 1:2, :] = jnp.concatenate(db, axis=1).reshape(
            1, 1, 27 * cap
        )
        out_ref[j : j + 1, 2:3, :] = jnp.concatenate(dc, axis=1).reshape(
            1, 1, 27 * cap
        )


def backward(q_rep, cot_rep, tx, ty, tz, gcell, dims, radius, k, t,
             interpret: bool | None = None):
    """Per-group-reduced table cotangents (NG, 27, cap, 3)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ng = gcell.shape[0]
    ngp = _pad_groups(ng, GPB_BWD)
    cap = tx.shape[1]
    num_cells = dims[0] * dims[1] * dims[2]
    gcell_p = jnp.pad(gcell, (0, ngp - ng), constant_values=num_cells)
    q3 = jnp.pad(
        q_rep.reshape(ng, t, 3), ((0, ngp - ng), (0, 0), (0, 0)),
        constant_values=bf._SENTINEL,
    )
    qx_in = q3[:, :, 0:1]
    qy_in = q3[:, :, 1:2]
    qz_in = q3[:, :, 2:3]
    cot_packed = jnp.pad(
        cot_rep.reshape(ng, t, N_SUMS),
        ((0, ngp - ng), (0, 0), (0, N_SUMS_PAD - N_SUMS)),
    )

    qspec = pl.BlockSpec((GPB_BWD, t, 1), lambda g, rows: (g, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngp // GPB_BWD,),
        in_specs=[
            qspec, qspec, qspec,
            pl.BlockSpec((GPB_BWD, t, N_SUMS_PAD), lambda g, rows: (g, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (GPB_BWD, 3, 27 * cap), lambda g, rows: (g, 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, radius=float(radius), k=int(k),
                          t=int(t), dims=tuple(dims)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngp, 3, 27 * cap), jnp.float32),
        interpret=interpret,
    )(gcell_p.astype(jnp.int32), qx_in, qy_in, qz_in, cot_packed, tx, ty, tz)
    # (NG, 3, 27*cap) -> (NG, 27, cap, 3)
    return jnp.transpose(out[:ng].reshape(ng, 3, 27, cap), (0, 2, 3, 1))

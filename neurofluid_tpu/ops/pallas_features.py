"""Pallas TPU kernels for the fused ball-feature-sums op (ops/ball_features).

Cell-major execution: queries arrive pre-sorted by cell and repacked into
fixed-size groups that each live in ONE cell (ops/ball_features.group_queries),
so every group reads exactly 27 candidate-table rows, computes the per-pair
terms for its <= T queries entirely in VMEM, and reduces them to the 13
per-query feature sums — no HBM-resident (Q, candidates) intermediates, no
top-k, no payload gathers. The candidate tables are small (container-hugging
grid, ~1.6k cells x 128 slots x 4B = 0.8 MB per coordinate) and stay
VMEM-resident across the whole grid.

LOOP SHAPE (round 3): the 27-cell walk is a `lax.fori_loop` INSIDE the
kernel body (running cross-cell selection offset and the sum accumulator as
loop carries), not 27 unrolled cell bodies and not a second grid dimension.
Rationale, measured on v5e:
- round 2 unrolled 27 bodies per program: right runtime shape, but Mosaic
  compile time scales with unrolled body count (train-step compile 328 s,
  GPB pinned to 1);
- a (groups x cells) 2-D grid with scratch accumulators compiled fast but
  ran ~1.7x SLOWER (27x more grid iterations, each with bookkeeping and a
  revisited-output hazard);
- fori_loop keeps ONE grid iteration per group block (round-2 runtime) with
  a single compiled cell body (fast compile), and GPB amortizes dispatch.

Cross-cell coupling is ONLY through the discrete selection budget `off`
(sel = within & (off + rank <= k)): booleans carry no gradient, so the
backward kernel can differentiate one cell at a time with `off` held fixed
— exactly jax.vjp of ball_features._cell_terms per (group, cell), emitting
per-group-reduced cotangents into that cell's slot of the output block.
ops/ball_features finishes with a monotone segment-sum over groups (queries
sorted by cell) and 27 static shifted adds — scatter-free end to end.

Both kernels share `ball_features._cell_terms` with the XLA reference
backend, so the implementations are the same math by construction; tests
additionally pin them numerically (interpret mode on CPU).
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
GPB = 8       # groups per program block (amortizes per-program dispatch;
              # program size is GPB x UNROLL cell bodies)
GPB_BWD = 4   # backward carries jax.vjp residuals per group — keep smaller
# fori_loop unroll factor for the 27-cell walk: 1 = minimal compile but the
# loop-carried (acc, off) chain serializes MXU/VPU work; 27 = round-2 fully
# unrolled runtime but Mosaic compile scales with body count. Tuned on v5e
# via tools/kernel_microbench.py.
UNROLL = 3
UNROLL_BWD = 3


def _row_for_cell(c, o, dims):
    """Neighbor-table row id for cell id `c` at cell-offset index `o`
    (scalar arithmetic; out-of-grid offsets and the sentinel cell map to the
    all-invalid sentinel row = num_cells)."""
    d0, d1, d2 = dims
    num_cells = d0 * d1 * d2
    ox = o // 9 - 1
    oy = (o // 3) % 3 - 1
    oz = o % 3 - 1
    delta = ox * d1 * d2 + oy * d2 + oz
    cz = jax.lax.rem(c, d2)
    cy = jax.lax.rem(jax.lax.div(c, d2), d1)
    cx = jax.lax.div(c, d1 * d2)
    ok = (
        (c < num_cells)
        & (cx + ox >= 0) & (cx + ox < d0)
        & (cy + oy >= 0) & (cy + oy < d1)
        & (cz + oz >= 0) & (cz + oz < d2)
    )
    return jnp.where(ok, c + delta, num_cells)


def _pad_groups(ng, gpb):
    return -(-ng // gpb) * gpb


def _fwd_kernel(rows_ref, qx_ref, qy_ref, qz_ref, tx_ref, ty_ref, tz_ref,
                out_ref, *, radius: float, k: int, t: int, dims: tuple):
    gb = pl.program_id(0)
    d0, d1, d2 = dims
    num_cells = d0 * d1 * d2
    for j in range(GPB):
        g = gb * GPB + j
        c = rows_ref[g]
        qx, qy, qz = qx_ref[j], qy_ref[j], qz_ref[j]  # (T, 1) each

        # the static group bound is capacity/T + num_cells + 2 (every cell
        # may own one partial group); unused tail groups carry the sentinel
        # cell — skip their whole 27-cell walk (30-40% of slots at the bench
        # working point)
        @pl.when(c == num_cells)
        def _skip():
            out_ref[j : j + 1, :, :] = jnp.zeros(
                (1, t, N_SUMS_PAD), out_ref.dtype
            )

        @pl.when(c < num_cells)
        def _run():
            _fwd_group(rows_ref, out_ref, c, qx, qy, qz,
                       tx_ref, ty_ref, tz_ref, j, radius, k, t, dims)


def _fwd_group(rows_ref, out_ref, c, qx, qy, qz, tx_ref, ty_ref, tz_ref,
               j, radius, k, t, dims):
        def body(i, carry):
            # UNROLL cell bodies per iteration, hand-rolled: Mosaic's
            # fori_loop lowering only supports unroll=1 or full unroll, but
            # unroll=1 serializes the per-cell MXU/VPU work on the (acc, off)
            # carry chain (measured 81 ms fwd at the bench point vs ~14 ms
            # partially unrolled — tools/kernel_microbench.py).
            acc, off = carry
            for u in range(UNROLL):
                row = _row_for_cell(c, i * UNROLL + u, dims)
                rx = tx_ref[pl.ds(row, 1), :]  # (1, cap)
                ry = ty_ref[pl.ds(row, 1), :]
                rz = tz_ref[pl.ds(row, 1), :]
                sums, cnt = bf._cell_terms(
                    qx, qy, qz, rx, ry, rz, off, radius, k
                )
                acc = acc + sums
                off = off + cnt
            return acc, off

        assert 27 % UNROLL == 0
        acc, _off = jax.lax.fori_loop(
            0, 27 // UNROLL, body,
            (jnp.zeros((t, N_SUMS_PAD), jnp.float32),
             jnp.zeros((t, 1), jnp.float32)),
        )
        out_ref[j : j + 1, :, :] = acc.reshape(1, t, N_SUMS_PAD)


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
                tz_ref, out_ref, *, radius: float, k: int, t: int,
                dims: tuple):
    gb = pl.program_id(0)
    d0, d1, d2 = dims
    num_cells = d0 * d1 * d2
    for j in range(GPB_BWD):
        g = gb * GPB_BWD + j
        c = rows_ref[g]
        qx, qy, qz = qx_ref[j], qy_ref[j], qz_ref[j]
        cot = cot_ref[j]  # (T, N_SUMS_PAD); pad-column cotangents are inert

        # sentinel tail groups (see _fwd_kernel): zero their cotangent block
        # and skip the 27-cell vjp walk
        @pl.when(c == num_cells)
        def _skip():
            out_ref[j, :, :, :] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

        @pl.when(c < num_cells)
        def _run():
            _bwd_group(out_ref, c, qx, qy, qz, cot, tx_ref, ty_ref, tz_ref,
                       j, radius, k, t, dims)


def _bwd_group(out_ref, c, qx, qy, qz, cot, tx_ref, ty_ref, tz_ref,
               j, radius, k, t, dims):
        def body(i, off):
            for u in range(UNROLL_BWD):
                o = i * UNROLL_BWD + u
                row = _row_for_cell(c, o, dims)
                rx = tx_ref[pl.ds(row, 1), :]
                ry = ty_ref[pl.ds(row, 1), :]
                rz = tz_ref[pl.ds(row, 1), :]

                def f(a, b, c_):
                    return bf._cell_terms(qx, qy, qz, a, b, c_, off, radius, k)

                (_sums, cnt), vjp = jax.vjp(f, rx, ry, rz)
                da, db, dc = vjp((cot, jnp.zeros_like(cnt)))  # 3 x (1, cap)
                cap = da.shape[-1]
                out_ref[j, pl.ds(o, 1), :, :] = jnp.concatenate(
                    [da, db, dc], axis=0
                ).reshape(1, 3, cap)
                off = off + cnt
            return off

        assert 27 % UNROLL_BWD == 0
        jax.lax.fori_loop(0, 27 // UNROLL_BWD, body,
                          jnp.zeros((t, 1), jnp.float32))


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
            (GPB_BWD, 27, 3, cap), lambda g, rows: (g, 0, 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, radius=float(radius), k=int(k),
                          t=int(t), dims=tuple(dims)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngp, 27, 3, cap), jnp.float32),
        interpret=interpret,
    )(gcell_p.astype(jnp.int32), qx_in, qy_in, qz_in, cot_packed, tx, ty, tz)
    # (NG, 27, 3, cap) -> (NG, 27, cap, 3)
    return jnp.swapaxes(out[:ng], -1, -2)

"""Pallas TPU kernels for the fused ball-feature-sums op (ops/ball_features).

Cell-major execution: queries arrive pre-sorted by cell and repacked into
fixed-size groups that each live in ONE cell (ops/ball_features.group_queries),
so every group reads exactly 27 candidate-table rows, computes the per-pair
terms for its <= T queries entirely in VMEM, and reduces them to the 13
per-query feature sums — no HBM-resident (Q, candidates) intermediates, no
top-k, no payload gathers. The candidate tables are small (container-hugging
grid, ~1.6k cells x 128 slots x 4B = 0.8 MB per coordinate) and stay
VMEM-resident across the whole grid.

GRID SHAPE (round 3): the kernels iterate a 2-D grid (group-blocks x 27
cells) instead of unrolling all 27 cell bodies inside one program. The
running cross-cell selection offset is carried in VMEM scratch across the
(sequential, innermost) cell dimension, and the output block — whose index
map ignores the cell dimension — acts as the accumulator. This cut the
Mosaic program ~27x: round 2's unrolled kernels compiled in ~5.5 min
(train-step total 328 s, VERDICT r2) and forced GPB=1; the grid form
compiles in seconds and lets GPB amortize per-iteration overhead.

Cross-cell coupling is ONLY through the discrete selection budget `off`
(sel = within & (off + rank <= k)): booleans carry no gradient, so the
backward kernel can differentiate one cell at a time with `off` held fixed
— exactly jax.vjp of ball_features._cell_terms per (group, cell), emitting
per-group-reduced cotangents for that cell's candidate row. ops/ball_features
finishes with a monotone segment-sum over groups (queries sorted by cell) and
27 static shifted adds — scatter-free end to end.

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
GPB = 8       # groups per program block: amortizes per-grid-step overhead;
              # compile cost is now GPB x ONE cell body (vs GPB x 27 before)
GPB_BWD = 4   # backward carries jax.vjp residuals per group — keep smaller


def _cell_row(gcell_ref, g, o, dims):
    """Neighbor-table row id for group g's cell at cell-offset index o,
    from the prefetched per-group cell id with scalar arithmetic.
    Out-of-grid offsets and the sentinel cell map to the all-invalid
    sentinel row (= num_cells)."""
    d0, d1, d2 = dims
    num_cells = d0 * d1 * d2
    ox = o // 9 - 1
    oy = (o // 3) % 3 - 1
    oz = o % 3 - 1
    delta = ox * d1 * d2 + oy * d2 + oz
    c = gcell_ref[g]
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
                out_ref, off_ref, *, radius: float, k: int, t: int,
                dims: tuple):
    gb = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        off_ref[...] = jnp.zeros(off_ref.shape, off_ref.dtype)

    for j in range(GPB):
        g = gb * GPB + j
        row = _cell_row(rows_ref, g, o, dims)
        rx = tx_ref[pl.ds(row, 1), :]  # (1, cap)
        ry = ty_ref[pl.ds(row, 1), :]
        rz = tz_ref[pl.ds(row, 1), :]
        off = off_ref[j]
        sums, cnt = bf._cell_terms(
            qx_ref[j], qy_ref[j], qz_ref[j], rx, ry, rz, off, radius, k
        )  # (T, N_SUMS_PAD), (T, 1)
        out_ref[j : j + 1, :, :] += sums.reshape(1, t, N_SUMS_PAD)
        off_ref[j] = off + cnt


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

    qspec = pl.BlockSpec((GPB, t, 1), lambda g, o, rows: (g, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngp // GPB, 27),
        in_specs=[
            qspec, qspec, qspec,
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (GPB, t, N_SUMS_PAD), lambda g, o, rows: (g, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((GPB, t, 1), jnp.float32)],
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
                tz_ref, out_ref, off_ref, *, radius: float, k: int, t: int,
                dims: tuple):
    gb = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _init():
        off_ref[...] = jnp.zeros(off_ref.shape, off_ref.dtype)

    for j in range(GPB_BWD):
        g = gb * GPB_BWD + j
        row = _cell_row(rows_ref, g, o, dims)
        rx = tx_ref[pl.ds(row, 1), :]
        ry = ty_ref[pl.ds(row, 1), :]
        rz = tz_ref[pl.ds(row, 1), :]
        qx, qy, qz = qx_ref[j], qy_ref[j], qz_ref[j]
        off = off_ref[j]
        cot = cot_ref[j]  # (T, N_SUMS_PAD); pad-column cotangents are inert

        def f(a, b, c):
            return bf._cell_terms(qx, qy, qz, a, b, c, off, radius, k)

        (_sums, cnt), vjp = jax.vjp(f, rx, ry, rz)
        da, db, dc = vjp((cot, jnp.zeros_like(cnt)))  # 3 x (1, cap)
        cap = da.shape[-1]
        out_ref[j : j + 1, 0:1, :, :] = jnp.concatenate(
            [da, db, dc], axis=0
        ).reshape(1, 1, 3, cap)
        off_ref[j] = off + cnt


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

    qspec = pl.BlockSpec((GPB_BWD, t, 1), lambda g, o, rows: (g, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngp // GPB_BWD, 27),
        in_specs=[
            qspec, qspec, qspec,
            pl.BlockSpec((GPB_BWD, t, N_SUMS_PAD), lambda g, o, rows: (g, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (GPB_BWD, 1, 3, cap), lambda g, o, rows: (g, o, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((GPB_BWD, t, 1), jnp.float32)],
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

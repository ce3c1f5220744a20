"""Scatter-free segment reductions and gathers with TPU-friendly adjoints.

XLA:TPU lowers scatter-add to a serialized update loop, which makes the
*backward pass of every neighbor gather* (millions of (ray-sample, particle)
pair gradients accumulating into the particle array) catastrophically slow —
measured ~90 s for one transition-model backward at watercube scale.

`segment_sum_sorted` computes the same reduction with only TPU-fast
primitives: sort the (id, value) pairs, exclusive-cumsum the values, and read
per-segment sums as differences at segment boundaries found by searchsorted.
`take_rows` is a gather whose custom VJP routes the adjoint through that
reduction instead of XLA scatter.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp


def segment_sum_sorted(values: jax.Array, segment_ids: jax.Array, num_segments: int):
    """sum_i values[i] into out[segment_ids[i]], without scatter.

    values: (M,) or (M, C); segment_ids: (M,) int32 in [0, num_segments)
    (out-of-range ids are dropped). Returns (num_segments, [C]).
    """
    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    m, c = values.shape

    ids = segment_ids.astype(jnp.int32)
    # drop invalid ids by mapping them to a trash segment
    valid = (ids >= 0) & (ids < num_segments)
    ids = jnp.where(valid, ids, num_segments)
    values = jnp.where(valid[:, None], values, 0.0)

    # f32 sort keys: int32 sorts take a ~30x slower TPU path; ids < 2^24
    # are exact in f32. One variadic sort returns keys + order together.
    ids_sorted, order = jax.lax.sort(
        (ids.astype(jnp.float32), jnp.arange(m, dtype=jnp.int32)),
        dimension=0, num_keys=1,
    )
    vals_sorted = values[order]

    csum = jnp.cumsum(vals_sorted.astype(jnp.float32), axis=0)
    csum = jnp.concatenate([jnp.zeros((1, c), csum.dtype), csum], axis=0)  # (M+1, C)
    # segment n occupies [start_n, start_{n+1}) in the sorted order
    starts = jnp.searchsorted(ids_sorted,
                              jnp.arange(num_segments + 1, dtype=jnp.float32),
                              side="left")
    out = csum[starts[1:]] - csum[starts[:-1]]
    out = out.astype(values.dtype)
    return out[:, 0] if squeeze else out


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table (N, C) gathered at idx (...,) -> (..., C).

    Forward is a plain row gather; backward accumulates cotangents into the
    table via the sort-based segment sum (never XLA scatter).
    """
    return table[idx]


def _take_rows_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _take_rows_bwd(res, g):
    idx, n = res
    flat_ids = idx.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    d_table = segment_sum_sorted(flat_g, flat_ids, n)
    return d_table, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


class AdjointPlan(NamedTuple):
    """Precomputed sort plan for the scatter-free gather adjoint.

    The argsort of the segment ids dominates the backward cost of every
    neighbor gather. All gathers from the SAME NeighborList share the same
    ids, so the plan (sorted order + segment starts) is computed ONCE in the
    forward pass (under stop_gradient) and reused by every adjoint — e.g.
    the transition model's 4 conv layers used to pay 5 backward sorts per
    step for one fluid neighbor list.

    order:  (M,) int32 — argsort of the (flattened, sanitized) segment ids.
    starts: (num_segments + 1,) int32 — per-segment start offsets.
    n:      number of segments (table rows).
    """

    order: jax.Array
    starts: jax.Array
    n: int


def adjoint_plan(idx: jax.Array, n: int) -> AdjointPlan:
    """Build the shared backward-sort plan for gathers at `idx` into an
    (n, ...) table. Invalid ids (< 0 or >= n) land in a trash segment."""
    ids = jax.lax.stop_gradient(idx).reshape(-1).astype(jnp.int32)
    valid = (ids >= 0) & (ids < n)
    ids = jnp.where(valid, ids, n)
    # ONE variadic sort yields both the sorted keys and the order — argsort
    # followed by ids[order] would re-gather the 1.8M-element id array
    # (~14 ms/step at the watercube working point). f32 keys: fast TPU sort
    # path, ids < 2^24 exact.
    ids_sorted, order = jax.lax.sort(
        (ids.astype(jnp.float32), jnp.arange(ids.shape[0], dtype=jnp.int32)),
        dimension=0, num_keys=1,
    )
    starts = jnp.searchsorted(
        ids_sorted, jnp.arange(n + 1, dtype=jnp.float32), side="left"
    ).astype(jnp.int32)
    return AdjointPlan(order, starts, n)


def _segment_sum_planned(flat_vals: jax.Array, order, starts) -> jax.Array:
    """(M, C) cotangents -> (n, C) sums using a precomputed plan (no sort)."""
    vals_sorted = flat_vals[order].astype(jnp.float32)
    csum = jnp.cumsum(vals_sorted, axis=0)
    csum = jnp.concatenate(
        [jnp.zeros((1,) + csum.shape[1:], csum.dtype), csum], axis=0
    )
    out = csum[starts[1:]] - csum[starts[:-1]]
    return out.astype(flat_vals.dtype)


# --- Pallas natural-order accumulate (no permutation, no cumsum) ------------
#
# The plan-based adjoint above is dominated by `flat_vals[order]`: a random
# ROW PERMUTATION of the (M, C) cotangent array. On v5e that gather is
# descriptor-bound (~27 ms for M=917k, C=96 — ~30 ns per row regardless of
# width), and the (M, C) f32 cumsum behind it streams another 2x the array.
# The whole reduction output is only (n, C) ~ 5.5 MB at transition scale —
# it FITS IN VMEM. So instead of permuting M rows through HBM, stream the
# cotangents in NATURAL order (contiguous, full-bandwidth reads) and
# accumulate each row into a VMEM-resident table at its target id.
#
# The serial hazard (consecutive slots hitting the same row) is broken by
# S independent accumulator streams — slot j goes to stream j % S, streams
# only merge once at the end — so the per-slot read-modify-write chains
# pipeline across streams.

_SEGSUM_STREAMS = 8
_SEGSUM_BLOCK = 4096


def _segsum_kernel(idx_ref, vals_ref, acc_ref, *, block: int, streams: int):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(i, carry):
        for s in range(streams):
            j = i * streams + s
            t = idx_ref[j]
            row = vals_ref[pl.ds(j, 1), :]
            acc_ref[s, pl.ds(t, 1), :] = acc_ref[s, pl.ds(t, 1), :] + row
        return carry

    jax.lax.fori_loop(0, block // streams, body, 0)


def segment_sum_accumulate(flat_vals: jax.Array, idx: jax.Array, n: int,
                           block: int = _SEGSUM_BLOCK,
                           streams: int = _SEGSUM_STREAMS,
                           interpret: bool | None = None) -> jax.Array:
    """sum_i flat_vals[i] into out[idx[i]] via a VMEM-accumulating Pallas
    kernel. idx in [0, n]; row n is a trash row (dropped). Returns (n, C).

    Use when n*C is small enough to keep `streams` accumulator copies in
    VMEM (streams * (n+1) * C * 4 bytes; ~44 MB at transition scale)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block % streams:
        # the kernel's fori_loop covers exactly streams * (block // streams)
        # slots per block — a non-divisible block would silently skip the tail
        raise ValueError(f"block ({block}) must be divisible by streams "
                         f"({streams})")
    m, c = flat_vals.shape
    mp = -(-m // block) * block
    vals = jnp.pad(flat_vals.astype(jnp.float32), ((0, mp - m), (0, 0)))
    ids = jnp.pad(idx.astype(jnp.int32), (0, mp - m), constant_values=n)
    acc = pl.pallas_call(
        functools.partial(_segsum_kernel, block=block, streams=streams),
        grid=(mp // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,),
                         memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec((block, c), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((streams, n + 1, c), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((streams, n + 1, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(ids, vals)
    return jnp.sum(acc, axis=0)[:n].astype(flat_vals.dtype)


def _segsum_fits_vmem(n: int, c: int, streams: int = _SEGSUM_STREAMS) -> bool:
    """VMEM tiles pad the lane (minor) dim to 128: budget with the padded c."""
    padded_c = -(-c // 128) * 128
    return streams * (n + 1) * padded_c * 4 <= 100 * 1024 * 1024


def _use_pallas_segsum() -> bool:
    return os.environ.get("NF_SEGSUM_PALLAS", "0") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_rows_planned(table: jax.Array, idx: jax.Array, order, starts):
    """`take_rows` whose adjoint reuses a shared AdjointPlan's (order, starts)
    — no re-sort in the backward.

    idx MUST be indices the plan was built from (adjoint_plan routed
    out-of-range ids to the trash segment at build time)."""
    return table[idx]


def _take_rows_planned_fwd(table, idx, order, starts):
    return table[idx], (idx, order, starts)


def _take_rows_planned_bwd(res, g):
    idx, order, starts = res
    flat_g = g.reshape(-1, g.shape[-1])
    n = starts.shape[0] - 1
    if _use_pallas_segsum() and _segsum_fits_vmem(n, flat_g.shape[-1]):
        # natural-order VMEM accumulate: skips the descriptor-bound (M, C)
        # permutation gather AND the (M, C) cumsum of the plan-based path.
        # route out-of-range ids to the trash row exactly as adjoint_plan did
        flat_ids = idx.reshape(-1).astype(jnp.int32)
        flat_ids = jnp.where((flat_ids < 0) | (flat_ids >= n), n, flat_ids)
        d_table = segment_sum_accumulate(flat_g, flat_ids, n)
    else:
        d_table = _segment_sum_planned(flat_g, order, starts)
    return d_table, None, None, None


take_rows_planned.defvjp(_take_rows_planned_fwd, _take_rows_planned_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_columns3_planned(table: jax.Array, idx: jax.Array, order, starts):
    """`take_columns3` with a shared AdjointPlan adjoint (no re-sort)."""
    return tuple(table[..., ax][idx] for ax in range(3))


def _take_columns3_planned_fwd(table, idx, order, starts):
    return take_columns3_planned(table, idx, order, starts), (idx, order, starts)


def _take_columns3_planned_bwd(res, g):
    idx, order, starts = res
    cots = jnp.stack([gi.reshape(-1) for gi in g], axis=-1)  # (M, 3)
    d_table = _segment_sum_planned(cots, order, starts)
    return d_table, None, None, None


take_columns3_planned.defvjp(_take_columns3_planned_fwd, _take_columns3_planned_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gather3_values(table, idx, vx, vy, vz, order, starts):
    """Differentiable alias of (table[:, 0][idx], table[:, 1][idx],
    table[:, 2][idx]) whose FORWARD is free.

    The neighbor search already holds the selected candidates' coordinates
    when it picks them (NeighborList.xyz), so re-gathering them from the
    point table is pure waste — and a (N,) scalar gather is one of the
    slowest ops on TPU (~140M elem/s). This op returns the precomputed
    values verbatim and defines the backward as the plan-based segment-sum
    of the cotangents into `table` — mathematically identical to
    differentiating the gather, with zero forward cost.

    Caller contract: (vx, vy, vz) == table[idx].T at every slot whose
    cotangent can be nonzero (masked slots may hold arbitrary finite values),
    and (order, starts) is the AdjointPlan of `idx` into `table`.
    """
    del table, idx, order, starts
    return vx, vy, vz


def _gather3_values_fwd(table, idx, vx, vy, vz, order, starts):
    return (vx, vy, vz), (order, starts)


def _gather3_values_bwd(res, g):
    order, starts = res
    cots = jnp.stack([gi.reshape(-1) for gi in g], axis=-1)  # (M, 3)
    d_table = _segment_sum_planned(cots, order, starts)
    return d_table, None, None, None, None, None, None


gather3_values.defvjp(_gather3_values_fwd, _gather3_values_bwd)


def segment_sum_sorted_multi(values: list, segment_ids: jax.Array, num_segments: int):
    """Segment-sum several same-shaped (M,) value arrays with ONE shared sort.

    The argsort of the ids dominates the cost of the sort-based reduction;
    batching payload columns amortizes it.
    """
    ids = segment_ids.astype(jnp.int32)
    valid = (ids >= 0) & (ids < num_segments)
    ids = jnp.where(valid, ids, num_segments)
    ids_sorted, order = jax.lax.sort(  # f32 keys: fast TPU sort path
        (ids.astype(jnp.float32), jnp.arange(ids.shape[0], dtype=jnp.int32)),
        dimension=0, num_keys=1,
    )
    starts = jnp.searchsorted(
        ids_sorted, jnp.arange(num_segments + 1, dtype=jnp.float32), side="left"
    )
    outs = []
    for v in values:
        vs = jnp.where(valid, v, 0.0)[order].astype(jnp.float32)
        csum = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(vs)])
        outs.append((csum[starts[1:]] - csum[starts[:-1]]).astype(v.dtype))
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_columns3(table: jax.Array, idx: jax.Array):
    """table (N, 3) gathered per-coordinate at idx (...) -> 3 arrays (...).

    Forward stays coordinate-wise (a (..., 3) row gather would pad the minor
    dim 3 -> 128 lanes on TPU); backward runs ONE shared sort for all three
    coordinate cotangents.
    """
    return tuple(table[..., ax][idx] for ax in range(3))


def _take_columns3_fwd(table, idx):
    return take_columns3(table, idx), (idx, table.shape[0])


def _take_columns3_bwd(res, g):
    idx, n = res
    flat = idx.reshape(-1)
    sums = segment_sum_sorted_multi([gi.reshape(-1) for gi in g], flat, n)
    return jnp.stack(sums, axis=-1), None


take_columns3.defvjp(_take_columns3_fwd, _take_columns3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_column(column: jax.Array, idx: jax.Array) -> jax.Array:
    """column (N,) gathered at idx (...) -> (...). Scatter-free adjoint."""
    return column[idx]


def _take_column_fwd(column, idx):
    return column[idx], (idx, column.shape[0])


def _take_column_bwd(res, g):
    idx, n = res
    d = segment_sum_sorted(g.reshape(-1), idx.reshape(-1), n)
    return d, None


take_column.defvjp(_take_column_fwd, _take_column_bwd)

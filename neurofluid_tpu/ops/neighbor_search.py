"""Fixed-radius neighbor search with static shapes (the keystone kernel).

The reference offloads this to two CUDA libraries:

- pytorch3d `ball_query` for the renderer (reference models/renderer.py:13,
  112-122): for each ray-sample point, up to K=20 neighbors within a fixed
  radius, chosen as the *first K in particle-index order*, returning
  **squared** distances zero-padded and indices padded with -1.
- Open3D-ML `fixed_radius_search` inside ContinuousConv (reference
  models/transmodel.py:80-98): *all* neighbors within radius, CSR layout,
  optionally ignoring query points that coincide with input points
  (`radius_search_ignore_query_points=True`).

On TPU everything must be static-shape, so both consumers share one API that
returns fixed-K padded neighbor lists plus the *true* (uncapped) neighbor
count. Overflow policy is principled: with `order="nearest"` the K nearest
in-radius neighbors are kept (never silently dropping near neighbors); with
`order="index"` the first K by point index are kept, which is bit-faithful to
pytorch3d's semantics for the renderer.

Backends:
- "brute": tiled O(Q*N) distance matrix via one MXU matmul per query chunk +
  top-k selection. Exact; preferred for N up to ~20k where the N^2 trick is
  genuinely competitive on TPU.
- "grid": sort-based spatial cell list (`build_cell_grid` +
  `radius_search_grid`): candidates gathered from 27 neighboring cells only.
  Used when N is large or Q >> N.

All outputs are differentiable *downstream* (gather + arithmetic); the
neighbor index selection itself is discrete, exactly as in the CUDA reference.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_INT32_MAX = jnp.iinfo(jnp.int32).max


class NeighborList(NamedTuple):
    """Fixed-K padded neighborhood.

    idx:      (Q, K) int32 point indices, -1 where no neighbor.
    sq_dists: (Q, K) float squared distances, 0 where no neighbor
              (pytorch3d ball_query zero-padding convention).
    mask:     (Q, K) bool validity mask.
    count:    (Q,)   int32 TRUE number of in-radius neighbors (may exceed K);
              this feeds `num_fluid_neighbors` in the transition-model loss
              (reference models/transmodel.py:133-138).
    xyz:      optional tuple of 3 (Q, K) arrays — the selected neighbors'
              coordinates as STOP-GRADIENT values, extracted during selection
              (`emit_xyz=True`). Consumers wrap them in
              `segment_ops.gather3_values` to make them differentiable w.r.t.
              the point table without paying a forward gather. MEASURED
              TRADE-OFF (v5e, round 2): the in-selection `take_along_axis`
              extraction from the (Q, candidates) arrays runs ~55M elem/s and
              cost ~245 ms/step at the bench working point — MORE than the
              (Q, K) row gather from the point table it avoids (~31 ms for
              the fine pass). Emission is therefore OFF by default; consumers
              gather rows by index instead. Arbitrary finite values at
              masked slots when present.
    """

    idx: jax.Array
    sq_dists: jax.Array
    mask: jax.Array
    count: jax.Array
    xyz: tuple | None = None


def gather_neighbor_positions(points: jax.Array, neighbors: NeighborList) -> jax.Array:
    """Gather neighbor xyz, zeros at padded slots.

    Matches pytorch3d's `masked_gather` (reference models/renderer.py:63-77):
    padded neighbors read as the origin. The renderer's smoothing feature
    intentionally inherits that artifact, so padding MUST be exactly 0.
    """
    safe_idx = jnp.maximum(neighbors.idx, 0)
    gathered = points[safe_idx]
    return jnp.where(neighbors.mask[..., None], gathered, 0.0)


def _chunk_pad(queries: jax.Array, chunk: int):
    q = queries.shape[0]
    n_chunks = max(1, -(-q // chunk))
    pad = n_chunks * chunk - q
    padded = jnp.pad(queries, ((0, pad), (0, 0)))
    return padded.reshape(n_chunks, chunk, queries.shape[-1]), pad


def _select_from_candidates(
    d2: jax.Array,
    cand_idx: jax.Array,
    within: jax.Array,
    k: int,
    order: str,
    selection: str = "sort",
    cand_xyz: tuple | None = None,
):
    """Select up to k in-radius candidates per query row.

    d2, within: (C, M); cand_idx: (C, M) global point ids (or -1 for invalid).
    Returns idx (C,k) int32 (-1 pad), sq (C,k) (0 pad), mask (C,k), and —
    when `cand_xyz` (3 arrays (C, M)) is given — the selected coordinates as
    3 (C, k) arrays (arbitrary finite values at invalid slots).

    selection='sort' is exact (lax.top_k, which lowers to a full variadic
    sort over M on TPU — the dominant cost of large searches).
    selection='approx' uses the TPU PartialReduce op (lax.approx_max_k,
    recall ~0.95); it may rarely swap/miss a neighbor when many candidates
    compete, which only perturbs renderer features — counts and masks are
    computed exactly from `within` regardless of selection.
    """
    m = d2.shape[-1]
    if m < k:
        # fewer candidates than slots: pad the candidate axis
        pad = k - m
        d2 = jnp.pad(d2, ((0, 0), (0, pad)))
        within = jnp.pad(within, ((0, 0), (0, pad)))
        cand_idx = jnp.pad(cand_idx, ((0, 0), (0, pad)), constant_values=_INT32_MAX - 1)
        if cand_xyz is not None:
            cand_xyz = tuple(jnp.pad(c, ((0, 0), (0, pad))) for c in cand_xyz)

    if order == "index":
        # first-K by (global) point index: top-k of negated index. Scores are
        # FLOAT on purpose: int32 top_k takes a slow sort path on TPU (~30x
        # slower); point counts < 2^24 are exact in f32.
        score = jnp.where(within, -cand_idx.astype(jnp.float32), -jnp.inf)
    elif order == "nearest":
        score = jnp.where(within, -d2.astype(jnp.float32), -jnp.inf)
    else:
        raise ValueError(f"unknown order: {order}")

    if selection == "approx":
        top, pos = jax.lax.approx_max_k(score, k, recall_target=0.95)
    else:
        top, pos = jax.lax.top_k(score, k)
    valid = jnp.isfinite(top)
    pos = jnp.clip(pos, 0, score.shape[-1] - 1)
    if order == "index":
        idx = jnp.where(valid, (-top).astype(jnp.int32), -1)
    else:
        idx = jnp.where(valid, jnp.take_along_axis(cand_idx, pos, axis=-1), -1)
    sq = jnp.take_along_axis(d2, pos, axis=-1)
    sq = jnp.where(valid, sq, 0.0)
    sel_xyz = None
    if cand_xyz is not None:
        sel_xyz = tuple(jnp.take_along_axis(c, pos, axis=-1) for c in cand_xyz)
    return idx.astype(jnp.int32), sq, valid, sel_xyz


def _brute_chunk(
    q_chunk: jax.Array,
    points: jax.Array,
    radius: float,
    k: int,
    order: str,
    inclusive: bool,
    exclude_self: bool,
    selection: str = "sort",
    emit_xyz: bool = False,
):
    # Coordinate-wise (q - p)^2 accumulation. Two reasons for this shape:
    # (a) TPU pads the minor dimension to 128 lanes, so any (C, N, 3) array
    #     would cost 42x its logical size in HBM — all intermediates here are
    #     (C, N);
    # (b) unlike the |q|^2+|p|^2-2qp matmul trick it is EXACTLY zero for
    #     coincident points, which the `exclude_self` semantics (Open3D
    #     radius_search_ignore_query_points) depend on.
    d2 = jnp.zeros((q_chunk.shape[0], points.shape[0]), q_chunk.dtype)
    for ax in range(3):
        diff = q_chunk[:, ax, None] - points[None, :, ax]
        d2 = d2 + diff * diff
    r2 = jnp.asarray(radius, d2.dtype) ** 2
    within = (d2 <= r2) if inclusive else (d2 < r2)
    if exclude_self:
        within = within & (d2 > 0.0)
    count = jnp.sum(within, axis=-1).astype(jnp.int32)
    n = points.shape[0]
    cand_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], d2.shape
    )
    cand_xyz = None
    if emit_xyz:
        cand_xyz = tuple(
            jnp.broadcast_to(points[None, :, ax], d2.shape) for ax in range(3)
        )
    idx, sq, mask, sel_xyz = _select_from_candidates(
        d2, cand_idx, within, k, order, selection, cand_xyz=cand_xyz
    )
    return idx, sq, mask, count, sel_xyz


def _recompute_sq_dists(queries, points, idx, mask, xyz=None):
    """Differentiable squared distances of the selected pairs.

    The search itself runs under stop_gradient (its giant Q x candidates
    intermediates must never become autodiff residuals); gradients w.r.t.
    positions flow through THIS recomputation instead — identical values,
    identical gradients, tiny memory. Padding stays exactly 0 (pytorch3d
    convention the renderer's masks depend on).

    With `xyz` (the search's selected coordinates), the forward gather is
    skipped entirely (segment_ops.gather3_values).
    """
    from neurofluid_tpu.ops import segment_ops

    safe = jnp.maximum(idx, 0)
    if xyz is not None:
        plan = segment_ops.adjoint_plan(safe, points.shape[0])
        nb = segment_ops.gather3_values(
            points, safe, *xyz, plan.order, plan.starts
        )
    else:
        # coordinate-wise (Q, K) intermediates (TPU lane padding); one shared
        # backward sort for all three coordinates
        nb = segment_ops.take_columns3(points, safe)
    sq = jnp.zeros(idx.shape, queries.dtype)
    for ax in range(3):
        diff = nb[ax] - queries[:, ax, None]
        sq = sq + diff * diff
    return jnp.where(mask, sq, 0.0)


def radius_search_brute(
    queries: jax.Array,
    points: jax.Array,
    radius: float,
    k: int,
    order: str = "nearest",
    inclusive: bool = True,
    exclude_self: bool = False,
    query_chunk: int = 4096,
    selection: str = "sort",
    emit_xyz: bool = False,
) -> NeighborList:
    """Exact fixed-radius search by tiled brute force.

    queries (Q, 3), points (N, 3) -> NeighborList with K=k. See module
    docstring for `order` semantics.
    """
    queries_ng = jax.lax.stop_gradient(queries)
    points_ng = jax.lax.stop_gradient(points)
    q = queries.shape[0]
    chunk = min(query_chunk, max(q, 1))
    chunks, pad = _chunk_pad(queries_ng, chunk)

    fn = functools.partial(
        _brute_chunk,
        points=points_ng,
        radius=radius,
        k=k,
        order=order,
        inclusive=inclusive,
        exclude_self=exclude_self,
        selection=selection,
        emit_xyz=emit_xyz,
    )
    if chunks.shape[0] == 1:
        idx, _sq, mask, count, xyz = fn(chunks[0])
    else:
        idx, _sq, mask, count, xyz = jax.lax.map(fn, chunks)
        idx = idx.reshape(-1, k)
        mask = mask.reshape(-1, k)
        count = count.reshape(-1)
        if xyz is not None:
            xyz = tuple(c.reshape(-1, k) for c in xyz)
    if pad:
        idx, mask, count = idx[:q], mask[:q], count[:q]
        if xyz is not None:
            xyz = tuple(c[:q] for c in xyz)
    sq = _recompute_sq_dists(queries, points, idx, mask, xyz=xyz)
    return NeighborList(idx, sq, mask, count, xyz)


# ---------------------------------------------------------------------------
# Sort-based spatial cell grid backend
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class CellGrid:
    """Dense per-cell tables over a fixed bounding box.

    TPU rationale: candidate lookup must be expressible as ROW gathers (wide
    contiguous rows ride the DMA path) — per-element gathers from (N,) arrays
    run ~140M elem/s on the scalar path and dominated the whole pipeline.
    Each cell owns `cap` padded slots; row `num_cells` is an all-empty
    sentinel for out-of-grid lookups.

    table_x/y/z: (num_cells + 1, cap) f32 coordinates, 0 at empty slots.
    table_idx:   (num_cells + 1, cap) i32 original point index, -1 at empty.
    overflow:    bool scalar — some cell had more than `cap` points (the tail
                 was dropped; rebuild with a larger cap).

    Registered as a pytree with (dims, cap, cell_size) as STATIC aux data so
    a prebuilt grid can cross jit boundaries — e.g. the e2e step receives the
    static boundary-particle grid built once per scene instead of rebuilding
    it every step (the box never moves; reference models/transmodel.py treats
    box particles as constant inputs too).
    """

    def __init__(self, table_x, table_y, table_z, table_idx, dims, cap,
                 origin, cell_size, overflow, points_original):
        self.table_x = table_x
        self.table_y = table_y
        self.table_z = table_z
        self.table_idx = table_idx
        self.dims = dims
        self.cap = cap
        self.origin = origin
        self.cell_size = cell_size
        self.overflow = overflow
        self.points_original = points_original  # unsorted (diff handle)

    def tree_flatten(self):
        children = (
            self.table_x, self.table_y, self.table_z, self.table_idx,
            self.origin, self.overflow, self.points_original,
        )
        return children, (self.dims, self.cap, self.cell_size)

    @classmethod
    def tree_unflatten(cls, aux, children):
        tx, ty, tz, ti, origin, overflow, points = children
        dims, cap, cell_size = aux
        return cls(tx, ty, tz, ti, dims, cap, origin, cell_size, overflow, points)


def build_cell_grid(
    points: jax.Array,
    lower: tuple,
    upper: tuple,
    cell_size: float,
    max_per_cell: int = 64,
    valid: jax.Array | None = None,
) -> CellGrid:
    """Build dense cell tables. Points outside [lower, upper] are clamped to
    border cells (they still participate in search; the box covers the fluid
    container so out-of-box particles are rare transients).

    `valid` (N,) bool, optional: points marked False are EXCLUDED from the
    tables entirely (used for masked halo slots in the sharded transition
    model — sentinel positions must not pollute border-cell capacity).

    Construction is scatter-free: points are argsorted by cell id and the
    padded tables are filled by a (num_cells * cap)-sized gather.
    """
    # grid geometry must be static (shapes depend on it): lower/upper are
    # host tuples, converted to arrays only after dims are fixed
    dims = tuple(
        int(max(1, math.ceil((float(u) - float(l)) / cell_size)))
        for l, u in zip(lower, upper)
    )
    lower = jnp.asarray(lower, points.dtype)
    points_ng = jax.lax.stop_gradient(points)
    n = points.shape[0]
    cap = max_per_cell
    cell = jnp.clip(
        jnp.floor((points_ng - lower) / cell_size).astype(jnp.int32),
        0,
        jnp.asarray(dims, jnp.int32) - 1,
    )
    cell_id = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    if valid is not None:
        # invalid points sort past every real cell and are never densified
        num_cells_ = dims[0] * dims[1] * dims[2]
        cell_id = jnp.where(jax.lax.stop_gradient(valid), cell_id, num_cells_)
    # f32 sort keys (fast TPU sort path); cell ids < 2^24 are exact in f32.
    # One variadic sort returns (sorted ids, order) — no post-sort gather.
    sorted_cell_id, order = jax.lax.sort(
        (cell_id.astype(jnp.float32), jnp.arange(n, dtype=jnp.int32)),
        dimension=0, num_keys=1,
    )
    num_cells = dims[0] * dims[1] * dims[2]
    starts = jnp.searchsorted(
        sorted_cell_id, jnp.arange(num_cells + 1, dtype=jnp.float32), side="left"
    ).astype(jnp.int32)
    overflow = jnp.max(starts[1:] - starts[:-1]) > cap

    # densify: slot (c, r) reads sorted position starts[c] + r when in range.
    # ONE row gather of a packed (N, 4) [x, y, z, original-id] table — four
    # per-column (N,) scalar gathers here ran at ~140 M elem/s and made the
    # grid BUILD cost ~42 ms at the 14k/12k-cell transition working point
    # (measured round 4, tools/fused_query_microbench.py) — 2 builds/step =
    # the largest single slice of the transition train step. Row gathers
    # ride the DMA path; ids < 2^24 are exact in f32.
    src = starts[:-1, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    valid = src < starts[1:, None]  # (num_cells, cap)
    src_c = jnp.clip(src, 0, n - 1)
    packed_sorted = jnp.concatenate(
        [points_ng[order], order.astype(jnp.float32)[:, None]], axis=1
    )  # (N, 4)
    rows = packed_sorted[src_c.reshape(-1)].reshape(num_cells, cap, 4)
    ids = jnp.where(valid, rows[..., 3].astype(jnp.int32), -1)

    def densify(coord):
        t = jnp.where(valid, coord, 0.0)
        return jnp.concatenate([t, jnp.zeros((1, cap), t.dtype)], axis=0)

    table_x = densify(rows[..., 0])
    table_y = densify(rows[..., 1])
    table_z = densify(rows[..., 2])
    table_idx = jnp.concatenate(
        [ids, jnp.full((1, cap), -1, jnp.int32)], axis=0
    )
    return CellGrid(
        table_x, table_y, table_z, table_idx,
        dims, cap, lower, cell_size, overflow, points,
    )


def _grid_chunk(
    q_chunk: jax.Array,
    grid: CellGrid,
    radius: float,
    k: int,
    order: str,
    inclusive: bool,
    exclude_self: bool,
    selection: str = "sort",
    emit_xyz: bool = False,
):
    dims = grid.dims
    cap = grid.cap
    reach = max(1, int(math.ceil(radius / grid.cell_size)))
    num_cells = dims[0] * dims[1] * dims[2]
    cell = jnp.floor((q_chunk - grid.origin) / grid.cell_size).astype(jnp.int32)

    offsets = jnp.stack(
        jnp.meshgrid(
            *([jnp.arange(-reach, reach + 1, dtype=jnp.int32)] * 3), indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 3)  # (O, 3)

    ncell = cell[:, None, :] + offsets[None, :, :]  # (C, O, 3)
    in_grid = jnp.all(
        (ncell >= 0) & (ncell < jnp.asarray(dims, jnp.int32)), axis=-1
    )  # (C, O)
    ncell_id = (ncell[..., 0] * dims[1] + ncell[..., 1]) * dims[2] + ncell[..., 2]
    # out-of-grid lookups read the all-empty sentinel row
    ncell_id = jnp.where(in_grid, ncell_id, num_cells)

    C = q_chunk.shape[0]
    m_total = offsets.shape[0] * cap
    # row gathers (width = cap) — the TPU-fast path
    cand_idx = grid.table_idx[ncell_id].reshape(C, m_total)
    d2 = jnp.zeros((C, m_total), q_chunk.dtype)
    cand_xyz = []
    for ax, table in ((0, grid.table_x), (1, grid.table_y), (2, grid.table_z)):
        coord = table[ncell_id].reshape(C, m_total)
        diff = coord - q_chunk[:, ax, None]
        d2 = d2 + diff * diff
        cand_xyz.append(coord)

    slot_valid = cand_idx >= 0
    r2 = jnp.asarray(radius, d2.dtype) ** 2
    within = ((d2 <= r2) if inclusive else (d2 < r2)) & slot_valid
    if exclude_self:
        within = within & (d2 > 0.0)
    count = jnp.sum(within, axis=-1).astype(jnp.int32)
    idx, sq, mask, sel_xyz = _select_from_candidates(
        d2, cand_idx, within, k, order, selection,
        cand_xyz=tuple(cand_xyz) if emit_xyz else None,
    )
    return idx, sq, mask, count, sel_xyz


def radius_search_grid(
    queries: jax.Array,
    grid: CellGrid,
    radius: float,
    k: int,
    order: str = "nearest",
    inclusive: bool = True,
    exclude_self: bool = False,
    query_chunk: int = 4096,
    max_per_cell: int | None = None,  # kept for API compat; cap is set at build
    selection: str = "sort",
    emit_xyz: bool = False,
) -> tuple[NeighborList, jax.Array]:
    """Fixed-radius search against a prebuilt `CellGrid`.

    Returns (NeighborList, overflow_flag). `overflow_flag` is True if any cell
    held more than the build-time `max_per_cell`, in which case tail
    candidates were dropped and the caller should rebuild with a larger cap
    (the principled overflow policy demanded by static shapes).
    """
    q = queries.shape[0]
    queries_ng = jax.lax.stop_gradient(queries)
    chunk = min(query_chunk, max(q, 1))
    chunks, pad = _chunk_pad(queries_ng, chunk)
    fn = functools.partial(
        _grid_chunk,
        grid=grid,
        radius=radius,
        k=k,
        order=order,
        inclusive=inclusive,
        exclude_self=exclude_self,
        selection=selection,
        emit_xyz=emit_xyz,
    )
    if chunks.shape[0] == 1:
        idx, _sq, mask, count, xyz = fn(chunks[0])
    else:
        idx, _sq, mask, count, xyz = jax.lax.map(fn, chunks)
        idx = idx.reshape(-1, k)
        mask = mask.reshape(-1, k)
        count = count.reshape(-1)
        if xyz is not None:
            xyz = tuple(c.reshape(-1, k) for c in xyz)
    if pad:
        idx, mask, count = idx[:q], mask[:q], count[:q]
        if xyz is not None:
            xyz = tuple(c[:q] for c in xyz)
    # idx refers to ORIGINAL point order (table_idx stores original ids)
    sq = _recompute_sq_dists(queries, grid.points_original, idx, mask, xyz=xyz)
    return NeighborList(idx, sq, mask, count, xyz), grid.overflow


def radius_search_grid_culled(
    queries: jax.Array,
    grid: CellGrid,
    radius: float,
    k: int,
    capacity: int,
    order: str = "nearest",
    inclusive: bool = True,
    exclude_self: bool = False,
    query_chunk: int = 4096,
    selection: str = "sort",
    emit_xyz: bool = False,
) -> tuple[NeighborList, jax.Array]:
    """Grid search that skips provably-empty queries (outside the particle
    AABB inflated by `radius`).

    NeRF rays sample the full [near, far] interval (reference
    utils/ray_utils.py:232-256) but the fluid occupies a fraction of it, so
    a large share of ray samples cannot have any neighbor. Those are culled
    BEFORE the candidate/top-k work: queries are stably partitioned
    (inside-AABB first), only the first `capacity` slots are searched, and
    results are scattered back; culled queries get the exact empty result
    (count 0, idx -1, sq 0) they would have computed. Math-identical to the
    uncolled search whenever n_inside <= capacity; otherwise the overflow
    flag is raised (fail-loudly policy — never silent truncation).

    Returns (NeighborList, overflow_flag) like `radius_search_grid`.
    """
    q = queries.shape[0]
    capacity = int(min(max(capacity, 1), q))
    queries_ng = jax.lax.stop_gradient(queries)
    points_ng = jax.lax.stop_gradient(grid.points_original)

    lo = points_ng.min(axis=0) - radius
    hi = points_ng.max(axis=0) + radius
    inside = jnp.all((queries_ng >= lo) & (queries_ng <= hi), axis=-1)  # (Q,)
    n_inside = jnp.sum(inside.astype(jnp.int32))
    cull_overflow = n_inside > capacity

    # stable partition: inside-queries first (f32 keys — int/bool sorts take
    # a much slower TPU path)
    part = jnp.argsort(jnp.where(inside, 0.0, 1.0)).astype(jnp.int32)
    sel = part[:capacity]
    compact = queries_ng[sel]

    result, grid_overflow = radius_search_grid(
        compact, grid, radius, k,
        order=order, inclusive=inclusive, exclude_self=exclude_self,
        query_chunk=query_chunk, selection=selection, emit_xyz=emit_xyz,
    )

    # scatter back by inverse permutation (gather formulation; f32 argsort)
    rank = jnp.argsort(part.astype(jnp.float32)).astype(jnp.int32)  # (Q,)
    in_compact = (rank < capacity) & inside
    safe_rank = jnp.minimum(rank, capacity - 1)
    idx = jnp.where(in_compact[:, None], result.idx[safe_rank], -1)
    mask = jnp.where(in_compact[:, None], result.mask[safe_rank], False)
    count = jnp.where(in_compact, result.count[safe_rank], 0)
    xyz = None
    if result.xyz is not None:
        xyz = tuple(
            jnp.where(in_compact[:, None], c[safe_rank], 0.0) for c in result.xyz
        )
    sq = _recompute_sq_dists(queries, grid.points_original, idx, mask, xyz=xyz)
    return (
        NeighborList(idx, sq, mask, count, xyz),
        jnp.logical_or(grid_overflow, cull_overflow),
    )


def radius_search(
    queries: jax.Array,
    points: jax.Array,
    radius: float,
    k: int,
    order: str = "nearest",
    inclusive: bool = True,
    exclude_self: bool = False,
    query_chunk: int = 4096,
) -> NeighborList:
    """Default entry point (brute backend). See `radius_search_brute`."""
    return radius_search_brute(
        queries,
        points,
        radius,
        k,
        order=order,
        inclusive=inclusive,
        exclude_self=exclude_self,
        query_chunk=query_chunk,
    )


def ball_query(
    queries: jax.Array,
    points: jax.Array,
    radius: float,
    k: int,
    query_chunk: int = 4096,
) -> NeighborList:
    """pytorch3d-compatible ball query (reference models/renderer.py:112-122).

    First-K-by-index semantics, strict `<` radius test, squared distances,
    zero/-1 padding — exactly what `RenderNet.search` consumed.
    """
    return radius_search_brute(
        queries,
        points,
        radius,
        k,
        order="index",
        inclusive=False,
        exclude_self=False,
        query_chunk=query_chunk,
    )

"""Fused compact ball query: cell-major neighbor-LIST construction on TPU.

The transition model's searches (ParticleNet._search, standing in for the
reference's Open3D `fixed_radius_search`, reference models/transmodel.py:80-98)
only feed ORDER-INSENSITIVE consumers: the continuous convolutions sum over
the neighborhood, and the loss weight uses the true count. The generic grid
search (ops/neighbor_search.radius_search_grid) nevertheless pays for ordered
selection: it streams (Q, 27*cap) candidate arrays through HBM, runs
`lax.top_k` over them (a full variadic sort on TPU), and extracts payloads
with `take_along_axis` (~55M elem/s on v5e) — together the dominant cost of a
ParticleNet step.

This op replaces that pipeline for order-insensitive consumers with ONE
forward-only Pallas kernel in the cell-major style of ops/pallas_features:
queries are sorted by cell and repacked into fixed-size one-cell groups
(ball_features.group_queries), each group walks its 27 candidate-table rows
(VMEM-resident), ranks in-radius candidates with the triangular matmul
(MXU, no sort), and scatters each selected candidate's payload (original
point id + coordinates) into its output slot with a one-hot compare +
lane-reduction (no take_along_axis, no HBM candidate arrays).

SELECTION SEMANTICS (same documented deviation as ops/ball_features): the
first k in-radius candidates in (neighbor-cell, in-cell-slot) order are
kept. Whenever count <= k — the engineered common case; caps are sized so
overflow is flagged, never silent — the selected SET equals any other
first-k rule's, and order-insensitive consumers are exactly invariant to
the permutation. `count` is always the true uncapped neighbor count.

GRADIENTS: none. Neighbor ids are discrete; the emitted coordinates are
stop-gradient copies (consumers re-derive differentiable quantities by
gathering from the point table, exactly as with the generic search — see
cconv_geometry's xyz path). That is what makes this kernel forward-only:
there is no backward kernel to write, compile, or pay for.

Backends: 'xla' (shares `_cell_compact` verbatim — correctness reference,
runs anywhere) and 'pallas' (TPU). 'auto' picks pallas on TPU.

TPU STATUS (round 3): experimental, not the production default. On a real
v5e the kernel at the ParticleNet working point (K=64, cap=32, group T=32)
exhausts VMEM: the grouping allocates one output row per PADDED group
(~12k groups for 14,336 queries over an 11.5k-cell grid), and Mosaic
stacks the (T, K, cap) one-hot scatter per group. Making this win needs
occupancy-compacted grouping (emit rows only for non-empty cells) and a
lane-reduction emission that never materializes the one-hot — follow-up
work; `ParticleNet.search_backend='grid'` remains the measured-fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurofluid_tpu.ops import ball_features as bf
from neurofluid_tpu.ops import neighbor_search as ns
from neurofluid_tpu.ops import pallas_features as pf

GPB = 1      # groups per program block. 4 put four groups' (T, K, cap)
             # one-hot scatter tensors on the Mosaic stack at once and ran
             # v5e VMEM out at the transition working point (K=64, cap=32)
UNROLL = 3   # 27-cell fori_loop partial unroll (see pallas_features)
_SENTINEL = bf._SENTINEL


def _cell_compact(qx, qy, qz, rx, ry, rz, ridx, off, radius: float, k: int,
                  exclude_self: bool):
    """ONE cell's contribution to the compact neighbor list.

    qx/qy/qz: (T, 1) query coordinates; rx/ry/rz: (1, cap) candidate
    coordinates (sentinel at invalid slots); ridx: (1, cap) f32 original
    point ids (< 2^24, exactly representable); off: (T, 1) running
    in-radius count over previously processed cells (selection budget).

    Returns (idx_k, x_k, y_k, z_k) each (T, K) — this cell's selected
    payloads scattered into their global slots (zero elsewhere) — plus
    cnt (T, 1), the cell's in-radius count. The caller accumulates the
    payload grids (slots are disjoint across cells by construction: slot
    = off + in-cell rank - 1 is strictly increasing along the cell walk)
    and advances off by cnt.

    Strictly 2-D/3-D last-two-tiled work; shared verbatim by the XLA
    reference backend and the Pallas TPU kernel.
    """
    t = qx.shape[0]
    cap = rx.shape[-1]
    f32 = jnp.float32
    r2 = radius * radius
    # bf16 operands exact for 0/1 indicators; f32 accumulation (see
    # ball_features._cell_terms)
    triu = jnp.triu(jnp.ones((cap, cap), f32)).astype(jnp.bfloat16)

    dx = rx - qx  # (T, cap)
    dy = ry - qy
    dz = rz - qz
    d2 = dx * dx + dy * dy + dz * dz
    # inclusive d2 <= r2: the Open3D-path convention ParticleNet._search
    # uses (ops/neighbor_search.radius_search_grid inclusive=True)
    within = d2 <= r2
    if exclude_self:
        within = within & (d2 > 0.0)
    wf = within.astype(f32)
    rank = jax.lax.dot_general(
        wf.astype(jnp.bfloat16), triu,
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )  # inclusive in-cell rank among within-radius candidates
    cnt = rank[:, cap - 1 : cap]
    sel = within & ((off + rank) <= float(k))
    slot = off + rank - 1.0  # global output slot, exact integer in f32

    # one-hot scatter: oh[t, s, m] = sel[t, m] & (slot[t, m] == s); payload
    # emission is an elementwise product + lane reduction — no gather, no
    # sort. K sits on the sublane axis of the (K, cap) tile and lands on
    # lanes after the reduction, matching the (T, K) output layout.
    # integer iota + cast: Mosaic's tpu.iota only produces integer vectors
    # (a float broadcasted_iota verifies fine in interpret mode but fails
    # to lower on real TPU)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (t, k, cap), 1).astype(f32)
    oh = ((slot[:, None, :] == iota_k) & sel[:, None, :]).astype(f32)

    def emit(val_row):  # (1, cap) -> (T, K)
        return jnp.sum(oh * val_row[:, None, :], axis=-1)

    return emit(ridx), emit(rx), emit(ry), emit(rz), cnt


def _block_compact(qx, qy, qz, rows_x, rows_y, rows_z, rows_i,
                   radius: float, k: int, exclude_self: bool):
    """XLA-traceable 27-cell composition (the correctness reference; the
    Pallas kernel walks the same cells with a fori_loop)."""
    t = qx.shape[0]
    acc = [jnp.zeros((t, k), jnp.float32) for _ in range(4)]
    off = jnp.zeros((t, 1), jnp.float32)
    for o in range(27):
        di, dx_, dy_, dz_, cnt = _cell_compact(
            qx, qy, qz, rows_x[o], rows_y[o], rows_z[o], rows_i[o],
            off, radius, k, exclude_self,
        )
        acc = [a + d for a, d in zip(acc, (di, dx_, dy_, dz_))]
        off = off + cnt
    return acc[0], acc[1], acc[2], acc[3], off


def _xla_compact(q_rep, tx, ty, tz, ti, gcell, dims, radius, k,
                 exclude_self, chunk_groups=8):
    """q_rep (NG*T, 3) repacked queries -> 4 payloads (NG*T, K) + count."""
    ng = gcell.shape[0]
    t = q_rep.shape[0] // ng
    rows = bf._neighbor_rows(gcell, dims)  # (NG, 27)

    def fn(args):
        qc, rc = args  # (G, T, 3), (G, 27)
        cx = tx[rc][:, :, None, :]  # (G, 27, 1, cap)
        cy = ty[rc][:, :, None, :]
        cz = tz[rc][:, :, None, :]
        ci = ti[rc][:, :, None, :]

        def one(qb, a, b, c, i):
            return _block_compact(
                qb[:, 0:1], qb[:, 1:2], qb[:, 2:3], a, b, c, i,
                radius, k, exclude_self,
            )

        return jax.vmap(one)(qc, cx, cy, cz, ci)

    pad = (-ng) % chunk_groups
    qg = jnp.pad(q_rep.reshape(ng, t, 3), ((0, pad), (0, 0), (0, 0)),
                 constant_values=_SENTINEL)
    rg = jnp.pad(rows, ((0, pad), (0, 0)), constant_values=tx.shape[0] - 1)
    n_chunks = (ng + pad) // chunk_groups
    out = jax.lax.map(
        fn,
        (qg.reshape(n_chunks, chunk_groups, t, 3),
         rg.reshape(n_chunks, chunk_groups, 27)),
    )
    idx, x, y, z, cnt = (o.reshape(-1, o.shape[-1]) for o in out)
    return (idx[: ng * t], x[: ng * t], y[: ng * t], z[: ng * t],
            cnt[: ng * t])


def _fwd_kernel(rows_ref, qx_ref, qy_ref, qz_ref, tx_ref, ty_ref, tz_ref,
                ti_ref, oi_ref, ox_ref, oy_ref, oz_ref, oc_ref, *,
                radius: float, k: int, t: int, dims: tuple,
                exclude_self: bool):
    gb = pl.program_id(0)
    d0, d1, d2 = dims
    num_cells = d0 * d1 * d2
    for j in range(GPB):
        g = gb * GPB + j
        c = rows_ref[g]
        qx, qy, qz = qx_ref[j], qy_ref[j], qz_ref[j]  # (T, 1)

        @pl.when(c == num_cells)
        def _skip():  # sentinel tail groups: empty result
            oi_ref[j : j + 1] = jnp.zeros((1, t, k), jnp.float32)
            ox_ref[j : j + 1] = jnp.zeros((1, t, k), jnp.float32)
            oy_ref[j : j + 1] = jnp.zeros((1, t, k), jnp.float32)
            oz_ref[j : j + 1] = jnp.zeros((1, t, k), jnp.float32)
            oc_ref[j : j + 1] = jnp.zeros((1, t, 1), jnp.float32)

        @pl.when(c < num_cells)
        def _run():
            _fwd_group(oi_ref, ox_ref, oy_ref, oz_ref, oc_ref, c,
                       qx, qy, qz, tx_ref, ty_ref, tz_ref, ti_ref,
                       j, radius, k, t, dims, exclude_self)


def _fwd_group(oi_ref, ox_ref, oy_ref, oz_ref, oc_ref, c, qx, qy, qz,
               tx_ref, ty_ref, tz_ref, ti_ref, j, radius, k, t, dims,
               exclude_self):
    def body(i, carry):
        ai, ax, ay, az, off = carry
        for u in range(UNROLL):
            row = pf._row_for_cell(c, i * UNROLL + u, dims)
            rx = tx_ref[pl.ds(row, 1), :]  # (1, cap)
            ry = ty_ref[pl.ds(row, 1), :]
            rz = tz_ref[pl.ds(row, 1), :]
            ri = ti_ref[pl.ds(row, 1), :]
            di, dxx, dyy, dzz, cnt = _cell_compact(
                qx, qy, qz, rx, ry, rz, ri, off, radius, k, exclude_self
            )
            ai = ai + di
            ax = ax + dxx
            ay = ay + dyy
            az = az + dzz
            off = off + cnt
        return ai, ax, ay, az, off

    assert 27 % UNROLL == 0
    z2 = jnp.zeros((t, k), jnp.float32)
    ai, ax, ay, az, off = jax.lax.fori_loop(
        0, 27 // UNROLL, body,
        (z2, z2, z2, z2, jnp.zeros((t, 1), jnp.float32)),
    )
    oi_ref[j : j + 1] = ai.reshape(1, t, k)
    ox_ref[j : j + 1] = ax.reshape(1, t, k)
    oy_ref[j : j + 1] = ay.reshape(1, t, k)
    oz_ref[j : j + 1] = az.reshape(1, t, k)
    oc_ref[j : j + 1] = off.reshape(1, t, 1)


def _pallas_compact(q_rep, tx, ty, tz, ti, gcell, dims, radius, k, t,
                    exclude_self, interpret):
    ng = gcell.shape[0]
    ngp = -(-ng // GPB) * GPB
    num_cells = dims[0] * dims[1] * dims[2]
    gcell_p = jnp.pad(gcell, (0, ngp - ng), constant_values=num_cells)
    q3 = jnp.pad(
        q_rep.reshape(ng, t, 3), ((0, ngp - ng), (0, 0), (0, 0)),
        constant_values=_SENTINEL,
    )
    qspec = pl.BlockSpec((GPB, t, 1), lambda g, rows: (g, 0, 0))
    vmem = pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM)
    ospec = pl.BlockSpec((GPB, t, k), lambda g, rows: (g, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ngp // GPB,),
        in_specs=[qspec, qspec, qspec, vmem, vmem, vmem, vmem],
        out_specs=[ospec, ospec, ospec, ospec,
                   pl.BlockSpec((GPB, t, 1), lambda g, rows: (g, 0, 0))],
    )
    shp = jax.ShapeDtypeStruct((ngp, t, k), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, radius=float(radius), k=int(k), t=int(t),
            dims=tuple(dims), exclude_self=bool(exclude_self),
        ),
        grid_spec=grid_spec,
        out_shape=[shp, shp, shp, shp,
                   jax.ShapeDtypeStruct((ngp, t, 1), jnp.float32)],
        interpret=interpret,
    )(gcell_p.astype(jnp.int32), q3[:, :, 0:1], q3[:, :, 1:2], q3[:, :, 2:3],
      tx, ty, tz, ti)
    idx, x, y, z, cnt = outs
    return (idx[:ng].reshape(ng * t, k), x[:ng].reshape(ng * t, k),
            y[:ng].reshape(ng * t, k), z[:ng].reshape(ng * t, k),
            cnt[:ng].reshape(ng * t, 1))


def ball_query_compact(
    queries: jax.Array,
    grid: "ns.CellGrid",
    lower: tuple,
    upper: tuple,
    radius: float,
    k: int,
    exclude_self: bool = False,
    group_size: int = 32,
    backend: str = "auto",
) -> tuple[ns.NeighborList, jax.Array]:
    """Compact fixed-K neighbor lists from a prebuilt CellGrid.

    The grid MUST have been built with cell_size == radius over
    (lower, upper) (ParticleNet.make_grid geometry). Returns
    (NeighborList, overflow) like radius_search_grid, with the selection
    semantics documented in the module docstring. The NeighborList's
    `xyz` payload carries the selected coordinates (stop-gradient), so
    consumers skip the forward position gather (cconv_geometry's
    gather3_values path); `sq_dists` is likewise stop-gradient here
    (ParticleNet re-derives differentiable geometry itself).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    queries = jax.lax.stop_gradient(queries)
    q = queries.shape[0]
    dims = bf._cell_dims(lower, upper, radius)
    grouping = bf.group_queries(
        queries, grid.points_original, radius, lower, upper,
        capacity=q, group_size=group_size,
    )
    capacity, t = grouping.capacity, grouping.group_size

    invalid = grid.table_idx < 0
    tx = jnp.where(invalid, _SENTINEL, grid.table_x)
    ty = jnp.where(invalid, _SENTINEL, grid.table_y)
    tz = jnp.where(invalid, _SENTINEL, grid.table_z)
    # original ids as f32 (exact below 2^24; sizes here are ~1e4)
    ti = grid.table_idx.astype(jnp.float32)

    q_sorted = queries[grouping.order[:capacity]]
    q_pad = jnp.concatenate(
        [q_sorted, jnp.full((1, 3), _SENTINEL, queries.dtype)], axis=0
    )
    q_rep = q_pad[grouping.rep_idx]  # (NG*T, 3)

    if backend == "pallas":
        idx_f, x, y, z, cnt = _pallas_compact(
            q_rep, tx, ty, tz, ti, grouping.gcell, dims, radius, k, t,
            exclude_self, interpret=jax.default_backend() != "tpu",
        )
    else:
        idx_f, x, y, z, cnt = _xla_compact(
            q_rep, tx, ty, tz, ti, grouping.gcell, dims, radius, k,
            exclude_self,
        )

    # repacked slots -> original query order (same inversion as
    # ball_features._forward)
    slot_of_sorted = jnp.argsort(
        jnp.where(
            grouping.rep_idx >= capacity, jnp.inf,
            grouping.rep_idx.astype(jnp.float32),
        )
    ).astype(jnp.int32)[:capacity]
    r = grouping.inv_rank
    in_kept = r < capacity
    slot = slot_of_sorted[jnp.minimum(r, capacity - 1)]

    def unpack(a, fill=0.0):
        return jnp.where(in_kept[:, None], a[slot], fill)

    count_rep = cnt[:, 0]
    count = jnp.where(in_kept, count_rep[slot], 0.0).astype(jnp.int32)
    n_sel = jnp.minimum(count, k)
    mask = jnp.arange(k, dtype=jnp.int32)[None, :] < n_sel[:, None]
    idx = jnp.where(mask, unpack(idx_f).astype(jnp.int32), -1)
    xyz = (unpack(x), unpack(y), unpack(z))
    sq = jnp.zeros((q, k), queries.dtype)
    for ax, cc in enumerate(xyz):
        d = jnp.where(mask, cc - queries[:, ax, None], 0.0)
        sq = sq + d * d
    nbrs = ns.NeighborList(idx, sq, mask, count, xyz)
    return nbrs, grid.overflow

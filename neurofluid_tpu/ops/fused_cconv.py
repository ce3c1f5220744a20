"""Fused continuous convolution: selection-free, cell-range, fold-W Pallas op.

This is the transition model's speed-of-light path (round-4 redesign of the
ParticleNet hot loop, reference models/transmodel.py:80-131). The round-3
pipeline — grid search -> top-k -> neighbor lists -> adjoint-plan sorts ->
(Q*K)-row feature gathers -> tap-matrix einsums — was measured on v5e to be
dominated NOT by FLOPs (<1% MFU) but by descriptor-bound random row gathers
(~30 ns/row regardless of width; the (14336*64)-row gathers cost ~27 ms
EACH and the step runs several) plus the 32 ms/step padded cell-table
builds. This op removes every one of those costs structurally:

  NO neighbor selection. The continuous conv is a SUM over the in-radius
  neighborhood weighted by the poly6 window, which is EXACTLY ZERO at and
  beyond the search radius. So convolving over ANY superset of the true
  neighborhood is bit-identical to convolving over the neighborhood itself.
  The kernel therefore processes every candidate in the query's 27-cell
  range and lets the window/radius mask zero the rest — no top-k, no
  neighbor list, no K cap, and (unlike the round-3 path, which kept the K
  nearest) no truncation either: EVERY in-radius neighbor contributes,
  matching the reference's uncapped Open3D search semantics exactly.

  NO gathers. Particles are sorted by grid cell once per step (z-fastest
  cell ids, one 14k-key sort) into a DENSE array; a cell's particles are
  then a contiguous row range, and the 27-cell neighborhood of a query
  column is 9 contiguous ranges (one per (dx, dy) neighbor column, spanning
  z-1..z+1). The kernel reads candidates as dynamic-start CONTIGUOUS SLABS
  of the dense VMEM-resident arrays — full-bandwidth sublane reads, zero
  descriptors. The padded per-cell tables of ops/neighbor_search (and their
  32 ms/step densify gather) are not built at all on this path.

  Work lands on the MXU. Per (group, slab): the 8-corner trilinear tap
  weights are built FACTORIZED (per-axis 4-tap weight rows combined by
  broadcasting — ~64 (T_g, S) vector ops, never an unfactored one-hot over
  all 64 taps) into a t-major tap-weight matrix TW ((T*T_g), S), and one
  matmul TW @ feats_slab (S, C) accumulates the per-tap feature sums. After
  the 9 slabs, the (kz*ky*kx, Cin, Cout) filter is contracted IN-KERNEL
  (fold-W, W VMEM-resident), so the kernel's output is just (T_g, Cout) per
  group — the (Q, T, C) tap-feature tensor (352 MB/layer at the watercube
  point) never exists in HBM.

GROUPING: queries are the sorted particles themselves, split into groups of
T_g CONSECUTIVE sorted rows that never cross a (cx, cy) column boundary
(groups per column = ceil(count/T_g); short tail groups are padded — padded
slots compute garbage that is masked out of the dense-row '+=' writes, and
the backward masks their cotangent reads the same way). Outputs land
DIRECTLY in dense sorted rows (a masked read-modify-write at the group's
row range — the same revisited-VMEM pattern as the backward accumulators),
so chaining conv layers needs no per-layer compaction gathers.

Column alignment is what makes the 9-slab candidate cover exact: each slab is [pstarts[col' * d2 + z_lo - 1],
pstarts[col' * d2 + z_hi + 2]) for the group's query z-cell range
[z_lo, z_hi], so every true neighbor appears in EXACTLY one slab (cell size
>= radius; rows beyond a slab's true length are masked by an iota-vs-length
lane mask — they are real particles from farther cells whose window weight
need not be zero).

SHAPES (defaults, sized for v5e vregs): T_g = 16 queries/group on
sublanes; candidates are walked in 128-lane chunks — the per-pair math
runs in full (16, 128) vregs. The 9 slabs are SEGMENT-PACKED into those
chunks: each slab is cut into _SEG = 64-row pieces and every chunk
processes TWO segments (two dynamic-start contiguous 64-row reads,
concatenated on sublanes before the transpose). At realistic occupancy a
slab is ~30-60 candidates, so the unpacked walk ran 9 chunks/group at
~30% lane fill; packing makes it ceil(sum ceil(len/64) / 2) ~ 5
chunks/group — the kernel is VPU-issue-bound on the per-pair math, so
lane fill is throughput. One fori_loop with DYNAMIC trip count walks the
chunks (cost tracks the true cell occupancy); SLAB_CAP is only the
fail-loudly capacity bound (raising it for splashy training states is
free).

GRADIENTS: custom VJP. Differentiable w.r.t. query/candidate positions
(through the ball->cube map, trilinear weights and window — the property
the whole NeuroFluid pipeline depends on), features, and the filter. The
backward kernel recomputes the forward per (group, slab) and applies
jax.vjp of the pure slab function (the ops/pallas_features pattern),
accumulating position/feature cotangents by read-modify-write into dense
VMEM-resident (N, ...) buffers (sequential TPU grid => race-free) and the
filter cotangent into a constant-index revisited output block.

NO CAPACITY CONDITION: the chunk walk covers the TRUE slab lengths
whatever they are — SLAB_CAP only sizes the sentinel/feature padding the
segment reads may run into (floored at _SEG), so the op's math is the
EXACT uncapped reference semantics for ANY occupancy (a pathological
all-in-one-cell state just walks more chunks). The plan still carries an
`overflow` flag for the one remaining (defensive, provably unreachable)
static bound — the group count — and trainers surface it through the same
chain as the grid-search overflow flags.

Numerics match ops/cconv (same ball_to_cube_volume_preserving /
trilinear_taps / window_poly6 formulas, f32 pair math, f32 matmuls at the
default precision); tests pin both against the brute-force uncapped
pipeline and against finite differences.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neurofluid_tpu.ops import cconv as cconv_ops

_SENTINEL = 1e9
GROUP_SIZE = 16   # T_g: queries per group (sublane dim of the pair math)
SLAB_CAP = 128    # S: candidate slab length bound (fail-loudly capacity)
# SEGMENT-PACKED WALK: slabs are cut into _SEG-row segments and walked two
# segments per 128-lane chunk with a DYNAMIC trip count, so per-group cost
# tracks the TRUE slab occupancy (not SLAB_CAP — raising the cap for
# splashy/rotated training states is free; empty/out-of-grid slabs
# contribute zero segments) AND short slabs don't waste lanes: at the
# 14k-lattice working point the old one-slab-per-chunk walk ran 9 chunks
# per group at ~39/128 lane fill; two 64-row segments per chunk cut that
# to ~5. 64 is the sweet spot: one read must stay CONTIGUOUS (dynamic-
# start sublane reads; no dynamic lane rolls needed) and 32-row segments
# would double the scalar descriptor work for the same fill at this
# occupancy. Segments within a chunk are always disjoint slab pieces, so
# the backward's two RMW '+=' windows never alias a pair contribution.
_SEG = 64
# The 64-tap fold-W contractions are PYTHON-UNROLLED with STATIC slices:
# Mosaic's in-kernel scan lowering rejects partial unrolls (only unroll=1 or
# full) AND has no lowering for dynamic_slice on VALUES (only on refs) —
# both measured on v5e in round 5. Static slices match how the tap-weight
# blocks are already built in _slab_contrib.


def _cell_dims(lower, upper, cell_size):
    return tuple(
        int(max(1, math.ceil((float(u) - float(l)) / cell_size)))
        for l, u in zip(lower, upper)
    )


@jax.tree_util.register_pytree_node_class
class CConvPlan:
    """Cell-sort + column-grouping of one point set (queries and/or
    candidates).

    Registered as a pytree with (dims, n, n_groups, group_size, slab_cap,
    cell_size) as STATIC aux data — like ops/neighbor_search.CellGrid — so
    a prebuilt plan can cross jit/remat boundaries (the static boundary
    particles' plan is built once per scene and passed into every step;
    NamedTuple auto-flattening would turn these ints into tracers and the
    kernel's static shapes could not be derived from them).

    order:      (N,) int32 sort order (dense row r holds original point
                order[r]).
    inv_rank:   (N,) int32 inverse permutation.
    pos_s:      (N + slab_cap, 3) f32 sorted positions, tail
                padded with the 1e9 sentinel (rejected by the radius test).
    pstarts:    (num_cells + 1,) int32 dense row range starts per cell.
    gcol:       (NG,) int32 (cx * d1 + cy) column id per group (sentinel
                n_columns for empty tail groups).
    gzlo/gzhi:  (NG,) int32 query z-cell range per group.
    gstart:     (NG + 1,) int32 first dense query row per group.
    overflow:   () bool — defensive group-count bound hit (provably
                unreachable; there is no slab capacity condition).
    """

    _ARRAY_FIELDS = ("order", "inv_rank", "pos_s", "pstarts", "gcol",
                     "gzlo", "gzhi", "gstart", "overflow")
    _STATIC_FIELDS = ("dims", "n", "n_groups", "group_size", "slab_cap",
                      "cell_size")

    def __init__(self, order, inv_rank, pos_s, pstarts, gcol, gzlo, gzhi,
                 gstart, overflow, dims, n, n_groups, group_size,
                 slab_cap, cell_size):
        self.order = order
        self.inv_rank = inv_rank
        self.pos_s = pos_s
        self.pstarts = pstarts
        self.gcol = gcol
        self.gzlo = gzlo
        self.gzhi = gzhi
        self.gstart = gstart
        self.overflow = overflow
        self.dims = tuple(dims)
        self.n = int(n)
        self.n_groups = int(n_groups)
        self.group_size = int(group_size)
        self.slab_cap = int(slab_cap)
        self.cell_size = float(cell_size)

    def _replace(self, **kw):
        args = {f: getattr(self, f)
                for f in self._ARRAY_FIELDS + self._STATIC_FIELDS}
        args.update(kw)
        return CConvPlan(**args)

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._ARRAY_FIELDS)
        aux = tuple(getattr(self, f) for f in self._STATIC_FIELDS)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_plan(
    points: jax.Array,
    lower: tuple,
    upper: tuple,
    cell_size: float,
    group_size: int = GROUP_SIZE,
    slab_cap: int = SLAB_CAP,
    with_groups: bool = True,
) -> CConvPlan:
    """Sort `points` by cell and build the column grouping.

    `with_groups=False` builds a candidate-only plan (e.g. the static box
    particles: they are convolved FROM, never queried AT, so they need only
    the dense sorted layout + pstarts).

    Everything here is discrete (sort keys, ranges) — gradients flow through
    the dense positions via `sort_values` (a permutation gather whose
    adjoint is the inverse permutation gather), not through the plan.
    """
    pts = jax.lax.stop_gradient(points)
    n = pts.shape[0]
    t = int(group_size)
    # the kernels read whole _SEG-row segments (and T_g-row query blocks)
    # at dynamic starts; the sentinel tail (and the callers' feature
    # padding, sized from plan.slab_cap) must cover one full read
    slab_cap = max(int(slab_cap), _SEG, int(group_size))
    dims = _cell_dims(lower, upper, cell_size)
    d0, d1, d2 = dims
    num_cells = d0 * d1 * d2
    n_cols = d0 * d1
    lower_a = jnp.asarray(lower, pts.dtype)

    cell3 = jnp.clip(
        jnp.floor((pts - lower_a) / cell_size).astype(jnp.int32),
        0, jnp.asarray(dims, jnp.int32) - 1,
    )
    cell_id = (cell3[:, 0] * d1 + cell3[:, 1]) * d2 + cell3[:, 2]
    iota = jnp.arange(n, dtype=jnp.int32)
    # f32 sort keys (fast TPU path; ids < 2^24 exact), order carried along
    sorted_id_f, order = jax.lax.sort(
        (cell_id.astype(jnp.float32), iota), dimension=0, num_keys=1
    )
    _, inv_rank = jax.lax.sort(
        (order.astype(jnp.float32), iota), dimension=0, num_keys=1
    )
    sorted_id = sorted_id_f.astype(jnp.int32)
    pstarts = jnp.searchsorted(
        sorted_id, jnp.arange(num_cells + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    pos_s = jnp.concatenate(
        [pts[order], jnp.full((slab_cap, 3), _SENTINEL, pts.dtype)], axis=0
    )

    if not with_groups:
        z = jnp.zeros((1,), jnp.int32)
        return CConvPlan(
            order=order, inv_rank=inv_rank, pos_s=pos_s, pstarts=pstarts,
            gcol=z, gzlo=z, gzhi=z, gstart=jnp.zeros((2,), jnp.int32),
            overflow=jnp.asarray(False),
            dims=dims, n=n, n_groups=0, group_size=t,
            slab_cap=int(slab_cap), cell_size=float(cell_size),
        )

    col_of_sorted = sorted_id // d2
    zc_of_sorted = sorted_id % d2
    cstarts = jnp.searchsorted(
        col_of_sorted, jnp.arange(n_cols + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    ccount = jnp.diff(cstarts)
    gpc = -(-ccount // t)  # groups per column (ceil)
    gbase = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(gpc)]
    ).astype(jnp.int32)
    # static group bound: every non-empty column wastes < 1 group
    ng = -(-n // t) + n_cols + 1
    overflow = gbase[-1] > ng

    rank_in_col = iota - cstarts[col_of_sorted]
    group_of_q = jnp.minimum(gbase[col_of_sorted] + rank_in_col // t, ng - 1)
    gstart = jnp.searchsorted(
        group_of_q, jnp.arange(ng + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    gcount = jnp.diff(gstart)
    safe_first = jnp.minimum(gstart[:-1], n - 1)
    safe_last = jnp.minimum(gstart[1:] - 1, n - 1)
    nonempty = gcount > 0
    gcol = jnp.where(nonempty, col_of_sorted[safe_first], n_cols)
    gzlo = jnp.where(nonempty, zc_of_sorted[safe_first], 0)
    gzhi = jnp.where(nonempty, zc_of_sorted[safe_last], 0)

    # NO slab-capacity condition: the segment-packed walk covers the true
    # slab lengths whatever they are (see the module's NO CAPACITY
    # CONDITION note) — `overflow` carries only the defensive group-count
    # bound above, which the ceil argument proves unreachable.

    return CConvPlan(
        order=order, inv_rank=inv_rank, pos_s=pos_s, pstarts=pstarts,
        gcol=gcol, gzlo=gzlo, gzhi=gzhi, gstart=gstart,
        overflow=overflow, dims=dims, n=n, n_groups=int(ng), group_size=t,
        slab_cap=int(slab_cap), cell_size=float(cell_size),
    )


def slab_overflow(qplan: CConvPlan, cplan: CConvPlan) -> jax.Array:
    """Precondition check for a CROSS conv (qplan's groups reading cplan's
    candidate ranges — e.g. fluid queries over the static box set): the
    plans must share the grid geometry (raises otherwise), and qplan's own
    (defensive group-bound) overflow flag is re-raised. There is no slab
    capacity condition — the segment-packed walk is exact for any
    occupancy (see the module's NO CAPACITY CONDITION note)."""
    if qplan.dims != cplan.dims:
        raise ValueError(
            f"query/candidate plans disagree on grid dims: "
            f"{qplan.dims} vs {cplan.dims}"
        )
    return qplan.overflow


def sort_values(values: jax.Array, plan: CConvPlan, pad_rows: int = 0,
                pad_value: float = 0.0) -> jax.Array:
    """Differentiable (N, C) -> sorted (N + pad_rows, C) row permutation.

    The adjoint of a permutation gather is the inverse permutation gather —
    wrapping it keeps XLA from emitting a scatter in the backward."""
    out = _permute_rows(values, plan.order, plan.inv_rank)
    if pad_rows:
        out = jnp.concatenate(
            [out, jnp.full((pad_rows,) + out.shape[1:], pad_value, out.dtype)],
            axis=0,
        )
    return out


def unsort_values(values_s: jax.Array, plan: CConvPlan) -> jax.Array:
    """Inverse of `sort_values` (drops padding rows first)."""
    return _permute_rows(values_s[: plan.n], plan.inv_rank, plan.order)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _permute_rows(values, perm, inv):
    return values[perm]


def _permute_rows_fwd(values, perm, inv):
    return values[perm], (perm, inv)


def _permute_rows_bwd(res, ct):
    perm, inv = res
    return ct[inv], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


# ---------------------------------------------------------------------------
# pure per-slab math (shared by the Pallas forward kernel, the backward
# kernel's jax.vjp, and the interpret-mode tests)
# ---------------------------------------------------------------------------


_ATAN_COEFFS = (
    9.999999880828e-01, -3.333312078100e-01, 1.999371614268e-01,
    -1.421319619692e-01, 1.068142103287e-01, -7.596809867133e-02,
    4.385559905435e-02, -1.682744852802e-02, 3.049968069371e-03,
)


def _atan01(t):
    """arctan(t) for t in [-1, 1]: odd minimax polynomial (Chebyshev fit of
    atan(t)/t in t^2, max error 1.4e-7 in f32). Mosaic has no atan
    primitive; the disc->square map only ever needs |t| <= 1 (its wedge
    selection guarantees |num| <= |den|), and callers CLAMP the ratio so
    the not-selected branch stays finite (and finite-gradient) too."""
    u = t * t
    acc = jnp.full_like(u, _ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        acc = acc * u + c
    return acc * t


def _axis_w_hat(u, k: int, fold=None):
    """Per-axis trilinear weights on a k-tap axis in HAT form: tap j gets
    max(0, 1 - |tpos - j|), which is algebraically identical to the
    floor/fraction form of ops/cconv.trilinear_taps (align_corners=True,
    edge-clamped tpos) but needs no floor/i0 bookkeeping and ~30% fewer
    vector issues — this runs per (group, chunk) in a VPU-issue-bound
    kernel. `fold` premultiplies every tap (the poly6 window rides the z
    axis)."""
    tpos = jnp.clip((u * 0.5 + 0.5) * (k - 1.0), 0.0, k - 1.0)
    ws = []
    for j in range(k):
        wj = jnp.maximum(1.0 - jnp.abs(tpos - float(j)), 0.0)
        if fold is not None:
            wj = wj * fold
        ws.append(wj)
    return ws


def _slab_contrib(qx, qy, qz, cx, cy, cz, feats, valid,
                  radius: float, ksize: tuple, t_g: int,
                  exclude_zero: bool = False,
                  precision=jax.lax.Precision.HIGHEST):
    """One candidate slab's contribution to the group's tap-feature sums.

    qx/qy/qz (T_g, 1) query coordinate columns; cx/cy/cz (1, S) candidate
    coordinate rows; feats (S, C) candidate features; valid (T_g, S) f32
    pair mask (lane length mask & optional self-exclusion — DISCRETE,
    computed by the caller).

    Returns (acc (kz*ky*kx*T_g, C) t-major tap-feature sums, cnt (T_g, 1)
    in-radius pair count). Strictly 2-D ops (Mosaic constraint).

    Math identical to cconv_ops: offsets normalized by radius, poly6 window
    on d^2/r^2 (zero at/past the radius — which is what makes convolving
    over the slab SUPERSET exact), ball->cube volume-preserving map,
    factorized 4x4x4 trilinear taps, align_corners.
    """
    kz, ky, kx = ksize
    inv_r = 1.0 / radius
    ox = (cx - qx) * inv_r  # (T_g, S)
    oy = (cy - qy) * inv_r
    oz = (cz - qz) * inv_r
    d2n = ox * ox + oy * oy + oz * oz
    within = (d2n <= 1.0) & (valid > 0.5)
    if exclude_zero:
        # self-exclusion by POSITION (d == 0), matching Open3D's
        # ignore_query_point semantics (and this repo's brute/grid paths):
        # a coincident twin is excluded along with the query itself
        within = within & (d2n > 0.0)
    wf = within.astype(jnp.float32)
    cnt = jnp.sum(wf, axis=1, keepdims=True)
    # poly6 window on the normalized SQUARED distance (reference
    # models/transmodel.py:73-77 via cconv_ops.window_poly6). d2n is clamped
    # to 2 FIRST: sentinel/far rows have d2n ~ 1e20 and (1 - d2n)^3 would
    # overflow f32 to -inf — the clip zeroes the FORWARD value but its VJP
    # multiplies a zero cotangent by the inf derivative of the cube => NaN
    # position gradients. Clamping changes nothing for d2n <= 1 (the only
    # rows with nonzero window) and keeps every derivative finite.
    d2w = jnp.minimum(d2n, 2.0)
    w = jnp.clip((1.0 - d2w) ** 3, 0.0, 1.0) * wf

    # ball->cube volume-preserving map, 2-D elementwise form of
    # cconv_ops.map_sphere_to_cylinder / map_cylinder_to_cube.
    # Double-where guards: sqrt'(0) = inf, and a degenerate (self /
    # coincident) pair would turn the masked-out branch into NaN * 0 = NaN
    # in the VJP — so the sqrt arguments are made safe BEFORE the sqrt and
    # the degenerate outputs re-selected to 0 after.
    eps = 1e-8
    sq_norm = d2n
    degenerate = sq_norm < eps * eps
    norm = jnp.sqrt(jnp.where(degenerate, 1.0, sq_norm))
    rho2 = ox * ox + oy * oy
    cap_region = 1.25 * oz * oz > rho2
    s_cap = jnp.sqrt(3.0 * norm / (norm + jnp.abs(oz) + eps))
    x_cap, y_cap = ox * s_cap, oy * s_cap
    z_cap = jnp.sign(oz) * norm
    s_side = norm / jnp.sqrt(jnp.maximum(rho2, eps * eps))
    x_side, y_side = ox * s_side, oy * s_side
    z_side = 1.5 * oz
    cylx = jnp.where(cap_region, x_cap, x_side)
    cyly = jnp.where(cap_region, y_cap, y_side)
    cylz = jnp.where(cap_region, z_cap, z_side)
    cylx = jnp.where(degenerate, 0.0, cylx)
    cyly = jnp.where(degenerate, 0.0, cyly)
    cylz = jnp.where(degenerate, 0.0, cylz)
    # disc -> square (inverse Shirley-Chiu), z unchanged
    crho2 = cylx * cylx + cyly * cyly
    cdeg = crho2 < eps * eps
    crho = jnp.sqrt(jnp.where(cdeg, 1.0, crho2))
    x_ge = jnp.abs(cylx) >= jnp.abs(cyly)
    safe_x = jnp.where(jnp.abs(cylx) < eps, 1.0, cylx)
    safe_y = jnp.where(jnp.abs(cyly) < eps, 1.0, cyly)
    a1 = jnp.sign(cylx) * crho
    b1 = (4.0 / jnp.pi) * a1 * _atan01(jnp.clip(cyly / safe_x, -1.0, 1.0))
    b2 = jnp.sign(cyly) * crho
    a2 = (4.0 / jnp.pi) * b2 * _atan01(jnp.clip(cylx / safe_y, -1.0, 1.0))
    ux = jnp.where(cdeg, 0.0, jnp.where(x_ge, a1, a2))
    uy = jnp.where(cdeg, 0.0, jnp.where(x_ge, b1, b2))
    uz = cylz

    # factorized trilinear taps (hat form); Open3D axis convention: spatial
    # axis 0 <- z (kz taps on uz), 1 <- y, 2 <- x (cconv_ops.trilinear_taps)
    wxs = _axis_w_hat(ux, kx)
    wys = _axis_w_hat(uy, ky)
    wzs = _axis_w_hat(uz, kz, fold=w)  # window folded into the z factor

    # t-major tap-weight matrix: rows [(tz*ky + ty)*kx + tx] * T_g + tg ...
    # actually rows are ordered t-major as blocks of T_g: block index
    # t = (tz*ky + ty)*kx + tx holds rows [t*T_g, (t+1)*T_g).
    blocks = []
    for tz in range(kz):
        for ty in range(ky):
            wzy = wzs[tz] * wys[ty]  # (T_g, S)
            for tx in range(kx):
                blocks.append(wzy * wxs[tx])
    tw = jnp.concatenate(blocks, axis=0)  # (T*T_g, S)
    acc = jax.lax.dot_general(
        tw, feats, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (T*T_g, C)
    return acc, cnt


def _fold_w(acc, w, t_g: int, n_taps: int, cin: int, cout: int,
            precision=jax.lax.Precision.HIGHEST):
    """out (T_g, Cout) = sum_t acc[t*T_g:(t+1)*T_g, :] @ W[t] — the in-kernel
    filter contraction. `w` is a (n_taps * cin, cout) array (kernels read
    their VMEM ref once and pass the value). Python-unrolled static slices
    (see the module constants note on Mosaic's loop/slice constraints)."""
    out = jnp.zeros((t_g, cout), jnp.float32)
    for t in range(n_taps):
        a = jax.lax.slice(acc, (t * t_g, 0), ((t + 1) * t_g, cin))
        wt = jax.lax.slice(w, (t * cin, 0), ((t + 1) * cin, cout))
        out = out + jax.lax.dot_general(
            a, wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
    return out


def _unfold_w(ct, w, t_g: int, n_taps: int, cin: int, cout: int,
              precision=jax.lax.Precision.HIGHEST):
    """d_acc (n_taps*T_g, Cin) from the group cotangent ct (T_g, Cout):
    rows [t*T_g, (t+1)*T_g) = ct @ W[t]^T (contraction over Cout)."""
    blocks = []
    for t in range(n_taps):
        wt = jax.lax.slice(w, (t * cin, 0), ((t + 1) * cin, cout))
        blocks.append(jax.lax.dot_general(
            ct, wt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ))  # (T_g, Cin)
    return jnp.concatenate(blocks, axis=0)


def _transpose2d(x):
    """2-D transpose; isolated so the Mosaic lowering strategy can be
    swapped in one place if lax.transpose is rejected on a target.
    (Measured on v5e: replacing these with a dummy broadcast moved the
    14k-particle train step only 692 -> 672 ms — NOT a bottleneck.)"""
    return jax.lax.transpose(x, (1, 0))


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _slab_range(i, col, z0, z1, pstarts_ref, dims, n_cols, n_c):
    """Scalar (start, length) of candidate slab i (0..8) for a group in
    column `col` with query z-cell range implied by (z0, z1). Invalid
    columns (outside the grid, or the empty-group sentinel) map to the
    sentinel region [n_c, n_c + S) whose coordinates reject via radius."""
    dx = i // 3 - 1
    dy = jax.lax.rem(i, 3) - 1
    d0, d1, d2 = dims
    cx = col // d1
    cy = jax.lax.rem(col, d1)
    ok = (
        (col < n_cols)
        & (cx + dx >= 0) & (cx + dx < d0)
        & (cy + dy >= 0) & (cy + dy < d1)
    )
    base = jnp.clip((cx + dx) * d1 + (cy + dy), 0, n_cols - 1) * d2
    start = pstarts_ref[base + z0]
    end = pstarts_ref[base + z1 + 1]
    start = jnp.where(ok, start, n_c)
    length = jnp.where(ok, end - start, 0)
    return start, length


def _group_segments(col, z0, z1, pstarts_ref, dims, n_cols, n_c):
    """Scalar segment-packing descriptors for one group: cut each of the 9
    candidate slabs into _SEG-row pieces and expose them as one virtual
    segment list. Returns (total_segs, seg) where seg(sid) -> (src, len)
    gives segment sid's dynamic row start and true length (<= _SEG); ids
    past the end map to the sentinel region [n_c, n_c + _SEG) with length
    0. All scalar math (9-way unrolled selects over SMEM pstarts) — it
    overlaps the vector work."""
    starts, lens = [], []
    cums = [jnp.int32(0)]
    for i in range(9):
        s_i, l_i = _slab_range(i, col, z0, z1, pstarts_ref, dims, n_cols,
                               n_c)
        starts.append(s_i)
        lens.append(l_i)
        cums.append(cums[-1] + (l_i + (_SEG - 1)) // _SEG)
    total_segs = cums[-1]

    def seg(sid):
        src = jnp.int32(n_c)
        ln = jnp.int32(0)
        for i in range(9):
            hit = (sid >= cums[i]) & (sid < cums[i + 1])
            off = (sid - cums[i]) * _SEG
            src = jnp.where(hit, starts[i] + off, src)
            ln = jnp.where(hit, jnp.minimum(lens[i] - off, _SEG), ln)
        return src, ln

    return total_segs, seg


def _pair_valid2(len0, len1, t_g: int):
    """(T_g, 2 * _SEG) f32 mask for a two-segment chunk: lane l is a true
    candidate iff l < len0 (first segment) or l - _SEG < len1 (second).
    CRITICAL for correctness: rows past a segment's true length are
    particles of farther cells whose distance may still be inside the
    radius when the dense array runs into an adjacent column; without this
    mask they would be double-counted. (Self-exclusion is positional —
    `exclude_zero` in `_slab_contrib` — matching Open3D's
    ignore_query_point semantics.)"""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * _SEG), 1)
    lim = jnp.where(lane < _SEG, len0, len1 + _SEG)
    v = (lane < lim).astype(jnp.float32)
    return v * jnp.ones((t_g, 1), jnp.float32)


def _fwd_kernel(gcol_ref, gzlo_ref, gzhi_ref, gstart_ref, pstarts_ref,
                qpos_ref, cpos_ref, feats_ref, w_ref, out_ref, cnt_ref, *,
                radius: float, ksize: tuple, t_g: int, s_cap: int,
                dims: tuple, cin: int, cout: int, self_mode: bool,
                n_c: int, precision=jax.lax.Precision.HIGHEST):
    g = pl.program_id(0)
    d0, d1, d2 = dims
    n_cols = d0 * d1
    n_taps = ksize[0] * ksize[1] * ksize[2]
    col = gcol_ref[g]

    # sequential TPU grid: program 0 zero-initializes the dense outputs
    # before any group's masked '+=' lands (same revisited-VMEM pattern as
    # the backward accumulators); empty tail groups then need no work
    @pl.when(g == 0)
    def _init():
        out_ref[:, :] = jnp.zeros(out_ref.shape, jnp.float32)
        cnt_ref[:, :] = jnp.zeros(cnt_ref.shape, jnp.float32)

    @pl.when(col < n_cols)
    def _run():
        q0 = gstart_ref[g]
        z0 = jnp.maximum(gzlo_ref[g] - 1, 0)
        z1 = jnp.minimum(gzhi_ref[g] + 1, d2 - 1)
        qb = qpos_ref[pl.ds(q0, t_g), :]  # (T_g, 3)
        qx, qy, qz = qb[:, 0:1], qb[:, 1:2], qb[:, 2:3]
        total_segs, seg = _group_segments(
            col, z0, z1, pstarts_ref, dims, n_cols, n_c
        )

        # segment-packed walk: two 64-row segments per 128-lane chunk, so
        # cost tracks the TRUE slab occupancy AND short slabs don't waste
        # lanes (see the module's SEGMENT-PACKED WALK note). Empty/edge
        # slabs contribute zero segments.
        def chunk_body(j, carry):
            acc, cnt = carry
            src0, len0 = seg(2 * j)
            src1, len1 = seg(2 * j + 1)
            cb = jnp.concatenate(
                [cpos_ref[pl.ds(src0, _SEG), :],
                 cpos_ref[pl.ds(src1, _SEG), :]], axis=0
            )  # (2 * _SEG, 3)
            cbt = _transpose2d(cb)  # (3, 2 * _SEG)
            fb = jnp.concatenate(
                [feats_ref[pl.ds(src0, _SEG), :],
                 feats_ref[pl.ds(src1, _SEG), :]], axis=0
            )  # (2 * _SEG, Cin)
            valid = _pair_valid2(len0, len1, t_g)
            a, c = _slab_contrib(
                qx, qy, qz, cbt[0:1, :], cbt[1:2, :], cbt[2:3, :],
                fb, valid, radius, ksize, t_g, exclude_zero=self_mode,
                precision=precision,
            )
            return acc + a, cnt + c

        n_chunks = (total_segs + 1) // 2
        acc, cnt = jax.lax.fori_loop(
            0, n_chunks, chunk_body,
            (jnp.zeros((n_taps * t_g, cin), jnp.float32),
             jnp.zeros((t_g, 1), jnp.float32)),
        )
        w = w_ref[:, :]
        out_g = _fold_w(acc, w, t_g, n_taps, cin, cout,
                        precision=precision)
        # dense-row masked '+=': rows past this group's true count belong
        # to the NEXT group's range (tail-group padding) — their garbage
        # is zeroed here, and every real row receives exactly one nonzero
        # add across the grid
        slot = jax.lax.broadcasted_iota(jnp.int32, (t_g, 1), 0)
        live = (slot < (gstart_ref[g + 1] - q0)).astype(jnp.float32)
        out_ref[pl.ds(q0, t_g), :] += out_g * live
        cnt_ref[pl.ds(q0, t_g), :] += jnp.concatenate(
            [cnt, jnp.zeros((t_g, 7), jnp.float32)], axis=1
        ) * live


def _bwd_kernel(gcol_ref, gzlo_ref, gzhi_ref, gstart_ref, pstarts_ref,
                qpos_ref, cpos_ref, feats_ref, w_ref, ctg_ref,
                dq_ref, dc_ref, df_ref, dw_ref, *,
                radius: float, ksize: tuple, t_g: int, s_cap: int,
                dims: tuple, cin: int, cout: int, self_mode: bool,
                n_c: int, n_q: int, precision=jax.lax.Precision.HIGHEST):
    g = pl.program_id(0)
    d0, d1, d2 = dims
    n_cols = d0 * d1
    n_taps = ksize[0] * ksize[1] * ksize[2]

    # sequential TPU grid: program 0 zero-initializes the dense RMW
    # accumulators before any group adds into them
    @pl.when(g == 0)
    def _init():
        dq_ref[:, :] = jnp.zeros(dq_ref.shape, jnp.float32)
        dc_ref[:, :] = jnp.zeros(dc_ref.shape, jnp.float32)
        df_ref[:, :] = jnp.zeros(df_ref.shape, jnp.float32)
        dw_ref[:, :] = jnp.zeros(dw_ref.shape, jnp.float32)

    col = gcol_ref[g]

    @pl.when(col < n_cols)
    def _run():
        q0 = gstart_ref[g]
        z0 = jnp.maximum(gzlo_ref[g] - 1, 0)
        z1 = jnp.minimum(gzhi_ref[g] + 1, d2 - 1)
        qb = qpos_ref[pl.ds(q0, t_g), :]
        qx, qy, qz = qb[:, 0:1], qb[:, 1:2], qb[:, 2:3]
        # dense cotangent rows; mask the tail-group slots that belong to
        # the next group's range (mirror of the forward's masked write)
        slot = jax.lax.broadcasted_iota(jnp.int32, (t_g, 1), 0)
        live = (slot < (gstart_ref[g + 1] - q0)).astype(jnp.float32)
        ct = ctg_ref[pl.ds(q0, t_g), :] * live  # (T_g, Cout)
        w = w_ref[:, :]

        d_acc = _unfold_w(ct, w, t_g, n_taps, cin, cout,
                          precision=precision)
        zc = jnp.zeros((t_g, 1), jnp.float32)

        # ONE walk: jax.vjp computes the chunk's PRIMAL output alongside
        # the pullback, so the acc needed for dW is accumulated here for
        # free — no separate forward-recompute pass.
        total_segs, seg = _group_segments(
            col, z0, z1, pstarts_ref, dims, n_cols, n_c
        )

        # segment-packed walk, mirroring _fwd_kernel; the two RMW '+='
        # windows of a chunk are disjoint slab pieces (sentinel-region
        # segments only ever add exact zeros, so even their overlap is
        # harmless — the adds are sequential within the chunk)
        def chunk_body(j, carry):
            dq_acc, acc = carry
            src0, len0 = seg(2 * j)
            src1, len1 = seg(2 * j + 1)
            cb = jnp.concatenate(
                [cpos_ref[pl.ds(src0, _SEG), :],
                 cpos_ref[pl.ds(src1, _SEG), :]], axis=0
            )
            cbt = _transpose2d(cb)
            fb = jnp.concatenate(
                [feats_ref[pl.ds(src0, _SEG), :],
                 feats_ref[pl.ds(src1, _SEG), :]], axis=0
            )
            valid = _pair_valid2(len0, len1, t_g)

            def f(a1, a2, a3, b1, b2, b3, fe):
                return _slab_contrib(
                    a1, a2, a3, b1, b2, b3, fe, valid, radius, ksize,
                    t_g, exclude_zero=self_mode, precision=precision,
                )

            (a, _cnt), vjpfn = jax.vjp(
                f, qx, qy, qz, cbt[0:1, :], cbt[1:2, :], cbt[2:3, :], fb
            )
            dqx, dqy, dqz, dcx, dcy, dcz, dfb = vjpfn((d_acc, zc))
            dcb = _transpose2d(
                jnp.concatenate([dcx, dcy, dcz], axis=0)
            )  # (2 * _SEG, 3)
            dc_ref[pl.ds(src0, _SEG), :] += jax.lax.slice(
                dcb, (0, 0), (_SEG, 3)
            )
            dc_ref[pl.ds(src1, _SEG), :] += jax.lax.slice(
                dcb, (_SEG, 0), (2 * _SEG, 3)
            )
            df_ref[pl.ds(src0, _SEG), :] += jax.lax.slice(
                dfb, (0, 0), (_SEG, cin)
            )
            df_ref[pl.ds(src1, _SEG), :] += jax.lax.slice(
                dfb, (_SEG, 0), (2 * _SEG, cin)
            )
            dq_acc = dq_acc + jnp.concatenate(
                [dqx, dqy, dqz], axis=1
            )  # (T_g, 3)
            return dq_acc, acc + a

        n_chunks = (total_segs + 1) // 2
        dq, acc = jax.lax.fori_loop(
            0, n_chunks, chunk_body,
            (jnp.zeros((t_g, 3), jnp.float32),
             jnp.zeros((n_taps * t_g, cin), jnp.float32)),
        )
        dq_ref[pl.ds(q0, t_g), :] += dq

        # dW[t] += acc_t^T @ ct (contraction over the T_g rows);
        # python-unrolled static ref slices (Mosaic loop/slice constraints)
        for t in range(n_taps):
            a = jax.lax.slice(acc, (t * t_g, 0), ((t + 1) * t_g, cin))
            blk = jax.lax.dot_general(
                a, ct, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # (Cin, Cout)
            dw_ref[pl.ds(t * cin, cin), :] += blk


# ---------------------------------------------------------------------------
# custom-VJP wrapper + public API
# ---------------------------------------------------------------------------


class _Cfg(NamedTuple):
    """Hashable static configuration (nondiff_argnums carrier)."""

    radius: float
    ksize: tuple
    t_g: int
    s_cap: int
    dims: tuple
    cin: int
    cout: int
    self_mode: bool
    n_q: int
    n_c: int
    ng: int
    interpret: bool
    precision: str


# Scoped-VMEM budget for the kernels. The default 16 MB limit rejects the
# backward at the 14k working point: every (N, 3) position/cotangent array
# tile-pads its lane dim 3 -> 128 (7.4 MB each at N=14464), and the widest
# layer (Cin=96) keeps feats + dfeats + w + dw resident too (~51 MB total).
# v5e VMEM is large enough (ops/segment_ops runs with a 100 MB budget).
_VMEM_LIMIT = 100 * 1024 * 1024


def _kernel_precision(name: str):
    """Mosaic's dot lowering supports only DEFAULT and HIGHEST — 'high'
    (bf16_3x) raises NotImplementedError on v5e (measured, round 5). The
    kernel's matmuls are small relative to its bandwidth work, so 'high'
    maps to f32-exact HIGHEST instead."""
    up = name.upper()
    if up == "HIGH":
        up = "HIGHEST"
    return getattr(jax.lax.Precision, up)


def _vmem_spec():
    return pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM)


def _run_fwd(cfg: _Cfg, qpos_s, cpos_s, feats_s, w2,
             gcol, gzlo, gzhi, gstart, pstarts):
    n_taps = cfg.ksize[0] * cfg.ksize[1] * cfg.ksize[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(cfg.ng,),
        in_specs=[_vmem_spec()] * 4,
        # dense-row revisited outputs (masked '+=' per group) — the padded
        # tail lets the last groups' T_g-row windows stay in bounds
        out_specs=[_vmem_spec(), _vmem_spec()],
    )
    kern = functools.partial(
        _fwd_kernel, radius=cfg.radius, ksize=cfg.ksize, t_g=cfg.t_g,
        s_cap=cfg.s_cap, dims=cfg.dims, cin=cfg.cin, cout=cfg.cout,
        self_mode=cfg.self_mode, n_c=cfg.n_c,
        precision=_kernel_precision(cfg.precision),
    )
    out, cnt = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qpos_s.shape[0], cfg.cout), jnp.float32),
            jax.ShapeDtypeStruct((qpos_s.shape[0], 8), jnp.float32),
        ],
        compiler_params=None if cfg.interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=cfg.interpret,
    )(gcol, gzlo, gzhi, gstart, pstarts, qpos_s, cpos_s, feats_s, w2)
    return out, cnt


def _run_bwd(cfg: _Cfg, qpos_s, cpos_s, feats_s, w2, ct_group,
             gcol, gzlo, gzhi, gstart, pstarts):
    n_taps = cfg.ksize[0] * cfg.ksize[1] * cfg.ksize[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(cfg.ng,),
        in_specs=[_vmem_spec()] * 5,  # ct is dense (N + pad, Cout) now
        out_specs=[_vmem_spec()] * 4,
    )
    kern = functools.partial(
        _bwd_kernel, radius=cfg.radius, ksize=cfg.ksize, t_g=cfg.t_g,
        s_cap=cfg.s_cap, dims=cfg.dims, cin=cfg.cin, cout=cfg.cout,
        self_mode=cfg.self_mode, n_c=cfg.n_c, n_q=cfg.n_q,
        precision=_kernel_precision(cfg.precision),
    )
    dq, dc, df, dw = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(qpos_s.shape, jnp.float32),
            jax.ShapeDtypeStruct(cpos_s.shape, jnp.float32),
            jax.ShapeDtypeStruct(feats_s.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_taps * cfg.cin, cfg.cout), jnp.float32),
        ],
        compiler_params=None if cfg.interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=cfg.interpret,
    )(gcol, gzlo, gzhi, gstart, pstarts, qpos_s, cpos_s, feats_s, w2,
      ct_group)
    return dq, dc, df, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_cconv_call(cfg: _Cfg, qpos_s, cpos_s, feats_s, w2,
                      gcol, gzlo, gzhi, gstart, pstarts):
    return _run_fwd(cfg, qpos_s, cpos_s, feats_s, w2,
                    gcol, gzlo, gzhi, gstart, pstarts)


def _fused_cconv_fwd(cfg, qpos_s, cpos_s, feats_s, w2,
                     gcol, gzlo, gzhi, gstart, pstarts):
    out = _run_fwd(cfg, qpos_s, cpos_s, feats_s, w2,
                   gcol, gzlo, gzhi, gstart, pstarts)
    return out, (qpos_s, cpos_s, feats_s, w2, gcol, gzlo, gzhi, gstart,
                 pstarts)


def _fused_cconv_bwd(cfg, res, cts):
    qpos_s, cpos_s, feats_s, w2, gcol, gzlo, gzhi, gstart, pstarts = res
    ct_out, _ct_cnt = cts  # counts are discrete — their cotangent is inert
    dq, dc, df, dw = _run_bwd(
        cfg, qpos_s, cpos_s, feats_s, w2, ct_out,
        gcol, gzlo, gzhi, gstart, pstarts,
    )
    return dq, dc, df, dw, None, None, None, None, None


_fused_cconv_call.defvjp(_fused_cconv_fwd, _fused_cconv_bwd)


def fused_cconv(
    weights: jax.Array,
    qplan: CConvPlan,
    qpos_s: jax.Array,
    cplan: CConvPlan,
    cpos_s: jax.Array,
    feats_s: jax.Array,
    radius: float,
    exclude_self: bool,
    interpret: bool | None = None,
    precision: str = "highest",
):
    """Fused continuous convolution over the 27-cell candidate range.

    weights: (kz, ky, kx, Cin, Cout) filter grid.
    qplan/qpos_s: query grouping + sorted query positions ((Nq + S, 3),
        from `sort_values(pos, qplan, pad_rows=S, pad_value=1e9)` so
        gradients flow through the permutation; (Nq + S, 3)).
    cplan/cpos_s/feats_s: candidate layout, sorted positions, sorted
        features ((Nc + S, Cin)). For fluid->fluid pass the SAME plan and
        position array as the query side with exclude_self=True: pairs at
        exactly zero distance are then excluded (Open3D ignore_query_point
        semantics — positional, so a coincident twin is excluded too).

    Returns (out (Nq, Cout) in SORTED query order, counts (Nq,) true
    in-radius neighbor counts). There is no neighbor cap and no slab
    capacity condition — the walk is exact for any occupancy; the plan's
    `overflow` flag (surfaced to callers) carries only the defensive
    group-count bound.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # geometric preconditions (not just in `slab_overflow`): the 27-cell
    # cover is only a superset of the true neighborhood when the cell size
    # is >= the radius, and the query groups index the candidate pstarts by
    # cell id — both plans must agree on the grid geometry. Violating either
    # would SILENTLY drop true neighbors, against the module's policy.
    if qplan.dims != cplan.dims:
        raise ValueError(
            f"query/candidate plans disagree on grid dims: "
            f"{qplan.dims} vs {cplan.dims}"
        )
    if radius > min(qplan.cell_size, cplan.cell_size) * (1 + 1e-6):
        raise ValueError(
            f"radius {radius} > plan cell_size "
            f"{min(qplan.cell_size, cplan.cell_size)}: the 27-cell candidate "
            f"cover would miss true neighbors"
        )
    kz, ky, kx = weights.shape[:3]
    cin, cout = weights.shape[3], weights.shape[4]
    w2 = weights.reshape(kz * ky * kx * cin, cout).astype(jnp.float32)
    t = qplan.group_size
    cfg = _Cfg(
        radius=float(radius), ksize=(kz, ky, kx), t_g=t,
        s_cap=cplan.slab_cap, dims=qplan.dims, cin=int(cin), cout=int(cout),
        self_mode=bool(exclude_self), n_q=qplan.n, n_c=cplan.n,
        ng=qplan.n_groups, interpret=bool(interpret),
        precision=str(precision),
    )
    out_d, cnt_d = _fused_cconv_call(
        cfg, qpos_s, cpos_s, feats_s, w2,
        qplan.gcol, qplan.gzlo, qplan.gzhi, qplan.gstart, cplan.pstarts,
    )
    # outputs land in dense sorted rows directly (masked in-kernel '+=');
    # drop the padding tail — no compaction gathers on this path
    return out_d[: qplan.n], cnt_d[: qplan.n, 0]

"""Continuous convolution over fixed-radius particle neighborhoods.

TPU-native re-implementation of the Open3D-ML `ContinuousConv` op that the
reference transition model depends on (reference models/transmodel.py:79-98,
Ummenhofer et al., "Lagrangian Fluid Simulation with Continuous Convolutions",
ICLR 2020). Semantics reproduced:

- relative neighbor offsets are normalized by radius = extent/2 and mapped
  from the unit ball to the unit cube with the *volume preserving* map
  (`coordinate_mapping='ball_to_cube_volume_preserving'`),
- the filter is a dense (kz, ky, kx, C_in, C_out) grid sampled by trilinear
  interpolation with `align_corners=True` (Open3D defaults),
- each neighbor contribution is scaled by the poly6 window evaluated on the
  *normalized squared* distance: w = clamp((1 - d^2/r^2)^3, 0, 1)
  (Open3D normalizes the squared distances returned by fixed_radius_search by
  r^2 before calling the window fn; reference models/transmodel.py:73-77),
- `normalize=False`: no division by the window sum.

Instead of translating the CUDA gather-scatter kernel, the TPU formulation
builds, per query, a dense tap-weight vector over the kz*ky*kx = T taps and
contracts with two einsums that both land on the MXU:

    TW[q, k, t]  = window[q,k] * sum_j w8[q,k,j] * onehot(corner[q,k,j] == t)
    B[q, t, c]   = sum_k TW[q, k, t] * feats[q, k, c]        (MXU)
    out[q, o]    = sum_{t,c} B[q, t, c] * W[t, c, o]         (MXU)

Everything is differentiable w.r.t. features, filter weights AND positions
(through the coordinate mapping and window), which is the property the whole
NeuroFluid pipeline depends on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from neurofluid_tpu.ops import segment_ops
from neurofluid_tpu.ops.neighbor_search import NeighborList

_EPS = 1e-8


def map_sphere_to_cylinder(xyz: jax.Array) -> jax.Array:
    """Volume-preserving (uniform-density-preserving) unit ball -> unit cylinder.

    Port of the analytic map used by Open3D-ML's coordinate transformation
    (cap region where (5/4) z^2 > x^2 + y^2 maps to the end discs, the side
    band maps to the lateral surface). Verified by Monte-Carlo uniformity
    tests in tests/test_cconv.py rather than by copying any implementation.
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    sq_norm = x * x + y * y + z * z
    norm = jnp.sqrt(jnp.maximum(sq_norm, 0.0))
    rho2 = x * x + y * y

    cap = 1.25 * z * z > rho2

    # cap branch: scale (x, y) by sqrt(3 r / (r + |z|)), send z to sign(z) * r
    s_cap = jnp.sqrt(3.0 * norm / (norm + jnp.abs(z) + _EPS))
    x_cap, y_cap = x * s_cap, y * s_cap
    z_cap = jnp.sign(z) * norm

    # side branch: push (x, y) out to radius r, stretch z by 3/2
    s_side = norm / jnp.sqrt(jnp.maximum(rho2, _EPS * _EPS))
    x_side, y_side = x * s_side, y * s_side
    z_side = 1.5 * z

    x_out = jnp.where(cap, x_cap, x_side)
    y_out = jnp.where(cap, y_cap, y_side)
    z_out = jnp.where(cap, z_cap, z_side)

    degenerate = sq_norm < _EPS * _EPS
    out = jnp.stack([x_out, y_out, z_out], axis=-1)
    return jnp.where(degenerate[..., None], 0.0, out)


def map_cylinder_to_cube(xyz: jax.Array) -> jax.Array:
    """Area-preserving disc -> square on (x, y) (inverse Shirley-Chiu
    concentric map), z unchanged: unit cylinder -> unit cube."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    rho2 = x * x + y * y
    rho = jnp.sqrt(jnp.maximum(rho2, 0.0))

    x_ge = jnp.abs(x) >= jnp.abs(y)
    # |x| >= |y| wedge: a = sign(x) rho, b = (4/pi) a atan(y/x)
    safe_x = jnp.where(jnp.abs(x) < _EPS, 1.0, x)
    safe_y = jnp.where(jnp.abs(y) < _EPS, 1.0, y)
    a1 = jnp.sign(x) * rho
    b1 = (4.0 / jnp.pi) * a1 * jnp.arctan(y / safe_x)
    # |y| > |x| wedge
    b2 = jnp.sign(y) * rho
    a2 = (4.0 / jnp.pi) * b2 * jnp.arctan(x / safe_y)

    u = jnp.where(x_ge, a1, a2)
    v = jnp.where(x_ge, b1, b2)

    degenerate = rho2 < _EPS * _EPS
    u = jnp.where(degenerate, 0.0, u)
    v = jnp.where(degenerate, 0.0, v)
    return jnp.stack([u, v, z], axis=-1)


def ball_to_cube_volume_preserving(xyz: jax.Array) -> jax.Array:
    """Compose ball->cylinder->cube; input in the unit ball, output in [-1,1]^3."""
    return map_cylinder_to_cube(map_sphere_to_cylinder(xyz))


def window_poly6(normalized_sq_dist: jax.Array) -> jax.Array:
    """Poly6 window on d^2/r^2 (reference models/transmodel.py:73-77)."""
    return jnp.clip((1.0 - normalized_sq_dist) ** 3, 0.0, 1.0)


def trilinear_taps(cube_xyz: jax.Array, kernel_size: tuple, align_corners: bool = True):
    """Trilinear interpolation corner indices + weights on the filter grid.

    cube_xyz (..., 3) in [-1, 1]; kernel_size (kz, ky, kx) with the Open3D
    axis convention: spatial axis 0 <- z, 1 <- y, 2 <- x.

    Returns (corner_tap (..., 8) int32 flat tap index, weight (..., 8)).
    """
    kz, ky, kx = kernel_size
    sizes = jnp.asarray([kx, ky, kz], cube_xyz.dtype)  # per coordinate x,y,z
    if align_corners:
        t = (cube_xyz * 0.5 + 0.5) * (sizes - 1.0)
    else:
        t = (cube_xyz * 0.5 + 0.5) * sizes - 0.5
    # clamp continuous coords into the valid interpolation range
    t = jnp.clip(t, 0.0, sizes - 1.0)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, jnp.asarray([kx - 2, ky - 2, kz - 2], jnp.int32))
    frac = t - i0.astype(t.dtype)  # in [0, 1]

    wx0, wy0, wz0 = 1.0 - frac[..., 0], 1.0 - frac[..., 1], 1.0 - frac[..., 2]
    wx1, wy1, wz1 = frac[..., 0], frac[..., 1], frac[..., 2]
    ix0, iy0, iz0 = i0[..., 0], i0[..., 1], i0[..., 2]
    ix1, iy1, iz1 = ix0 + 1, iy0 + 1, iz0 + 1

    corners = []
    weights = []
    for dz, wz in ((iz0, wz0), (iz1, wz1)):
        for dy, wy in ((iy0, wy0), (iy1, wy1)):
            for dx, wx in ((ix0, wx0), (ix1, wx1)):
                corners.append((dz * ky + dy) * kx + dx)
                weights.append(wz * wy * wx)
    return jnp.stack(corners, axis=-1), jnp.stack(weights, axis=-1)


def cconv_geometry(
    points: jax.Array,
    queries: jax.Array,
    neighbors: NeighborList,
    extent: float,
    kernel_size: tuple = (4, 4, 4),
    use_window: bool = True,
    align_corners: bool = True,
    plan=None,
):
    """Shared per-neighborhood conv geometry: everything that depends on
    POSITIONS but not on features or filters.

    A ParticleNet step runs 4 conv layers over the SAME fluid neighbor list
    (reference models/transmodel.py:116-131) — the reference's Open3D op
    redundantly re-searches and re-maps per layer on the GPU; here the
    ball->cube mapping, trilinear taps, and window are computed once and the
    position-gradient chain is shared by all layers' backward passes.

    Returns (corner (Q, K, 8) int32 flat tap ids [discrete, non-diff],
             tapw (Q, K, 8) float tap weights [diff w.r.t. positions],
             masked window already folded in).
    `plan` is an optional segment_ops.AdjointPlan for the shared backward
    sort of the position gather.
    """
    radius = extent / 2.0
    safe_idx = jnp.maximum(neighbors.idx, 0)
    if neighbors.xyz is not None and plan is not None:
        # selected coordinates were extracted by the search (emit_xyz=True);
        # only the backward (plan-based segment-sum into points) remains
        nb = segment_ops.gather3_values(
            points, safe_idx, *neighbors.xyz, plan.order, plan.starts
        )
    elif plan is not None:
        # ONE (Q, K) row gather of the (N, 3) table — measured 2x faster on
        # v5e than three per-coordinate gathers from (N,) columns
        rows = segment_ops.take_rows_planned(
            points, safe_idx, plan.order, plan.starts
        )
        nb = tuple(rows[..., ax] for ax in range(3))
    else:
        nb = segment_ops.take_columns3(points, safe_idx)
    off = [
        jnp.where(neighbors.mask, (nb[ax] - queries[:, ax, None]) / radius, 0.0)
        for ax in range(3)
    ]
    norm_sq = off[0] ** 2 + off[1] ** 2 + off[2] ** 2
    offsets = jnp.stack(off, axis=-1)
    cube = ball_to_cube_volume_preserving(offsets)
    corner, w8 = trilinear_taps(cube, kernel_size, align_corners)
    if use_window:
        w = window_poly6(norm_sq)
    else:
        w = jnp.ones_like(norm_sq)
    w = jnp.where(neighbors.mask, w, 0.0)
    return corner, w8 * w[..., None]


def cconv_tap_matrix(corner: jax.Array, tapw: jax.Array, num_taps: int):
    """Dense per-pair tap weights tw (Q, T, K): tw[q,t,k] = sum_j
    tapw[q,k,j] * [corner[q,k,j] == t].

    This tensor depends on POSITIONS only — a ParticleNet step runs 4 conv
    layers over the same fluid neighbor list, and rebuilding tw per layer
    (8 one-hot broadcast-multiply-adds over (Q, T, K)) was pure waste:
    compute it once per neighbor list and feed every layer's
    `continuous_conv_apply(..., tap_matrix=...)`. Differentiable w.r.t.
    positions through `tapw`.

    Layout is (Q, T, K) — taps BEFORE neighbors — so the per-layer
    contraction "qtk,qkc->qtc" has both operands in canonical batched-matmul
    order (batch q, lhs contracts its minor dim, rhs its major non-batch
    dim). The previous (Q, K, T) layout made XLA materialize a transposed
    copy of the tensor per layer per direction (the f32[C, Q/2, 128]
    "data formatting" copies in the round-3 transition trace)."""
    q, k = corner.shape[:2]
    tw = jnp.zeros((q, num_taps, k), tapw.dtype)
    for j in range(corner.shape[-1]):
        oh = jax.nn.one_hot(corner[:, :, j], num_taps, dtype=tapw.dtype, axis=1)
        tw = tw + oh * tapw[:, :, j][:, None, :]
    return tw


def _cconv_apply_chunk(chunk, filters: jax.Array, num_taps: int,
                       precision=jax.lax.Precision.HIGHEST):
    """One query chunk: corner (C,K,8), tapw (C,K,8), feats (C,K,Cin)
    -> out (C, Cout). corner/tapw may instead be (tw, None) with tw a
    precomputed (C, K, T) tap matrix (see cconv_tap_matrix)."""
    corner, tapw, feats_nb = chunk
    if tapw is None:
        tw = corner  # precomputed (C, T, K) tap matrix
    else:
        # tap weights accumulated over the 8 trilinear corners WITHOUT ever
        # materializing the (C, 8, T, K) one-hot tensor — at reference
        # particle counts that tensor (stacked across lax.map chunks for the
        # backward) was the single largest allocation of the transition train
        # step (2 GB unpadded, 4 GB padded) and blew v5e HBM in the
        # 2-step-rollout trainer. (C, T, K) layout: see cconv_tap_matrix.
        c_, k_ = corner.shape[:2]
        tw = jnp.zeros((c_, num_taps, k_), feats_nb.dtype)
        for j in range(corner.shape[-1]):
            oh = jax.nn.one_hot(
                corner[:, :, j], num_taps, dtype=feats_nb.dtype, axis=1
            )
            tw = tw + oh * tapw[:, :, j][:, None, :]
    # precision=HIGHEST keeps the contraction inputs in full f32: the default
    # (bf16 operands on the MXU) loses ~1e-3 on the physics features, which is
    # too coarse for the position-gradient path the simulator depends on.
    # HIGH (bf16_3x, ~1e-6 relative error) is the measured-safe fast option —
    # trainers select it via ParticleNet.conv_precision after the TPU quality
    # pin; HIGHEST stays the default.
    basis = jnp.einsum(
        "qtk,qkc->qtc", tw, feats_nb, precision=precision
    )  # (C,T,Cin)
    out = jnp.einsum(
        "qtc,tco->qo",
        basis,
        filters,
        precision=precision,
        # accumulate in at least f32, but never downcast f64 inputs
        preferred_element_type=jnp.result_type(basis.dtype, jnp.float32),
    )
    return out


def continuous_conv_apply(
    filters: jax.Array,
    corner: jax.Array,
    tapw: jax.Array,
    feats: jax.Array,
    neighbors: NeighborList,
    kernel_size: tuple = (4, 4, 4),
    query_chunk: int = 4096,
    plan=None,
    precision=jax.lax.Precision.HIGHEST,
    tap_matrix: jax.Array | None = None,
) -> jax.Array:
    """Contract per-layer features against precomputed conv geometry.

    filters (kz, ky, kx, Cin, Cout); corner/tapw from `cconv_geometry`;
    feats (N, Cin) input features gathered at neighbors.idx. When
    `tap_matrix` (Q, K, T) is given (cconv_tap_matrix — shared across every
    layer convolving the same neighbor list), corner/tapw are ignored.
    """
    kz, ky, kx = kernel_size
    num_taps = kz * ky * kx
    cin, cout = filters.shape[-2], filters.shape[-1]
    filters_flat = filters.reshape(num_taps, cin, cout)

    safe_idx = jnp.maximum(neighbors.idx, 0)
    if plan is not None:
        gathered = segment_ops.take_rows_planned(
            feats, safe_idx, plan.order, plan.starts
        )
    else:
        gathered = segment_ops.take_rows(feats, safe_idx)
    nb_feats = jnp.where(neighbors.mask[..., None], gathered, 0.0)
    # Offer the gathered (Q, K, Cin) features as a named checkpoint residual:
    # under the transition trainer's 2-step remat, recomputing them in the
    # backward re-runs one of the step's most expensive ops (a ~917k-row
    # gather, ~9 ms each at the watercube point, 3 fluid layers x 2 rollout
    # steps). Policies that also save "nbr_feats" (see
    # train/transition.py) trade ~350 MB HBM per layer-step for skipping
    # those re-gathers; policies that don't are unaffected.
    nb_feats = checkpoint_name(nb_feats, "nbr_feats")

    if tap_matrix is not None:
        geom = (tap_matrix,)
    else:
        geom = (corner, tapw)
    q = nb_feats.shape[0]
    chunk = min(query_chunk, max(q, 1))
    n_chunks = max(1, -(-q // chunk))
    pad = n_chunks * chunk - q

    def chunk_fn(args):
        *g, fc = args
        if len(g) == 1:
            return _cconv_apply_chunk(
                (g[0], None, fc), filters=filters_flat, num_taps=num_taps,
                precision=precision,
            )
        return _cconv_apply_chunk(
            (g[0], g[1], fc), filters=filters_flat, num_taps=num_taps,
            precision=precision,
        )

    # remat each chunk: lax.map otherwise STACKS every chunk's conv
    # intermediates as backward residuals (n_chunks x the per-chunk
    # footprint); recomputing the cheap contraction in the backward keeps
    # the peak at one chunk
    fn = jax.checkpoint(chunk_fn)
    if n_chunks == 1:
        return fn(geom + (nb_feats,))

    def pad_r(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)).reshape(
            (n_chunks, chunk) + x.shape[1:]
        )

    chunks = tuple(pad_r(x) for x in geom) + (pad_r(nb_feats),)
    return jax.lax.map(fn, chunks).reshape(-1, cout)[:q]


def continuous_conv(
    filters: jax.Array,
    points: jax.Array,
    feats: jax.Array,
    queries: jax.Array,
    neighbors: NeighborList,
    extent: float,
    kernel_size: tuple = (4, 4, 4),
    use_window: bool = True,
    align_corners: bool = True,
    query_chunk: int = 4096,
) -> jax.Array:
    """Continuous convolution: aggregate neighbor features into queries.

    filters: (kz, ky, kx, C_in, C_out) dense filter grid.
    points/feats: (N, 3)/(N, C_in) input point cloud.
    queries: (Q, 3) output positions.
    neighbors: fixed-K NeighborList of `points` around `queries`
               (search radius must equal extent / 2).
    extent: full filter extent (Open3D convention; radius = extent / 2).

    Returns (Q, C_out). Matches Open3D ContinuousConv with normalize=False.
    (Single-shot convenience wrapper; multi-layer consumers should compute
    `cconv_geometry` once and call `continuous_conv_apply` per layer.)
    """
    corner, tapw = cconv_geometry(
        points, queries, neighbors, extent,
        kernel_size=kernel_size, use_window=use_window,
        align_corners=align_corners,
    )
    return continuous_conv_apply(
        filters, corner, tapw, feats, neighbors,
        kernel_size=kernel_size, query_chunk=query_chunk,
    )

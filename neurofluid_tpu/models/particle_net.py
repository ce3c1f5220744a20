"""ParticleNet: learned Lagrangian fluid transition model (flax linen).

Behavioral contract from the reference `ParticleNet`
(reference models/transmodel.py:14-163), which follows DeepLagrangianFluids:

1. semi-implicit Euler with gravity: v' = v + g dt; x' = x + (v + v')/2 dt
   (reference :100-104; dt = 1/50, g = (0, -9.81, 0) by default, scenes
   override with z-up gravity via config),
2. position correction from 4 rounds of continuous convolutions over
   fixed-radius neighborhoods with filter extent
   6 * radius_scale(1.5) * particle_radius(0.025) = 0.225 (reference :35):
   - layer 0: three parallel branches — fluid->fluid CConv on features
     [1, v'] (4ch), box->fluid CConv on box normals (3ch), and a dense layer —
     each to 32 channels, concatenated as [obstacle, fluid, dense] (96ch)
     (reference :111-120),
   - layers 1-3: ReLU -> (CConv + Dense)(+ residual when widths match) with
     channels 96->64->64->3 (reference :122-131),
   - output scaled by 1/128 (reference :141),
3. x'' = x' + dx; v'' = (x'' - x)/dt (reference :144-148),
4. also returns the per-particle fluid neighbor count used by the weighted
   training loss (reference :133-138).

TPU design: neighbor search returns fixed-K padded lists (one fluid search
and one box search per step, REUSED by all four conv layers — the reference's
Open3D op re-searches per layer on identical positions; here the re-use is
free because the query/input positions are the same). All convs contract on
the MXU via `ops.cconv.continuous_conv`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from neurofluid_tpu.ops import cconv as cconv_ops
from neurofluid_tpu.ops import fused_cconv
from neurofluid_tpu.ops import fused_query
from neurofluid_tpu.ops import neighbor_search as ns
from neurofluid_tpu.ops import segment_ops


def _name_static(nbrs: "ns.NeighborList", plan):
    """Tag the non-differentiable neighbor products as named residuals.

    The transition trainer remats each rollout step (HBM), but the searches,
    adjoint-plan sorts and tap-corner indices inside are DISCRETE — their
    gradients are zero by construction, so recomputing them in the backward
    (the default under plain `jax.checkpoint`) buys no memory for the
    autodiff chain and costs the full search again. Tagging them lets the
    trainer's `save_only_these_names("nbr_static")` policy keep exactly
    these (a few (N, K) int32 arrays, ~tens of MB) while everything
    float-differentiable is still rematerialized."""

    def tag(x):
        return checkpoint_name(x, "nbr_static")

    nbrs = nbrs._replace(
        idx=tag(nbrs.idx), mask=tag(nbrs.mask), count=tag(nbrs.count),
        xyz=None if nbrs.xyz is None else tuple(tag(c) for c in nbrs.xyz),
    )
    plan = plan._replace(order=tag(plan.order), starts=tag(plan.starts))
    return nbrs, plan


def _tag_cconv_plan(plan: "fused_cconv.CConvPlan"):
    """`nbr_static` tags for the fused-cconv plan's DISCRETE arrays (sort
    order, cell ranges, groupings) — same rationale as `_name_static`: the
    rollout trainers' remat policy keeps these across the backward instead of
    re-running the per-step cell sort + searchsorted plan build."""

    def tag(x):
        return checkpoint_name(x, "nbr_static")

    return plan._replace(
        order=tag(plan.order), inv_rank=tag(plan.inv_rank),
        pstarts=tag(plan.pstarts), gcol=tag(plan.gcol), gzlo=tag(plan.gzlo),
        gzhi=tag(plan.gzhi), gstart=tag(plan.gstart),
    )


class ContinuousConvLayer(nn.Module):
    """Learnable continuous convolution layer (Open3D ContinuousConv analog).

    Consumes precomputed conv geometry (`cconv_ops.cconv_geometry`) so that
    the position-dependent work — gathers, ball->cube mapping, taps, window —
    is shared across every layer that convolves over the same NeighborList.
    """

    filters: int
    kernel_size: tuple = (4, 4, 4)
    query_chunk: int = 4096
    precision: str = "highest"  # 'highest' (f32-exact) | 'high' (bf16_3x)

    @nn.compact
    def __call__(self, feats, neighbors, corner, tapw, plan=None,
                 tap_matrix=None, fused=None):
        # `fused`: (qplan, qpos_s, cplan, cpos_s, radius, exclude_self) —
        # run the selection-free fused Pallas op (ops/fused_cconv) instead of
        # the NeighborList pipeline. `feats` is then the SORTED padded
        # candidate feature array and the output is in sorted query order.
        in_ch = feats.shape[-1]
        kz, ky, kx = self.kernel_size
        # glorot over (receptive taps * in_ch, taps * out_ch) — conv-style fan
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (kz, ky, kx, in_ch, self.filters),
            jnp.float32,
        )
        # Open3D's ContinuousConv carries a bias (use_bias=True default) that
        # the reference never disables; kept for checkpoint-level parity.
        bias = self.param(
            "bias", nn.initializers.zeros, (self.filters,), jnp.float32
        )
        if fused is not None:
            qplan, qpos_s, cplan, cpos_s, radius, exclude_self = fused
            out, counts = fused_cconv.fused_cconv(
                kernel, qplan, qpos_s, cplan, cpos_s, feats, radius,
                exclude_self=exclude_self, precision=self.precision,
            )
            return out + bias, counts
        out = cconv_ops.continuous_conv_apply(
            kernel,
            corner,
            tapw,
            feats,
            neighbors,
            kernel_size=self.kernel_size,
            query_chunk=self.query_chunk,
            plan=plan,
            precision=getattr(jax.lax.Precision, self.precision.upper()),
            tap_matrix=tap_matrix,
        )
        return out + bias


class ParticleNet(nn.Module):
    layer_channels: tuple = (32, 64, 64, 3)
    kernel_size: tuple = (4, 4, 4)
    radius_scale: float = 1.5
    particle_radius: float = 0.025
    timestep: float = 1.0 / 50.0
    gravity: tuple = (0.0, -9.81, 0.0)
    other_feats_channels: int = 0
    correction_scale: float = 1.0 / 128.0
    # static-shape neighbor caps (fluid: ~47 at rest density for r=0.1125
    # with 0.05 spacing; 64 leaves headroom — overflow keeps the K nearest)
    fluid_neighbor_k: int = 64
    obstacle_neighbor_k: int = 48
    # 'brute' | 'grid' | 'auto' | 'fused' (ops/fused_query compact lists) |
    # 'fused_cconv' (ops/fused_cconv selection-free fused conv — no neighbor
    # lists at all; exact uncapped reference semantics)
    search_backend: str = "auto"
    # fused_cconv grouping knobs (see ops/fused_cconv.GROUP_SIZE/SLAB_CAP).
    # fused_slab_cap only sizes the sentinel/feature padding — the
    # segment-packed walk is exact for ANY occupancy (fused_cconv.py
    # "NO CAPACITY CONDITION"), so there is nothing to tune for splashy
    # states. fused_cell_scale >= 1 coarsens the plan's cell size (cell =
    # scale * radius): fewer columns/groups (cheaper plan + interpret
    # mode) but longer candidate slabs (more masked pair work).
    fused_group_size: int = 16
    fused_slab_cap: int = 128
    fused_cell_scale: float = 1.0
    # Grid bounds hug the reference's fluid container (x,y in ±0.975,
    # z in [-0.975, 2.4302] after the z-up rotation) plus slack; particles
    # escaping the bounds clamp to border cells (rare transients). Tight
    # bounds matter: the scatter-free table build costs O(num_cells * cap)
    # gathers, and the old (-1.5..1.5, -1.5..3) cover was 2.5x more cells.
    grid_lower: tuple = (-1.05, -1.05, -1.05)
    grid_upper: tuple = (1.05, 1.05, 2.55)
    # cell = r = 0.1125 holds ~11 particles at rest density (0.05 spacing);
    # 32 gives ~3x compression headroom. Overflow past the cap is FLAGGED via
    # the diag output (never silent), at which point the trainer raises.
    grid_max_per_cell: int = 32
    query_chunk: int = 4096
    # When set (inside shard_map over a mesh axis of this name), pos/vel are
    # treated as per-device shards of the particle set: neighbor search and
    # conv inputs all_gather the full set over ICI each layer, outputs stay
    # sharded. This is the spatial-parallel path for large scenes — a new
    # capability over the single-GPU reference (SURVEY.md 2.4).
    shard_axis: str | None = None
    # halo_size > 0 (with shard_axis) switches from per-layer all_gather to
    # SLAB HALO EXCHANGE: shards own contiguous slabs along spatial coordinate
    # `halo_axis` (caller contract: particles globally sorted by that
    # coordinate before splitting), and each layer ppermutes only the
    # halo_size boundary particles to/from the two adjacent shards — ICI
    # traffic O(halo * C) per layer instead of O(N * C). Insufficiency is
    # detected, never silent: the diag carries `halo_overflow` (more than
    # halo_size particles within `radius` of a slab face, or a slab narrower
    # than the search radius so a 2-away shard could hold in-radius
    # neighbors) and it is OR-ed into grid_overflow for the trainers'
    # fail-loudly policy.
    halo_size: int = 0
    halo_axis: int = 0
    # MXU precision of the conv contractions: 'highest' = f32-exact
    # (bf16_6x passes), 'high' = bf16_3x (~1e-6 relative, ~2x faster).
    # TPU trainers/bench pick 'high' after the quality pin validated it.
    conv_precision: str = "highest"

    @property
    def filter_extent(self) -> float:
        return 6.0 * self.radius_scale * self.particle_radius

    def integrate_pos_vel(self, pos, vel):
        """Apply gravity with midpoint integration (reference :100-104)."""
        dt = self.timestep
        g = jnp.asarray(self.gravity, pos.dtype)
        vel_new = vel + g * dt
        pos_new = pos + (vel + vel_new) / 2.0 * dt
        return pos_new, vel_new

    def make_grid(self, points):
        """Search acceleration structure over `points` at this model's
        geometry. For the STATIC boundary particles this should be built once
        per scene and passed to `__call__(..., box_grid=...)` — the box never
        moves, and a per-step rebuild costs ~25 ms at the watercube working
        point. Returns a `CellGrid` for the list/grid backends, or a
        candidate-only `fused_cconv.CConvPlan` for the 'fused_cconv' backend
        (both flow through the same `box_grid` argument)."""
        cell = max(self.filter_extent / 2.0, 1e-6)
        if self.search_backend == "fused_cconv" and self.shard_axis is None:
            return fused_cconv.build_plan(
                points, self.grid_lower, self.grid_upper,
                max(cell * self.fused_cell_scale, 1e-6),
                with_groups=False, slab_cap=self.fused_slab_cap,
            )
        return ns.build_cell_grid(
            points, self.grid_lower, self.grid_upper, cell,
            max_per_cell=self.grid_max_per_cell,
        )

    def _search(self, queries, points, radius, k, exclude_self, grid=None,
                points_valid=None):
        """Returns (NeighborList, grid_overflow). grid_overflow is True when a
        grid cell exceeded `grid_max_per_cell` and tail candidates were
        dropped — the result may then be missing in-radius neighbors. Callers
        MUST surface this (see `__call__`'s diag output); silently dropping
        it corrupts physics (a compressed state packs >cap points per cell).

        `points_valid` (N,) bool marks masked halo slots: excluded from grid
        tables; the brute path excludes them via their 1e9 sentinel coords."""
        backend = self.search_backend
        if backend == "auto":
            backend = "grid" if points.shape[0] >= 4096 else "brute"
        if backend == "fused" and points_valid is None and self.shard_axis is None:
            # order-insensitive compact search (ops/fused_query): one Pallas
            # kernel, no top-k sort, no candidate-wide payload extraction.
            # The conv sums are permutation-invariant so the selection-order
            # deviation is inert whenever count <= k; count > k raises the
            # cap_exceeded flag exactly as with the ordered path. Halo
            # sharding keeps the generic grid path (valid-mask support).
            if grid is None:
                cell = max(radius, 1e-6)
                grid = ns.build_cell_grid(
                    points, self.grid_lower, self.grid_upper, cell,
                    max_per_cell=self.grid_max_per_cell,
                )
            return fused_query.ball_query_compact(
                queries, grid, self.grid_lower, self.grid_upper, radius, k,
                exclude_self=exclude_self,
            )
        if backend == "fused":
            backend = "grid"  # halo / valid-mask paths
        if backend == "grid" or grid is not None:
            if grid is None:
                cell = max(radius, 1e-6)
                grid = ns.build_cell_grid(
                    points, self.grid_lower, self.grid_upper, cell,
                    max_per_cell=self.grid_max_per_cell, valid=points_valid,
                )
            result, overflow = ns.radius_search_grid(
                queries, grid, radius, k,
                order="nearest", inclusive=True, exclude_self=exclude_self,
                query_chunk=self.query_chunk,
            )
            return result, overflow
        result = ns.radius_search_brute(
            queries, points, radius, k,
            order="nearest", inclusive=True, exclude_self=exclude_self,
            query_chunk=self.query_chunk,
        )
        return result, jnp.asarray(False)

    def _halo_plan(self, pos_new, radius):
        """Slab halo exchange plan (shard_map body; see `halo_size` docs).

        Caller contract: each device owns a contiguous slab along coordinate
        `halo_axis` (particles globally sorted by it before splitting), so the
        send-right candidates are a static SUFFIX slice and the send-left
        candidates a static PREFIX slice — no top-k, no compaction. Returns
        (extend_pos, extend_feats, valid_mask, halo_overflow):

        - extend_pos(p):   (Nl,3) -> (Nl+2H,3); masked halo slots read 1e9
          (outside every search radius; excluded from grid tables via the
          valid mask).
        - extend_feats(f): (Nl,C) -> (Nl+2H,C); masked slots read 0. Called
          per conv layer — 2 ppermutes of (H, C) over ICI replace the
          all_gather of (N, C).
        - halo_overflow: True anywhere the static halo is insufficient —
          more than H particles within `radius` of a slab face, or a shard
          two hops away could hold in-radius neighbors (slab narrower than
          the radius). All-reduced; never silently wrong.
        """
        axn = self.shard_axis
        H = int(self.halo_size)
        n_local = pos_new.shape[0]
        if H > n_local:
            raise ValueError(f"halo_size {H} > local particles {n_local}")

        def from_shift(x, s):
            # value of x on device (axis_index + s); zeros where absent
            n = jax.lax.axis_size(axn)
            perm = [(i, i - s) for i in range(n) if 0 <= i - s < n]
            return jax.lax.ppermute(x, axn, perm)

        c = jax.lax.stop_gradient(pos_new[:, self.halo_axis])
        hi, lo = jnp.max(c), jnp.min(c)
        suf_mask = c[-H:] > hi - radius  # candidates for the right neighbor
        pre_mask = c[:H] < lo + radius   # candidates for the left neighbor
        over = jnp.logical_or(
            jnp.sum((c > hi - radius).astype(jnp.int32)) > H,
            jnp.sum((c < lo + radius).astype(jnp.int32)) > H,
        )
        # Slots are ordered by the PRE-integration coordinate; membership in
        # the boundary band uses the POST-integration coordinate c. A particle
        # that moved into the band while sitting outside the H-slot window
        # would be silently not exchanged — flag it even when the band count
        # stays <= H (fail-loudly contract).
        over = jnp.logical_or(over, jnp.any(c[:-H] > hi - radius))
        over = jnp.logical_or(over, jnp.any(c[H:] < lo + radius))
        # 2-hop violation: shard d+2's slab starts within radius of ours
        one = jnp.ones((1,), jnp.float32)
        lo_p2 = from_shift(lo[None], 2)
        exists_p2 = from_shift(one, 2) > 0.5
        over = jnp.logical_or(over, jnp.any(exists_p2 & (lo_p2 - hi < radius)))
        halo_over = jax.lax.psum(over.astype(jnp.int32), axn) > 0

        r_msk = from_shift(suf_mask.astype(jnp.float32), -1) > 0.5  # from d-1
        l_msk = from_shift(pre_mask.astype(jnp.float32), 1) > 0.5   # from d+1
        valid = jnp.concatenate(
            [jnp.ones((n_local,), bool), r_msk, l_msk], axis=0
        )

        def extend_pos(p):
            r = jnp.where(r_msk[:, None], from_shift(p[-H:], -1), 1e9)
            l = jnp.where(l_msk[:, None], from_shift(p[:H], 1), 1e9)
            return jnp.concatenate([p, r, l], axis=0)

        def extend_feats(f):
            r = jnp.where(r_msk[:, None], from_shift(f[-H:], -1), 0.0)
            l = jnp.where(l_msk[:, None], from_shift(f[:H], 1), 0.0)
            return jnp.concatenate([f, r, l], axis=0)

        return extend_pos, extend_feats, valid, halo_over

    def _fused_forward(self, pos, pos_new, vel_new, box, box_feats, feats,
                       return_diag, box_plan):
        """Selection-free fused-CConv step (ops/fused_cconv): the whole layer
        stack runs in cell-SORTED particle order — one cell sort per step, no
        neighbor lists, no K caps, no per-layer gathers; the conv sums are
        the EXACT uncapped reference semantics (reference
        models/transmodel.py:80-131, Open3D's uncapped fixed_radius_search).
        `box_plan` is the candidate-only CConvPlan from `make_grid` (static
        box: built once per scene); rebuilt here when absent."""
        extent = self.filter_extent
        radius = extent / 2.0
        cell = max(radius * self.fused_cell_scale, 1e-6)
        qplan = fused_cconv.build_plan(
            pos_new, self.grid_lower, self.grid_upper, cell,
            group_size=self.fused_group_size, slab_cap=self.fused_slab_cap,
        )
        if not isinstance(box_plan, fused_cconv.CConvPlan):
            box_plan = fused_cconv.build_plan(
                box, self.grid_lower, self.grid_upper, cell,
                with_groups=False, slab_cap=self.fused_slab_cap,
            )
        # geometry precondition + the defensive group-bound flag; there is
        # no slab capacity condition (exact at any occupancy)
        overflow = fused_cconv.slab_overflow(qplan, box_plan)
        qplan = _tag_cconv_plan(qplan)
        S = qplan.slab_cap
        qpos_s = fused_cconv.sort_values(
            pos_new, qplan, pad_rows=S, pad_value=fused_cconv._SENTINEL
        )

        fluid_feats = [jnp.ones_like(pos_new[:, :1]), vel_new]
        if feats is not None:
            fluid_feats.append(feats)
        fluid_feats = jnp.concatenate(fluid_feats, axis=-1)
        ff = fused_cconv.sort_values(fluid_feats, qplan)  # sorted, unpadded
        bfeats_s = fused_cconv.sort_values(
            box_feats, box_plan, pad_rows=box_plan.slab_cap
        )
        fused_self = (qplan, qpos_s, qplan, qpos_s, radius, True)
        fused_box = (qplan, qpos_s, box_plan, box_plan.pos_s, radius, False)

        def pad0(x):
            return jnp.concatenate(
                [x, jnp.zeros((S,) + x.shape[1:], x.dtype)], axis=0
            )

        conv_args = dict(kernel_size=self.kernel_size,
                         query_chunk=self.query_chunk,
                         precision=self.conv_precision)
        c0 = self.layer_channels[0]
        ans_fluid, counts = ContinuousConvLayer(
            c0, name="conv0_fluid", **conv_args
        )(pad0(ff), None, None, None, fused=fused_self)
        ans_obstacle, _ = ContinuousConvLayer(
            c0, name="conv0_obstacle", **conv_args
        )(bfeats_s, None, None, None, fused=fused_box)
        ans_dense = nn.Dense(c0, name="dense0_fluid")(ff)

        # concat order [obstacle, fluid, dense] (reference :120); everything
        # stays in sorted order until the single unsort at the end
        h = jnp.concatenate([ans_obstacle, ans_fluid, ans_dense], axis=-1)
        for i, ch in enumerate(self.layer_channels[1:], start=1):
            inp = nn.relu(h)
            ans_conv, _ = ContinuousConvLayer(ch, name=f"conv{i}", **conv_args)(
                pad0(inp), None, None, None, fused=fused_self
            )
            ans_d = nn.Dense(ch, name=f"dense{i}")(inp)
            if ch == h.shape[-1]:
                h = ans_conv + ans_d + h  # residual (reference :127-128)
            else:
                h = ans_conv + ans_d

        pos_correction = fused_cconv.unsort_values(
            self.correction_scale * h, qplan
        )
        pos_corrected = pos_new + pos_correction
        vel_corrected = (pos_corrected - pos) / self.timestep
        num_fluid_neighbors = fused_cconv.unsort_values(
            counts[:, None], qplan
        )[:, 0]
        if return_diag:
            # no K caps exist on this path — `cap_exceeded` is structurally
            # impossible; `grid_overflow` carries the slab/group capacity flag
            diag = {
                "grid_overflow": overflow,
                "cap_exceeded": jnp.asarray(False),
            }
            return pos_corrected, vel_corrected, num_fluid_neighbors, diag
        return pos_corrected, vel_corrected, num_fluid_neighbors

    @nn.compact
    def __call__(self, pos, vel, box, box_feats, feats=None, return_diag=False,
                 box_grid=None):
        """One transition step.

        pos, vel: (N, 3) fluid particle state.
        box, box_feats: (M, 3) boundary particles and their normals.
        feats: optional (N, F) extra per-particle features.
        box_grid: optional prebuilt `CellGrid` over `box` (see `make_grid`) —
        the boundary is static, so trainers build it once per scene / rollout
        instead of once per step.

        Returns (pos_corrected, vel_corrected, num_fluid_neighbors) or, with
        `return_diag`, a 4th element: a dict of search-health flags
        {"grid_overflow", "cap_exceeded"} that trainers MUST check on host —
        either flag means the static-shape caps truncated real neighborhoods
        (grid cell fuller than `grid_max_per_cell`, or more in-radius
        neighbors than `fluid_neighbor_k`/`obstacle_neighbor_k`; the conv
        then sees only the K nearest, where the reference's Open3D search is
        uncapped, reference models/transmodel.py:80-98).
        """
        extent = self.filter_extent
        radius = extent / 2.0

        # boundary particles are data, not trainable, and nothing upstream
        # needs their gradients (the reference also never differentiates the
        # box); stopping them here kills the useless (and on TPU, extremely
        # slow) scatter-adjoints of the box gathers
        box = jax.lax.stop_gradient(box)
        box_feats = jax.lax.stop_gradient(box_feats)

        pos_new, vel_new = self.integrate_pos_vel(pos, vel)

        if self.search_backend == "fused_cconv" and self.shard_axis is None:
            return self._fused_forward(
                pos, pos_new, vel_new, box, box_feats, feats, return_diag,
                box_grid,
            )

        halo_over = jnp.asarray(False)
        halo_valid = None
        if self.shard_axis is not None and self.halo_size > 0:
            extend_pos, extend_feats, halo_valid, halo_over = self._halo_plan(
                pos_new, radius
            )
        elif self.shard_axis is not None:
            def extend_pos(x):
                return jax.lax.all_gather(x, self.shard_axis, axis=0, tiled=True)

            extend_feats = extend_pos
        else:
            extend_pos = extend_feats = lambda x: x

        all_pos_new = extend_pos(pos_new)

        fluid_feats = [jnp.ones_like(pos_new[:, :1]), vel_new]
        if feats is not None:
            fluid_feats.append(feats)
        fluid_feats = jnp.concatenate(fluid_feats, axis=-1)
        all_fluid_feats = extend_feats(fluid_feats)

        fluid_nbrs, ov_fluid = self._search(
            pos_new, all_pos_new, radius, self.fluid_neighbor_k,
            exclude_self=True, points_valid=halo_valid,
        )
        ov_fluid = jnp.logical_or(ov_fluid, halo_over)
        box_nbrs, ov_box = self._search(
            pos_new, box, radius, self.obstacle_neighbor_k, exclude_self=False,
            grid=box_grid,
        )

        # conv geometry (gathers, ball->cube map, taps, window) + the adjoint
        # sort plans are computed ONCE per neighbor list and shared by all
        # four conv layers — the reference re-searches and re-maps per layer
        # (Open3D op, reference models/transmodel.py:116-131)
        fluid_plan = segment_ops.adjoint_plan(fluid_nbrs.idx, all_pos_new.shape[0])
        box_plan = segment_ops.adjoint_plan(box_nbrs.idx, box.shape[0])
        # tag BEFORE first use: downstream consumers (geometry, convs) must
        # read the tagged values or their backward recompute would re-run
        # the searches and plan sorts they feed on
        fluid_nbrs, fluid_plan = _name_static(fluid_nbrs, fluid_plan)
        box_nbrs, box_plan = _name_static(box_nbrs, box_plan)
        geo_args = dict(kernel_size=self.kernel_size, use_window=True,
                        align_corners=True)
        fl_corner, fl_tapw = cconv_ops.cconv_geometry(
            all_pos_new, pos_new, fluid_nbrs, extent, plan=fluid_plan, **geo_args
        )
        bx_corner, bx_tapw = cconv_ops.cconv_geometry(
            box, pos_new, box_nbrs, extent, plan=box_plan, **geo_args
        )
        fl_corner = checkpoint_name(fl_corner, "nbr_static")
        bx_corner = checkpoint_name(bx_corner, "nbr_static")

        conv_args = dict(kernel_size=self.kernel_size,
                         query_chunk=self.query_chunk,
                         precision=self.conv_precision)
        c0 = self.layer_channels[0]
        # the fluid tap matrix is shared by all FOUR fluid conv layers (the
        # box list feeds one layer only — not worth materializing its tw)
        kz, ky, kx = self.kernel_size
        fl_tw = cconv_ops.cconv_tap_matrix(fl_corner, fl_tapw, kz * ky * kx)
        ans_fluid = ContinuousConvLayer(c0, name="conv0_fluid", **conv_args)(
            all_fluid_feats, fluid_nbrs, None, None, plan=fluid_plan,
            tap_matrix=fl_tw,
        )
        ans_obstacle = ContinuousConvLayer(c0, name="conv0_obstacle", **conv_args)(
            box_feats, box_nbrs, bx_corner, bx_tapw, plan=box_plan
        )
        ans_dense = nn.Dense(c0, name="dense0_fluid")(fluid_feats)

        # concat order [obstacle, fluid, dense] (reference :120)
        h = jnp.concatenate([ans_obstacle, ans_fluid, ans_dense], axis=-1)

        for i, ch in enumerate(self.layer_channels[1:], start=1):
            inp = nn.relu(h)
            ans_conv = ContinuousConvLayer(ch, name=f"conv{i}", **conv_args)(
                extend_feats(inp), fluid_nbrs, None, None, plan=fluid_plan,
                tap_matrix=fl_tw,
            )
            ans_d = nn.Dense(ch, name=f"dense{i}")(inp)
            if ch == h.shape[-1]:
                h = ans_conv + ans_d + h  # residual (reference :127-128)
            else:
                h = ans_conv + ans_d

        pos_correction = self.correction_scale * h

        pos_corrected = pos_new + pos_correction
        vel_corrected = (pos_corrected - pos) / self.timestep

        num_fluid_neighbors = fluid_nbrs.count.astype(jnp.float32)
        if return_diag:
            diag = {
                "grid_overflow": jnp.logical_or(ov_fluid, ov_box),
                "cap_exceeded": jnp.logical_or(
                    jnp.any(fluid_nbrs.count > self.fluid_neighbor_k),
                    jnp.any(box_nbrs.count > self.obstacle_neighbor_k),
                ),
            }
            return pos_corrected, vel_corrected, num_fluid_neighbors, diag
        return pos_corrected, vel_corrected, num_fluid_neighbors

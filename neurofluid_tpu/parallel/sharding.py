"""Multi-chip sharded execution paths (jax.sharding + shard_map + GSPMD).

New capability over the single-GPU reference (SURVEY.md section 2.4). Two
orthogonal strategies, matching the workload's natural axes:

1. **Ray sharding** (`make_sharded_e2e_step`, `make_sharded_render_fn`):
   the renderer is the FLOP hot spot and is embarrassingly parallel over
   rays. The full e2e train step is jitted with the ray batch sharded over
   the mesh and parameters/particle state replicated; GSPMD partitions the
   per-ray pipeline (sampling -> search -> features -> MLP -> compositing)
   and inserts psum for the gradient all-reduce over ICI. This replaces the
   reference's host-side 1024-ray Python chunk loop
   (reference trainer/basetrainer.py:282-298) with one SPMD program.

2. **Particle sharding** (`make_sharded_particle_step`): spatial parallelism
   for large scenes via shard_map — each device owns a particle shard,
   all_gathers the (much smaller) position/feature set per conv layer over
   ICI, and keeps state + correction computation local.

3. **Halo-exchange particle sharding** (`make_halo_particle_step`): shards
   own contiguous SLABS along a spatial axis (particles pre-sorted by that
   coordinate); each conv layer ppermutes only the fixed-size boundary halo
   between adjacent shards — ICI traffic O(halo * C) per layer instead of
   O(N * C), which is what makes particle counts beyond single-chip HBM
   feasible. Halo insufficiency is detected and flagged (fail-loudly), never
   silently wrong (see ParticleNet._halo_plan).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neurofluid_tpu.train.e2e import make_e2e_train_step


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharding(mesh: Mesh, axis_name: str = "rays") -> NamedSharding:
    """(V, R, ...) ray batches sharded along R."""
    return NamedSharding(mesh, P(None, axis_name))


def shard_ray_batch(x, mesh: Mesh, axis_name: str = "rays"):
    return jax.device_put(x, ray_sharding(mesh, axis_name))


def make_sharded_render_fn(renderer, mesh: Mesh, axis_name: str = "rays"):
    """jit-compiled full-batch renderer with rays sharded over the mesh.

    rays (R, 6) sharded; particles/params replicated. Returns the renderer's
    result dict with per-ray outputs sharded the same way.
    """
    repl = replicated(mesh)
    rshard = NamedSharding(mesh, P(axis_name))

    def render(params, particles, ro, rays):
        return renderer.apply(params, particles, ro, rays)

    return jax.jit(
        render,
        in_shardings=(repl, repl, repl, rshard),
    )


def make_sharded_e2e_step(
    transition, renderer, opt_r, opt_t, bounds, bd_weight,
    mesh: Mesh, axis_name: str = "rays",
):
    """The full end-to-end train step with the ray batch sharded over the mesh.

    Identical math to the single-chip step (same factory), so single-chip and
    multi-chip training are bit-compatible up to reduction order.
    """
    step = make_e2e_train_step(transition, renderer, opt_r, opt_t, bounds, bd_weight)
    repl = replicated(mesh)
    rays3 = ray_sharding(mesh, axis_name)  # (V, R, C)

    in_shardings = (
        repl, repl, repl, repl,  # params_r, params_t, opt states
        repl, repl, repl, repl,  # pos, vel, box, normals
        repl,                    # ro_v
        rays3, rays3,            # rays_v, rgbs_v
    )
    return jax.jit(step, in_shardings=in_shardings, donate_argnums=(0, 1, 2, 3))


class ShardMapTransition:
    """Duck-typed ParticleNet whose `apply` runs the wrapped net under
    shard_map over a particle mesh axis (all_gather strategy inside the
    net via its `shard_axis`). Lets `make_e2e_train_step` compose particle
    sharding with GSPMD ray sharding in ONE jitted program — the "the two
    compose" path (docs/DESIGN.md Multi-chip design)."""

    def __init__(self, net, mesh: Mesh, axis_name: str = "particles"):
        if net.shard_axis != axis_name:
            raise ValueError(
                f"net.shard_axis {net.shard_axis!r} != axis {axis_name!r}"
            )
        self.net = net
        self.mesh = mesh
        self.axis_name = axis_name

    def init(self, *args, **kw):
        return self.net.init(*args, **kw)

    def make_grid(self, points):
        return self.net.make_grid(points)

    @property
    def search_backend(self):
        return self.net.search_backend

    def apply(self, params, pos, vel, box, nrm, return_diag=False,
              box_grid=None):
        import jax.numpy as jnp

        ax = self.axis_name

        def local(params_, pos_, vel_, box_, nrm_):
            out = self.net.apply(
                params_, pos_, vel_, box_, nrm_, return_diag=return_diag
            )
            if not return_diag:
                return out
            p, v, nn, diag = out
            # replicate the health flags across shards (fail-loudly: every
            # device must see every shard's overflow)
            diag = {
                k: jax.lax.psum(f.astype(jnp.int32), ax) > 0
                for k, f in diag.items()
            }
            return p, v, nn, diag

        out_specs = (P(ax), P(ax), P(ax))
        if return_diag:
            out_specs = out_specs + (P(),)
        return jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(ax), P(ax), P(), P()),
            out_specs=out_specs, check_vma=False,
        )(params, pos, vel, box, nrm)


def make_composed_e2e_step(
    transition_factory, renderer, opt_r, opt_t, bounds, bd_weight,
    mesh: Mesh, ray_axis: str = "rays", particle_axis: str = "particles",
):
    """Full e2e train step on a 2-D mesh: the transition model shard_mapped
    over `particle_axis` (each device owns a particle shard; all_gather over
    ICI inside), its sharded output feeding the renderer whose ray batch is
    GSPMD-sharded over `ray_axis`, with ONE loss differentiated through
    both and both optimizers applied — rays x particles composed in a
    single program. `transition_factory(shard_axis)` builds the ParticleNet.

    Same step function as `make_sharded_e2e_step` (ray sharding is the
    degenerate particle_axis=1 case); no reference counterpart — the
    reference is single-GPU (SURVEY.md 2.4)."""
    net = transition_factory(particle_axis)
    shim = ShardMapTransition(net, mesh, particle_axis)
    step = make_e2e_train_step(shim, renderer, opt_r, opt_t, bounds, bd_weight)
    repl = replicated(mesh)
    rays3 = NamedSharding(mesh, P(None, ray_axis))
    pshard = NamedSharding(mesh, P(particle_axis))
    in_shardings = (
        repl, repl, repl, repl,      # params + opt states
        pshard, pshard, repl, repl,  # pos, vel, box, normals
        repl, rays3, rays3,          # ro_v, rays_v, rgbs_v
    )
    return jax.jit(step, in_shardings=in_shardings, donate_argnums=(0, 1, 2, 3))


def make_spmd_e2e_step(
    transition_factory, renderer, opt_r, opt_t, bounds, bd_weight,
    mesh: Mesh, ray_axis: str = "rays", particle_axis: str = "particles",
):
    """Composed e2e train step as ONE explicit-SPMD program (shard_map over
    the whole step) — the scaling-book-style alternative to the GSPMD path
    of `make_composed_e2e_step`.

    Device layout on the ('particles', 'rays') mesh:
    - particle state sharded over `particle_axis` (replicated over
      `ray_axis`); the transition step runs per device on its shard
      (all_gather over ICI inside, via ParticleNet.shard_axis),
    - the ray batch sharded jointly over BOTH axes (each ray owned by
      exactly one device); the renderer runs on the local rays against the
      all_gathered predicted particles,
    - the loss is assembled from ownership-weighted local sums (each rgb
      term owned once; the per-particle boundary term, replicated across
      the ray axis, is pre-divided by that axis size) and psum'd over both
      axes, so the psum'd per-device gradients are exactly the global
      gradient; both Adam updates then run replicated.

    Why this exists (and is the dryrun's composed stage): compiling the
    same step through GSPMD jit costs ~9x the base compile (the SPMD
    partitioner walks every one of the ~10k ops), while shard_map compiles
    the per-device program directly — same collectives, same math, minutes
    -> seconds on single-core driver hosts, and on TPU it sidesteps the
    partitioner for the framework's largest graph. Math pinned against the
    replicated `make_e2e_train_step` in parallel/dryrun.py and
    tests/test_sharding.py. No reference counterpart (single-GPU,
    SURVEY.md 2.4)."""
    import jax.numpy as jnp
    import optax

    net = transition_factory(particle_axis)

    def local_step(params_r, params_t, opt_r_state, opt_t_state,
                   pos, vel, box, nrm, ro_v, rays_v, rgbs_v):
        pp = jax.lax.axis_size(particle_axis)
        rr = jax.lax.axis_size(ray_axis)
        n_global = pos.shape[0] * pp
        rays_global = rays_v.shape[1] * pp * rr

        def loss_fn(pr, pt):
            pred_pos, pred_vel, _nn, diag = net.apply(
                pt, pos, vel, box, nrm, return_diag=True
            )
            full_pos = jax.lax.all_gather(
                pred_pos, particle_axis, axis=0, tiled=True
            )

            def render_view(ro, rays):
                return renderer.apply(pr, full_pos, ro, rays)

            outs = jax.vmap(render_view)(ro_v, rays_v)

            # LOCAL owned-once loss contribution — deliberately NO psum
            # inside the differentiated function (under the legacy shard_map
            # semantics psum transposes to psum, which would inflate every
            # gradient by the device count); the global loss and gradients
            # are psum'd OUTSIDE the grad, which is exact because every
            # elementary term below is owned by exactly one device.
            def local_mse_sum(x):  # (V, R_local, 3) -> scalar, global denom
                return jnp.sum(x) / (rays_global * x.shape[2])

            rgb_local = local_mse_sum((outs["rgb0"] - rgbs_v) ** 2) \
                + local_mse_sum((outs["rgb1"] - rgbs_v) ** 2)
            # per-particle term: owned by the particle shard, replicated
            # across the ray axis -> pre-divide by the ray-axis size so the
            # both-axes psum counts each particle exactly once
            from neurofluid_tpu.train import losses as L

            bd_local = jnp.sum(
                jnp.abs(pred_pos - L.clip_to_box(pred_pos, bounds))
            ) / (3.0 * n_global * rr)
            total_local = rgb_local + bd_weight * bd_local
            overflow = jnp.logical_or(
                diag["grid_overflow"], jnp.any(outs["overflow"])
            )
            aux = {
                "pred_pos": pred_pos, "pred_vel": pred_vel,
                "search_overflow": overflow,
            }
            return total_local, aux

        (loss_local, aux), (g_r, g_t) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params_r, params_t)
        # ownership-weighted loss terms => the global loss/gradient is
        # exactly the sum of the per-device values
        loss = jax.lax.psum(loss_local, (particle_axis, ray_axis))
        g_r, g_t = jax.lax.psum((g_r, g_t), (particle_axis, ray_axis))
        aux["search_overflow"] = jax.lax.psum(
            aux["search_overflow"].astype(jnp.int32),
            (particle_axis, ray_axis),
        ) > 0
        up_r, opt_r_state = opt_r.update(g_r, opt_r_state, params_r)
        params_r = optax.apply_updates(params_r, up_r)
        up_t, opt_t_state = opt_t.update(g_t, opt_t_state, params_t)
        params_t = optax.apply_updates(params_t, up_t)
        next_pos = jax.lax.stop_gradient(aux.pop("pred_pos"))
        next_vel = jax.lax.stop_gradient(aux.pop("pred_vel"))
        aux["grad_norm_renderer"] = optax.global_norm(g_r)
        aux["grad_norm_transition"] = optax.global_norm(g_t)
        return (params_r, params_t, opt_r_state, opt_t_state, loss,
                next_pos, next_vel, aux)

    pax, rax = particle_axis, ray_axis
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),            # params + opt states (replicated)
            P(pax), P(pax), P(), P(),      # pos, vel, box, normals
            P(),                            # ro_v
            P(None, (pax, rax)),            # rays_v (V, R, 6)
            P(None, (pax, rax)),            # rgbs_v
        ),
        out_specs=(
            P(), P(), P(), P(), P(),
            P(pax), P(pax), P(),
        ),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2, 3))


def make_sharded_particle_step(net_factory, params_axis_mesh: Mesh,
                               axis_name: str = "particles"):
    """Particle-sharded transition step via shard_map.

    `net_factory(shard_axis)` must build the ParticleNet with the given
    shard_axis (e.g. `lambda ax: ParticleNet(shard_axis=ax, ...)`). Returns
    step(params, pos_shard, vel_shard, box, nrm) operating on per-device
    particle shards (N must divide the mesh size).
    """
    net = net_factory(axis_name)
    mesh = params_axis_mesh

    def local_step(params, pos, vel, box, nrm):
        return net.apply(params, pos, vel, box, nrm)

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_halo_particle_step(net_factory, mesh: Mesh,
                            axis_name: str = "particles"):
    """Halo-exchange particle-sharded transition step via shard_map.

    `net_factory(shard_axis)` must build the ParticleNet with the given
    shard_axis AND halo_size > 0. Input pos/vel must be globally sorted by
    the net's `halo_axis` coordinate before splitting into shards (each
    device then owns a contiguous spatial slab). Returns
    step(params, pos, vel, box, nrm) -> (pos', vel', num_nn, diag) with diag
    flags all-reduced over the mesh (replicated) — `grid_overflow` includes
    halo insufficiency and MUST be checked by callers (fail-loudly policy).
    """
    import jax.numpy as jnp

    net = net_factory(axis_name)
    if net.halo_size <= 0:
        raise ValueError("make_halo_particle_step needs halo_size > 0")

    def local_step(params, pos, vel, box, nrm):
        p, v, nn, diag = net.apply(params, pos, vel, box, nrm, return_diag=True)
        # replicate the health flags: every device must see every shard's
        # overflow, else out_specs P() would silently take shard 0's copy
        diag = {
            k: jax.lax.psum(v.astype(jnp.int32), axis_name) > 0
            for k, v in diag.items()
        }
        return p, v, nn, diag

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
        check_vma=False,
    )
    return jax.jit(sharded)

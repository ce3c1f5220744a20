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

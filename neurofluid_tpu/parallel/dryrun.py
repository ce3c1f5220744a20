"""Multi-chip dry run: compile + execute the FULL e2e training step over an
n-device mesh on tiny shapes, plus the particle-sharded transition step.

Used by __graft_entry__.dryrun_multichip (driver validation on a virtual CPU
mesh) and by tests/test_sharding.py (subprocess on 8 virtual CPU devices).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from neurofluid_tpu.models.particle_net import ParticleNet
from neurofluid_tpu.models.render_net import RenderNet
from neurofluid_tpu.parallel.mesh import make_mesh
from neurofluid_tpu.parallel.sharding import (
    make_halo_particle_step,
    make_sharded_e2e_step,
    make_sharded_particle_step,
    shard_ray_batch,
)
from neurofluid_tpu.train import losses
from neurofluid_tpu.train.e2e import make_e2e_train_step


def _tiny_problem(n_devices: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    n_particles = 64 * max(1, n_devices)  # divisible by the mesh
    n_rays = 16 * max(1, n_devices)
    n_views = 2
    pos = rng.uniform(-0.3, 0.3, size=(n_particles, 3)).astype(np.float32)
    vel = rng.normal(size=(n_particles, 3)).astype(np.float32) * 0.05
    box = rng.uniform(-0.6, 0.6, size=(48, 3)).astype(np.float32)
    nrm = np.tile(np.asarray([0, 0, 1.0], np.float32), (48, 1))
    ro = np.tile(np.asarray([0, 0, 2.0], np.float32), (n_views, 1))
    d = rng.normal(size=(n_views, n_rays, 3)).astype(np.float32)
    d[..., 2] -= 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(ro[:, None, :], d.shape)
    rays = np.concatenate([o, d], -1)
    rgbs = rng.uniform(size=(n_views, n_rays, 3)).astype(np.float32)
    return pos, vel, box, nrm, ro, rays, rgbs


def build_tiny_models(search_backend: str = "brute"):
    transition = ParticleNet(search_backend=search_backend, fluid_neighbor_k=16,
                             obstacle_neighbor_k=8)
    renderer = RenderNet(
        near=1.0, far=3.0, n_samples=4, n_importance=4, nerf_depth=2,
        nerf_width=32, num_neighbors=4, search_backend=search_backend,
    )
    return transition, renderer


def run_e2e_step(n_devices: int, sharded: bool = True, seed: int = 0):
    """Build everything, run ONE full e2e train step; returns host outputs."""
    mesh = make_mesh(n_devices) if sharded else None
    pos, vel, box, nrm, ro, rays, rgbs = _tiny_problem(n_devices, seed)
    transition, renderer = build_tiny_models()

    key = jax.random.PRNGKey(0)
    params_t = transition.init(
        key, jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(box), jnp.asarray(nrm)
    )
    params_r = renderer.init(
        key, jnp.asarray(pos), jnp.asarray(ro[0]), jnp.asarray(rays[0])
    )
    opt_r = optax.adam(1e-3)
    opt_t = optax.adam(1e-4)
    opt_r_state = opt_r.init(params_r)
    opt_t_state = opt_t.init(params_t)
    bounds = losses.default_box_bounds()

    if sharded:
        step = make_sharded_e2e_step(
            transition, renderer, opt_r, opt_t, bounds, 1.0, mesh
        )
        rays_in = shard_ray_batch(jnp.asarray(rays), mesh)
        rgbs_in = shard_ray_batch(jnp.asarray(rgbs), mesh)
    else:
        step = jax.jit(
            make_e2e_train_step(transition, renderer, opt_r, opt_t, bounds, 1.0)
        )
        rays_in = jnp.asarray(rays)
        rgbs_in = jnp.asarray(rgbs)

    out = step(
        params_r, params_t, opt_r_state, opt_t_state,
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(box), jnp.asarray(nrm),
        jnp.asarray(ro), rays_in, rgbs_in,
    )
    (params_r, params_t, opt_r_state, opt_t_state,
     loss, next_pos, next_vel, aux) = out
    return {
        "loss": float(loss),
        "next_pos": np.asarray(next_pos),
        "grad_norm_renderer": float(aux["grad_norm_renderer"]),
        "grad_norm_transition": float(aux["grad_norm_transition"]),
    }


def run_particle_sharded_step(n_devices: int, seed: int = 0):
    """Particle-sharded transition step vs the replicated step; returns both."""
    mesh = make_mesh(n_devices, axis_name="particles")
    pos, vel, box, nrm, *_ = _tiny_problem(n_devices, seed)

    def factory(axis):
        return ParticleNet(search_backend="brute", fluid_neighbor_k=16,
                           obstacle_neighbor_k=8, shard_axis=axis)

    net_ref = factory(None)
    params = net_ref.init(
        jax.random.PRNGKey(0),
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(box), jnp.asarray(nrm),
    )
    ref_pos, ref_vel, ref_nn = net_ref.apply(
        params, jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(box), jnp.asarray(nrm)
    )

    step = make_sharded_particle_step(factory, mesh)
    sh_pos, sh_vel, sh_nn = step(
        params, jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(box), jnp.asarray(nrm)
    )
    return (
        np.asarray(ref_pos), np.asarray(sh_pos),
        np.asarray(ref_nn), np.asarray(sh_nn),
    )


def run_halo_particle_step(n_devices: int, seed: int = 0, halo_size: int = 32,
                           search_backend: str = "brute",
                           n_per_device: int = 64):
    """Halo-exchange particle-sharded step vs the replicated step.

    Particles are globally sorted along x (halo_axis=0) and spread so each
    shard's slab is wider than the search radius (the caller contract the
    halo strategy documents). `search_backend='grid'` exercises the
    per-shard cell-grid build with the `points_valid` halo-slot masking
    (masked slots carry sentinel coordinates and must be excluded from the
    tables)."""
    mesh = make_mesh(n_devices, axis_name="particles")
    rng = np.random.default_rng(seed)
    n = n_per_device * max(1, n_devices)
    pos = rng.uniform(-0.3, 0.3, size=(n, 3)).astype(np.float32)
    # stretch x so each of the n slabs is wider than radius (0.1125)
    pos[:, 0] *= max(1.0, 0.55 * n_devices)
    pos = pos[np.argsort(pos[:, 0])]  # slab contract: sorted by halo_axis
    vel = (rng.normal(size=(n, 3)) * 0.05).astype(np.float32)
    box = rng.uniform(-0.6, 0.6, size=(48, 3)).astype(np.float32)
    nrm = np.tile(np.asarray([0, 0, 1.0], np.float32), (48, 1))

    # halo-extended x coordinates span the whole container, so the grid
    # bounds must cover the stretched positions on the grid backend
    span = float(np.abs(pos[:, 0]).max()) + 0.2
    kw = dict(search_backend=search_backend, fluid_neighbor_k=16,
              obstacle_neighbor_k=8, halo_axis=0,
              grid_lower=(-span, -1.05, -1.05), grid_upper=(span, 1.05, 2.55))

    def factory(axis):
        return ParticleNet(shard_axis=axis, halo_size=halo_size, **kw)

    net_ref = factory(None)
    args = tuple(jnp.asarray(a) for a in (pos, vel, box, nrm))
    params = net_ref.init(jax.random.PRNGKey(0), *args)
    ref_pos, _, ref_nn = net_ref.apply(params, *args)

    step = make_halo_particle_step(factory, mesh)
    sh_pos, _, sh_nn, diag = step(params, *args)
    return (
        np.asarray(ref_pos), np.asarray(sh_pos),
        np.asarray(ref_nn), np.asarray(sh_nn),
        {k: bool(v) for k, v in diag.items()},
    )


def run_halo_lattice_step(n_devices: int, dims=(48, 24, 12),
                          halo_size: int = 1024,
                          search_backend: str = "grid", jitter: float = 0.004,
                          seed: int = 0):
    """Halo-exchange step at REFERENCE particle density and scale: a
    48x24x12 jittered rest-spacing lattice (13,824 particles — the protocol
    working point count — at the DFSPH rest spacing 0.05) split into
    x-slabs. The x-extent is 2.4, so each of 8 slabs is ~0.30 wide — a
    realistic slab-decomposition aspect (comfortably wider than the 0.1125
    search radius; a 24^3 cube would give 0.124-wide slabs, inside the
    contract's margin). Each slab face has ~650-810
    particles in its exchange band (24*12*(radius/spacing) plus jitter
    boundary effects); halo_size=1024 gives ~25% headroom and stays well
    under the 1,728 local slab size. Grid backend: per-shard
    tables over the halo-extended positions with sentinel-slot masking
    (`points_valid`).

    Returns (ref_pos, sh_pos, ref_nn, sh_nn, diag) like
    `run_halo_particle_step`."""
    mesh = make_mesh(n_devices, axis_name="particles")
    rng = np.random.default_rng(seed)
    spacing = 0.05
    gx = (np.arange(dims[0], dtype=np.float32) - dims[0] / 2 + 0.5) * spacing
    gy = (np.arange(dims[1], dtype=np.float32) - dims[1] / 2 + 0.5) * spacing
    gz = (np.arange(dims[2], dtype=np.float32) + 0.5) * spacing
    x, y, z = np.meshgrid(gx, gy, gz, indexing="ij")
    pos = np.stack([x, y, z], -1).reshape(-1, 3)
    pos += rng.normal(scale=jitter, size=pos.shape).astype(np.float32)
    n = len(pos)
    pad = (-n) % n_devices
    if pad:
        pos = np.concatenate([pos, pos[:pad] + 0.001])
    pos = pos[np.argsort(pos[:, 0])]
    vel = (rng.normal(size=pos.shape) * 0.05).astype(np.float32)
    box = rng.uniform(-0.6, 0.6, size=(128, 3)).astype(np.float32)
    nrm = np.tile(np.asarray([0, 0, 1.0], np.float32), (128, 1))

    # grid bounds must cover the 2.4-wide x-extent (the defaults hug the
    # reference container)
    kw = dict(search_backend=search_backend, halo_axis=0,
              fluid_neighbor_k=64, obstacle_neighbor_k=16,
              grid_max_per_cell=32,
              grid_lower=(-1.35, -0.8, -0.8), grid_upper=(1.35, 0.8, 0.8))

    def factory(axis):
        return ParticleNet(shard_axis=axis, halo_size=halo_size, **kw)

    net_ref = factory(None)
    args = tuple(jnp.asarray(a) for a in (pos, vel, box, nrm))
    params = net_ref.init(jax.random.PRNGKey(0), *args)
    ref_pos, _, ref_nn = net_ref.apply(params, *args)

    step = make_halo_particle_step(factory, mesh)
    sh_pos, _, sh_nn, diag = step(params, *args)
    return (
        np.asarray(ref_pos), np.asarray(sh_pos),
        np.asarray(ref_nn), np.asarray(sh_nn),
        {k: bool(v) for k, v in diag.items()},
    )


def run_composed_step(n_devices: int, seed: int = 0):
    """Rays x particles COMPOSED sharding in one program (docs/DESIGN.md's
    "the two compose" claim, previously untested).

    A 2-D mesh ('particles', 'rays'): the transition step runs under
    shard_map over the 'particles' axis (all_gather strategy; replicated
    across the 'rays' axis), its output feeds the renderer whose ray batch
    is GSPMD-sharded over the 'rays' axis, and ONE loss differentiates
    through both — GSPMD inserts the particle all-gather at the handoff and
    the gradient reductions over both axes. Returns (composed, replicated)
    dicts of {loss, grad-norms} for comparison.
    """
    from jax.sharding import NamedSharding

    if n_devices % 2:
        raise ValueError("composed mesh needs an even device count")
    pp = 2
    rr = n_devices // pp
    devices = np.asarray(jax.devices()[:n_devices]).reshape(pp, rr)
    mesh = jax.sharding.Mesh(devices, ("particles", "rays"))

    pos, vel, box, nrm, ro, rays, rgbs = _tiny_problem(n_devices, seed)
    rays1 = rays[0]  # (R, 6) single view
    rgbs1 = rgbs[0]
    transition, renderer = build_tiny_models()
    key = jax.random.PRNGKey(0)
    args = tuple(jnp.asarray(a) for a in (pos, vel, box, nrm))
    params_t = transition.init(key, *args)
    params_r = renderer.init(key, args[0], jnp.asarray(ro[0]), jnp.asarray(rays1))

    sharded_net = ParticleNet(search_backend="brute", fluid_neighbor_k=16,
                              obstacle_neighbor_k=8, shard_axis="particles")

    def make_step(use_mesh: bool):
        def tstep_local(pt, pos_, vel_, box_, nrm_):
            net = sharded_net if use_mesh else transition
            return net.apply(pt, pos_, vel_, box_, nrm_)

        if use_mesh:
            tstep = jax.shard_map(
                tstep_local, mesh=mesh,
                in_specs=(P(), P("particles"), P("particles"), P(), P()),
                out_specs=(P("particles"), P("particles"), P("particles")),
                check_vma=False,
            )
        else:
            tstep = tstep_local

        def step(pr, pt, pos_, vel_, box_, nrm_, ro_, rays_, rgbs_):
            def loss_fn(pr_, pt_):
                p2, v2, nn = tstep(pt_, pos_, vel_, box_, nrm_)
                out = renderer.apply(pr_, p2, ro_, rays_)
                return (
                    jnp.mean((out["rgb1"] - rgbs_) ** 2)
                    + jnp.mean((out["rgb0"] - rgbs_) ** 2)
                    + 1e-3 * jnp.mean(nn)
                )

            loss, (g_r, g_t) = jax.value_and_grad(loss_fn, argnums=(0, 1))(pr, pt)
            return loss, optax.global_norm(g_r), optax.global_norm(g_t)

        if use_mesh:
            repl = NamedSharding(mesh, P())
            return jax.jit(step, in_shardings=(
                repl, repl,
                NamedSharding(mesh, P("particles")),
                NamedSharding(mesh, P("particles")),
                repl, repl, repl,
                NamedSharding(mesh, P("rays")),
                NamedSharding(mesh, P("rays")),
            ))
        return jax.jit(step)

    inputs = (params_r, params_t, *args, jnp.asarray(ro[0]),
              jnp.asarray(rays1), jnp.asarray(rgbs1))
    c_loss, c_gr, c_gt = make_step(True)(*inputs)
    r_loss, r_gr, r_gt = make_step(False)(*inputs)
    as_dict = lambda l, gr, gt: {
        "loss": float(l), "grad_norm_r": float(gr), "grad_norm_t": float(gt)
    }
    return as_dict(c_loss, c_gr, c_gt), as_dict(r_loss, r_gr, r_gt)


def dryrun_multichip(n_devices: int) -> None:
    """Driver entry: full sharded e2e train step + particle-sharded step
    (all_gather strategy) + halo-exchange particle-sharded step (brute AND
    grid backends — the grid run exercises the per-shard table build with
    `points_valid` halo masking) + a reference-scale (13,824-particle
    lattice) grid halo step."""
    result = run_e2e_step(n_devices, sharded=True)
    assert np.isfinite(result["loss"]), result
    assert np.all(np.isfinite(result["next_pos"]))
    ref_pos, sh_pos, ref_nn, sh_nn = run_particle_sharded_step(n_devices)
    np.testing.assert_array_equal(ref_nn, sh_nn)
    np.testing.assert_allclose(ref_pos, sh_pos, atol=1e-5)
    for backend in ("brute", "grid"):
        h_ref, h_sh, h_rnn, h_snn, h_diag = run_halo_particle_step(
            n_devices, search_backend=backend
        )
        assert not h_diag["grid_overflow"], (backend, h_diag)
        np.testing.assert_array_equal(h_rnn, h_snn)
        np.testing.assert_allclose(h_ref, h_sh, atol=1e-5)
    l_ref, l_sh, l_rnn, l_snn, l_diag = run_halo_lattice_step(n_devices)
    assert not l_diag["grid_overflow"], l_diag
    np.testing.assert_array_equal(l_rnn, l_snn)
    np.testing.assert_allclose(l_ref, l_sh, atol=1e-4)
    comp, repl = run_composed_step(n_devices)
    np.testing.assert_allclose(comp["loss"], repl["loss"], rtol=1e-5)
    np.testing.assert_allclose(
        comp["grad_norm_r"], repl["grad_norm_r"], rtol=1e-4
    )
    np.testing.assert_allclose(
        comp["grad_norm_t"], repl["grad_norm_t"], rtol=1e-4
    )
    print(
        f"dryrun_multichip({n_devices}): e2e loss={result['loss']:.6f}, "
        f"particle-sharded step matches replicated (max diff "
        f"{np.abs(ref_pos - sh_pos).max():.2e}), halo-exchange step matches "
        f"replicated on brute+grid backends (max diff "
        f"{np.abs(h_ref - h_sh).max():.2e}), 13.8k-particle lattice grid halo "
        f"matches (max diff {np.abs(l_ref - l_sh).max():.2e}), composed "
        f"rays x particles step matches replicated "
        f"(loss {comp['loss']:.6f} vs {repl['loss']:.6f})"
    )

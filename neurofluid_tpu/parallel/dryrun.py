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


def build_tiny_models(search_backend: str = "brute",
                      kernel_size: tuple = (4, 4, 4)):
    """`kernel_size=(2, 2, 2)` shrinks the CConv tap matrices — the XLA:CPU
    compile hog (measured on this host: the composed spmd step compiles in
    28 s at (2, 2, 2) vs 165+ s at (4, 4, 4)); the sharding/collective
    structure under test is identical, so the composed dryrun stage uses
    it."""
    transition = ParticleNet(search_backend=search_backend, fluid_neighbor_k=16,
                             obstacle_neighbor_k=8, kernel_size=kernel_size)
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


def run_composed_step(n_devices: int, seed: int = 0, impl: str = "spmd"):
    """Rays x particles COMPOSED sharding in ONE program — the full e2e
    train step (transition + renderer + both Adam updates) on a 2-D
    ('particles', 'rays') mesh, through a PRODUCTION path:

    - impl='spmd' (default): parallel/sharding.make_spmd_e2e_step — one
      shard_map over the whole step (explicit collectives; compiles the
      per-device program directly, seconds instead of minutes on
      single-core driver hosts),
    - impl='gspmd': parallel/sharding.make_composed_e2e_step — shard_map
      transition nested in a GSPMD-ray-sharded jit (the partitioner pays
      ~9x the base compile; exercised by the slow test suite).

    The replicated reference is the plain SINGLE-DEVICE jit of the same
    step factory. Both programs use (2, 2, 2) CConv taps: measured on this
    host (round 5, solo), the tap matrices were the XLA:CPU compile hog —
    spmd 165 s -> 28 s and replicated 213 s -> 19 s vs (4, 4, 4) — while
    the sharding/collective structure under test is unchanged. (The eager
    op-by-op alternative costs ~400 s: one tiny XLA:CPU compile per
    distinct primitive/shape.)
    Returns (composed, replicated) dicts of {loss, grad-norms, next_pos}."""
    from neurofluid_tpu.parallel.sharding import (
        make_composed_e2e_step,
        make_spmd_e2e_step,
    )
    import time as _time

    _t0 = _time.time()

    def _mark(msg):
        # sub-stage progress: the composed stage is the dryrun's wall-clock
        # long pole on 1-core driver hosts, so a driver-timeout tail must
        # show WHERE it was (compile vs execute, spmd vs replicated)
        print(f"[composed +{_time.time() - _t0:6.1f}s] {msg}", flush=True)

    if n_devices % 2:
        raise ValueError("composed mesh needs an even device count")
    # 2x2 SUBMESH when >= 4 devices are available: on XLA:CPU every virtual
    # device's per-step program executes SERIALLY on the host's one core at
    # ~17 ms/thunk (measured round 5: the 8-device composed step EXECUTES in
    # 263 s vs a 24 s compile — thunk dispatch, invariant to shapes, opt
    # level, and XNN fusion), so the composed check costs ~33 s per device
    # program. Both sharded axes and every collective pattern are identical
    # on 2x2; full-8-device coverage comes from stages 1-4.
    pp = 2
    rr = 2 if n_devices >= 4 else n_devices // pp
    devices = np.asarray(jax.devices()[: pp * rr]).reshape(pp, rr)
    mesh = jax.sharding.Mesh(devices, ("particles", "rays"))

    pos, vel, box, nrm, ro, rays, rgbs = _tiny_problem(n_devices, seed)
    # (2, 2, 2) taps: same sharding/collective structure, ~7x cheaper
    # XLA:CPU compile for BOTH programs (see build_tiny_models) — the
    # composed stage was the dryrun's wall-clock long pole
    transition, renderer = build_tiny_models(kernel_size=(2, 2, 2))

    def factory(axis):
        return ParticleNet(search_backend="brute", fluid_neighbor_k=16,
                           obstacle_neighbor_k=8, shard_axis=axis,
                           kernel_size=(2, 2, 2))

    key = jax.random.PRNGKey(0)
    args = tuple(jnp.asarray(a) for a in (pos, vel, box, nrm))
    params_t = transition.init(key, *args)
    _mark("transition init")
    params_r = renderer.init(
        key, args[0], jnp.asarray(ro[0]), jnp.asarray(rays[0])
    )
    _mark("renderer init")
    opt_r = optax.adam(1e-3)
    opt_t = optax.adam(1e-4)
    bounds = losses.default_box_bounds()
    # the jitted step donates params/opt states — keep host copies for the
    # eager replicated reference
    host_params = jax.tree_util.tree_map(np.asarray, (params_r, params_t))

    make = make_spmd_e2e_step if impl == "spmd" else make_composed_e2e_step
    step = make(factory, renderer, opt_r, opt_t, bounds, 1.0, mesh)
    inputs = (*args, jnp.asarray(ro), jnp.asarray(rays), jnp.asarray(rgbs))
    compiled = step.lower(
        params_r, params_t, opt_r.init(params_r), opt_t.init(params_t),
        *inputs
    ).compile()
    _mark(f"{impl} step compiled")
    out = compiled(params_r, params_t, opt_r.init(params_r),
                   opt_t.init(params_t), *inputs)
    out = jax.block_until_ready(out)
    _mark(f"{impl} step executed")
    (_, _, _, _, loss, next_pos, _next_vel, aux) = out

    # replicated reference: same factory step, plain transition, one-device jit
    estep = jax.jit(
        make_e2e_train_step(transition, renderer, opt_r, opt_t, bounds, 1.0)
    )
    pr, pt = jax.tree_util.tree_map(jnp.asarray, host_params)
    eout = estep(pr, pt, opt_r.init(pr), opt_t.init(pt), *inputs)
    eout = jax.block_until_ready(eout)
    _mark("replicated reference executed")
    (_, _, _, _, e_loss, e_next_pos, _e_next_vel, e_aux) = eout

    def as_dict(l, a, npos):
        return {
            "loss": float(l),
            "grad_norm_r": float(a["grad_norm_renderer"]),
            "grad_norm_t": float(a["grad_norm_transition"]),
            "next_pos": np.asarray(npos),
        }

    return as_dict(loss, aux, next_pos), as_dict(e_loss, e_aux, e_next_pos)


# NOTE on the persistent compilation cache: do NOT enable it here. Measured
# on this host (round 5): the multi-device e2e step compiles in 25.5 s from
# scratch but takes 587 s with jax_compilation_cache_dir set — the XLA:CPU
# AOT serialize/load path dominates for large 8-partition executables (the
# loader also warns about prefer-no-scatter/gather feature mismatches). The
# cache helps small per-op programs (tests/conftest.py keeps it) and the TPU
# remote-AOT path (bench.py keeps it), but is a 20x pessimization for the
# dryrun's big CPU programs.


def dryrun_multichip(n_devices: int) -> None:
    """Driver entry — six multi-chip correctness checks on an n-device mesh:

    1. particle-sharded transition step (shard_map + all_gather) == replicated
    2. halo-exchange particle step, brute backend == replicated
    3. halo-exchange particle step, grid backend (per-shard tables with
       `points_valid` halo masking) == replicated
    4. reference-scale (13,824-particle lattice) grid halo step == replicated
    5. FULL COMPOSED e2e train step: shard_map transition over 'particles' x
       ray sharding over 'rays' + both Adam updates in ONE program
       (parallel/sharding.make_spmd_e2e_step — the production composed
       path; subsumes the 1-D ray-sharded e2e check, which is the
       particles=1 degenerate case and is separately exercised by
       tests/test_sharding.py). Runs on a 2x2 submesh — identical axis /
       collective structure, ~4x cheaper on serialized single-core hosts
       (see run_composed_step) — loss finite,
    6. ... and equal to the replicated eager reference (loss, both grad
       norms, next positions).

    Cheap stages run first and every stage prints a timed progress line, so
    a driver timeout tail is diagnostic. No GSPMD compile (the composed
    stage is an explicit shard_map program + a single-device jit reference)
    and no persistent compile cache (see the module note: it is a measured
    20x pessimization for these programs)."""
    import time

    t0 = time.time()

    def mark(msg):
        print(f"[dryrun +{time.time() - t0:6.1f}s] {msg}", flush=True)

    mark(f"start: {n_devices} virtual devices, backend="
         f"{jax.default_backend()}")

    ref_pos, sh_pos, ref_nn, sh_nn = run_particle_sharded_step(n_devices)
    np.testing.assert_array_equal(ref_nn, sh_nn)
    np.testing.assert_allclose(ref_pos, sh_pos, atol=1e-5)
    mark(f"1/6 particle-sharded step matches replicated "
         f"(max diff {np.abs(ref_pos - sh_pos).max():.2e})")

    h_ref = h_sh = None
    for i, backend in enumerate(("brute", "grid")):
        h_ref, h_sh, h_rnn, h_snn, h_diag = run_halo_particle_step(
            n_devices, search_backend=backend
        )
        assert not h_diag["grid_overflow"], (backend, h_diag)
        np.testing.assert_array_equal(h_rnn, h_snn)
        np.testing.assert_allclose(h_ref, h_sh, atol=1e-5)
        mark(f"{2 + i}/6 halo-exchange step ({backend}) matches replicated "
             f"(max diff {np.abs(h_ref - h_sh).max():.2e})")

    l_ref, l_sh, l_rnn, l_snn, l_diag = run_halo_lattice_step(n_devices)
    assert not l_diag["grid_overflow"], l_diag
    np.testing.assert_array_equal(l_rnn, l_snn)
    np.testing.assert_allclose(l_ref, l_sh, atol=1e-4)
    mark(f"4/6 13.8k-particle lattice grid halo matches "
         f"(max diff {np.abs(l_ref - l_sh).max():.2e})")

    comp, repl = run_composed_step(n_devices)
    assert np.isfinite(comp["loss"]), comp
    assert np.all(np.isfinite(comp["next_pos"]))
    mark(f"5/6 composed e2e train step (rays x particles + optimizers) ran: "
         f"loss={comp['loss']:.6f}")
    # f32 tolerances: the SPMD and eager paths sum the same owned-once terms
    # in different orders; measured agreement in f64 is 1e-7 (loss/renderer
    # grads) and 7e-6 (transition grads), so anything beyond f32
    # reduction-order noise (~1e-3 on the long CConv adjoint chains) is a
    # real accounting bug.
    np.testing.assert_allclose(comp["loss"], repl["loss"], rtol=1e-5)
    np.testing.assert_allclose(
        comp["grad_norm_r"], repl["grad_norm_r"], rtol=2e-3
    )
    np.testing.assert_allclose(
        comp["grad_norm_t"], repl["grad_norm_t"], rtol=2e-3
    )
    np.testing.assert_allclose(
        comp["next_pos"], repl["next_pos"], atol=1e-5
    )
    mark(f"6/6 composed step matches the replicated reference "
         f"(loss {comp['loss']:.6f} vs {repl['loss']:.6f})")

    print(
        f"dryrun_multichip({n_devices}): all six checks passed in "
        f"{time.time() - t0:.1f}s — particle-sharded, halo brute+grid, "
        f"13.8k lattice, composed rays x particles e2e train step "
        f"(loss {comp['loss']:.6f} == replicated {repl['loss']:.6f})"
    )

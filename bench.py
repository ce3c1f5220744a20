"""Benchmark: end-to-end training-step throughput on the flagship pipeline.

Measures rays/sec of the FULL e2e train step at the reference's working
point — 1024-ray batch, 64 coarse + 128 fine samples, K=20 neighbors,
~14k fluid particles (watercube scale), one ParticleNet transition step +
coarse/fine particle-NeRF render + joint backward + both Adam updates —
i.e. what reference trainer_e2e.py:202-302 does per step, but as one fused
jitted program on TPU.

Baseline: the reference never measured throughput (BASELINE.md) and its
CUDA stack cannot run in this environment, so `vs_baseline` divides by a
DERIVED A100 estimate: a per-component FLOP/bandwidth model of the
reference step (NeRF MLPs ~1.9 TFLOP fwd+bwd at TF32, ball_query, CConv,
feature pipeline, host overhead) bounds it at 55-95 ms/step, de-rated to
3,500-8,000 rays/s by the measured efficiency of nerf_pl-class chunked
pytorch training; 5,000 rays/s is the central estimate. Full derivation
with the component table: BASELINE.md "Reference throughput model".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC_ESTIMATE = 5_000.0
# Derived A100 bound for the transition-only trainer step (2-step rollout,
# fwd+bwd, reference trainer_transmodel.py:179-200): the BASELINE.md
# component model puts one ParticleNet fwd+bwd at 5-10 ms on A100 (CConv x4
# + hash-grid search); the 2-step trainer step is ~2x that plus optimizer /
# launch overhead => 15-25 ms => 14,336 particles x 2 steps / 20 ms
# ~ 1.4M particle-steps/s central estimate.
REFERENCE_PARTICLE_STEPS_PER_SEC_ESTIMATE = 1.4e6

N_PARTICLES = 14_336
N_BOX = 4_096
N_RAYS = 1024
N_VIEWS = 1

# production perf knobs (env-overridable for sweeps).
# Round-5 defaults: the transition model runs the selection-free fused
# Pallas conv (ops/fused_cconv — exact uncapped reference semantics) at
# MXU 'default' (1-pass bf16) precision. Measured v5e A/B at this working
# point: grid/high 412.3 ms train step -> fused_cconv/default 246.6 ms,
# -> 159.0 ms with the segment-packed walk, -> 135.2 ms with dense-row
# in-kernel outputs (212k particle-steps/s); rollout 817 -> 367 -> 205 ms
# (698k psteps/s eval); e2e step 308 -> 260 ms (3,945 rays/s). The bf16
# precision choice is quality-pinned by the full protocol run
# (PROTOCOL_R5.json trained_pred2gt vs R4's 96.3 mm at grid/high).
CONV_PRECISION = os.environ.get("NF_BENCH_CONV_PRECISION", "default")
QUERY_CHUNK = int(os.environ.get("NF_BENCH_QUERY_CHUNK", 16384))
# transition-model neighbor search: 'fused_cconv' (default; ops/fused_cconv
# selection-free fused conv), 'grid', 'brute', 'auto' (grid at 14k), or
# 'fused' (ops/fused_query one-kernel compact lists)
SEARCH_BACKEND = os.environ.get("NF_BENCH_SEARCH", "fused_cconv")
# fused_cconv tuning knobs (ParticleNet.fused_group_size/slab_cap/cell_scale)
FUSED_TG = int(os.environ.get("NF_BENCH_FUSED_TG", 16))
FUSED_SLAB = int(os.environ.get("NF_BENCH_FUSED_SLAB", 128))
FUSED_CELL = float(os.environ.get("NF_BENCH_FUSED_CELL", 1.0))


def particle_net_kwargs():
    """Shared ParticleNet perf-knob kwargs (bench.py + tools/ benches)."""
    return dict(
        gravity=(0.0, 0.0, -9.81),
        conv_precision=CONV_PRECISION, query_chunk=QUERY_CHUNK,
        search_backend=SEARCH_BACKEND, fused_group_size=FUSED_TG,
        fused_slab_cap=FUSED_SLAB, fused_cell_scale=FUSED_CELL,
    )


def build_problem():
    """Watercube-like scene with REALISTIC structure (round-1 verdict: the
    random-noise scene both flattered cell-grid locality and over-packed
    cells vs a physical fluid):

    - fluid: jittered lattice at the DFSPH rest spacing 2 * particle_radius
      = 0.05 (the reference's generator packs particles the same way,
      reference create_physics_scenes.py:35-59) -> realistic ~91 particles
      per 0.225 search cell instead of Poisson-random occupancy,
    - box: container wall/floor particles with inward normals,
    - rays: a real pinhole camera at the reference's viewing distance
      (near 9 / far 13, configs/dataset.yaml), 1024 random pixels of a
      400x400 image — real ray-bundle geometry, not random directions.
    """
    rng = np.random.default_rng(10)
    # 24 x 24 x 25 lattice at 0.05 spacing = 14400 sites; keep N_PARTICLES
    xs = (np.arange(24) - 11.5) * 0.05
    zs = np.arange(25) * 0.05 - 0.9
    gx, gy, gz = np.meshgrid(xs, xs, zs, indexing="ij")
    pos = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    pos += rng.normal(scale=0.004, size=pos.shape).astype(np.float32)
    pos = pos[rng.permutation(len(pos))[:N_PARTICLES]]
    vel = (rng.normal(size=(N_PARTICLES, 3)) * 0.1).astype(np.float32)

    # container walls (floor + 4 sides), inward normals
    side = int(np.sqrt(N_BOX / 5))
    u = np.linspace(-0.975, 0.975, side, dtype=np.float32)
    uu, vv = np.meshgrid(u, u, indexing="ij")
    faces, normals = [], []
    floor = np.stack([uu, vv, np.full_like(uu, -0.975)], -1).reshape(-1, 3)
    faces.append(floor)
    normals.append(np.tile([0, 0, 1.0], (len(floor), 1)))
    for axis, sign in ((0, 1), (0, -1), (1, 1), (1, -1)):
        w = np.stack([uu * 0 + 0.975 * -sign, vv, uu * 0.7], -1)
        if axis == 1:
            w = w[:, [1, 0, 2]]
        wall = w.reshape(-1, 3)
        n = np.zeros(3, np.float32)
        n[axis] = sign
        faces.append(wall)
        normals.append(np.tile(n, (len(wall), 1)))
    box = np.concatenate(faces)[:N_BOX].astype(np.float32)
    nrm = np.concatenate(normals)[:N_BOX].astype(np.float32)

    # pinhole camera at the reference viewing distance, random pixel subset
    cam = np.asarray([0.0, -10.5, 1.0], np.float32)
    fwd = np.asarray([0.0, 0.0, -0.2], np.float32) - cam
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    w_img, focal = 400, 400 * 2.2  # box spans ~1/5 of the image like the ref
    ro = np.tile(cam, (N_VIEWS, 1))
    rays_all = []
    for _ in range(N_VIEWS):
        px = rng.integers(0, w_img, N_RAYS)
        py = rng.integers(0, w_img, N_RAYS)
        d = (
            (px[:, None] - w_img / 2) / focal * right[None]
            + (py[:, None] - w_img / 2) / focal * up[None]
            + fwd[None]
        ).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays_all.append(np.concatenate([np.tile(cam, (N_RAYS, 1)), d], -1))
    rays = np.stack(rays_all)
    rgbs = rng.uniform(size=(N_VIEWS, N_RAYS, 3)).astype(np.float32)
    return pos, vel, box, nrm, ro, rays, rgbs


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache")
    import jax.numpy as jnp
    import optax

    from neurofluid_tpu.models.particle_net import ParticleNet
    from neurofluid_tpu.models.render_net import RenderNet
    from neurofluid_tpu.train import losses
    from neurofluid_tpu.train.e2e import make_e2e_train_step

    pos, vel, box, nrm, ro, rays, rgbs = build_problem()

    transition = ParticleNet(**particle_net_kwargs())
    renderer = RenderNet()  # reference working point: 64+128 samples, K=20

    key = jax.random.PRNGKey(0)
    args = [jnp.asarray(x) for x in (pos, vel, box, nrm)]
    params_t = transition.init(key, *args)
    params_r = renderer.init(key, args[0], jnp.asarray(ro[0]), jnp.asarray(rays[0, :8]))

    opt_r = optax.adam(3e-4)
    opt_t = optax.adam(1e-5)
    opt_r_state = opt_r.init(params_r)
    opt_t_state = opt_t.init(params_t)

    step = jax.jit(
        make_e2e_train_step(
            transition, renderer, opt_r, opt_t, losses.default_box_bounds(), 1.0
        ),
        donate_argnums=(0, 1, 2, 3),
    )

    # static boundary grid: built once per scene (as in the trainers)
    box_grid = transition.make_grid(jnp.asarray(box))
    carry = (params_r, params_t, opt_r_state, opt_t_state)
    inputs = (
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(box), jnp.asarray(nrm),
        jnp.asarray(ro), jnp.asarray(rays), jnp.asarray(rgbs), box_grid,
    )

    # compile + warmup
    t0 = time.time()
    out = step(*carry, *inputs)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    carry = out[:4]

    times = []
    iters = 10
    for _ in range(iters):
        t0 = time.perf_counter()
        out = step(*carry, *inputs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        carry = out[:4]

    median = sorted(times)[len(times) // 2]
    rays_per_sec = N_VIEWS * N_RAYS / median

    # fail-loudly policy: the measured number is only valid if no search
    # cap silently truncated neighborhoods
    overflow = bool(out[7]["search_overflow"])
    print(
        f"# device={jax.devices()[0]}, compile={compile_s:.1f}s, "
        f"step={median * 1e3:.1f}ms, loss={float(out[4]):.5f}, "
        f"search_overflow={overflow}",
        file=sys.stderr, flush=True,
    )

    # ---- metric 2: particle-steps/sec of the transition-only trainer step
    # (2-step rollout fwd+bwd + Adam, reference trainer_transmodel.py:179-200)
    # and of the autoregressive eval rollout (reference eval_e2e.py:74-78).
    import optax as _optax

    from neurofluid_tpu.train import transition as trans_mod

    topt = _optax.chain(_optax.clip_by_global_norm(1.0), _optax.adam(1e-4))
    net_t = transition
    # params_t was DONATED into the e2e step; carry holds the live copy
    t_params = carry[1]
    t_opt_state = topt.init(t_params)
    bounds = losses.default_box_bounds()

    import functools

    def t_train_step(params, opt_state, pos0, vel0, pos1, pos2, box_, nrm_,
                     box_grid_):
        # same remat policy as the real trainer (train/transition.py):
        # keep the DISCRETE search products across the remat boundary so the
        # backward never re-runs grid build + candidate scan + selection.
        # fused_cconv: no remat at all (custom-VJP saves only op inputs)
        ckpt = (
            (lambda f: f) if net_t.search_backend == "fused_cconv"
            else functools.partial(
                jax.checkpoint,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "nbr_static", "nbr_feats"
                ),
            )
        )

        @ckpt
        def one_step(p, pp, vv):
            return net_t.apply(p, pp, vv, box_, nrm_, return_diag=True,
                               box_grid=box_grid_)

        def loss_fn(p):
            pred1, v1, nn1, diag1 = one_step(p, pos0, vel0)
            pred2, v2, nn2, diag2 = one_step(p, pred1, v1)
            l1 = losses.weighted_mse_loss(pred1, pos1, nn1)
            l2 = losses.weighted_mse_loss(pred2, pos2, nn2)
            total = (0.5 * l1 + 0.5 * l2
                     + losses.boundary_loss(pred1, bounds)
                     + losses.boundary_loss(pred2, bounds))
            ov = jnp.logical_or(diag1["grid_overflow"], diag2["grid_overflow"])
            return total, ov

        (loss, ov), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = topt.update(grads, opt_state, params)
        params = _optax.apply_updates(params, updates)
        return params, opt_state, loss, ov

    tstep = jax.jit(t_train_step, donate_argnums=(0, 1))
    pos1_t = jnp.asarray(pos + 0.001)
    pos2_t = jnp.asarray(pos + 0.002)
    t0 = time.time()
    tout = tstep(t_params, t_opt_state, jnp.asarray(pos), jnp.asarray(vel),
                 pos1_t, pos2_t, jnp.asarray(box), jnp.asarray(nrm), box_grid)
    # t_params/t_opt_state are now donated; only tout's arrays are live
    jax.block_until_ready(tout)
    t_compile_s = time.time() - t0
    t_params2, t_opt2 = tout[0], tout[1]
    t_times = []
    for _ in range(10):
        t0 = time.perf_counter()
        tout = tstep(t_params2, t_opt2, jnp.asarray(pos), jnp.asarray(vel),
                     pos1_t, pos2_t, jnp.asarray(box), jnp.asarray(nrm),
                     box_grid)
        jax.block_until_ready(tout)
        t_times.append(time.perf_counter() - t0)
        t_params2, t_opt2 = tout[0], tout[1]
    t_median = sorted(t_times)[len(t_times) // 2]
    t_overflow = bool(tout[3])
    particle_steps_per_sec = 2 * N_PARTICLES / t_median

    # eval rollout (inference): 10 autoregressive steps, jitted scan
    rollout = jax.jit(
        trans_mod.make_rollout_fn(net_t, with_diag=True),
        static_argnames=("n_steps",),
    )
    r_out = rollout(t_params2, jnp.asarray(pos), jnp.asarray(vel),
                    jnp.asarray(box), jnp.asarray(nrm), n_steps=10)
    jax.block_until_ready(r_out)
    r_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        r_out = rollout(t_params2, jnp.asarray(pos), jnp.asarray(vel),
                        jnp.asarray(box), jnp.asarray(nrm), n_steps=10)
        jax.block_until_ready(r_out)
        r_times.append(time.perf_counter() - t0)
    r_median = sorted(r_times)[len(r_times) // 2]
    rollout_particle_steps_per_sec = 10 * N_PARTICLES / r_median

    print(
        f"# device={jax.devices()[0]}, compile={compile_s:.1f}s, "
        f"step={median * 1e3:.1f}ms, loss={float(out[4]):.5f}, "
        f"search_overflow={overflow}",
        file=sys.stderr,
    )
    print(
        f"# transition: compile={t_compile_s:.1f}s, "
        f"train_step={t_median * 1e3:.1f}ms "
        f"({particle_steps_per_sec:,.0f} particle-steps/s fwd+bwd), "
        f"rollout_10={r_median * 1e3:.1f}ms "
        f"({rollout_particle_steps_per_sec:,.0f} particle-steps/s eval), "
        f"overflow={t_overflow}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "e2e_train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_ESTIMATE, 3),
                "extra": {
                    "e2e_step_ms": round(median * 1e3, 1),
                    "compile_s": round(compile_s, 1),
                    "search_overflow": overflow,
                    "transition_train_particle_steps_per_sec": round(
                        particle_steps_per_sec, 1
                    ),
                    "transition_train_vs_baseline": round(
                        particle_steps_per_sec
                        / REFERENCE_PARTICLE_STEPS_PER_SEC_ESTIMATE, 3
                    ),
                    "rollout_particle_steps_per_sec": round(
                        rollout_particle_steps_per_sec, 1
                    ),
                    "transition_overflow": t_overflow,
                    "conv_precision": CONV_PRECISION,
                },
            }
        )
    )


if __name__ == "__main__":
    main()

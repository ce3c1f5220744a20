"""Benchmark: end-to-end training-step throughput on the flagship pipeline.

Measures rays/sec of the FULL e2e train step at the reference's working
point — 1024-ray batch, 64 coarse + 128 fine samples, K=20 neighbors,
~14k fluid particles (watercube scale), one ParticleNet transition step +
coarse/fine particle-NeRF render + joint backward + both Adam updates —
i.e. what reference trainer_e2e.py:202-302 does per step, but as one fused
jitted program on TPU.

Baseline: the reference never measured throughput (BASELINE.md). The
`vs_baseline` denominator is a documented ESTIMATE of the PyTorch reference
on A100: ~5,000 rays/s for the full train step (1024-ray chunks through
pytorch3d ball_query + two 8x256 MLP passes on 65k/196k samples, plus the
Python chunk loop and optimizer overhead). Update when a measured reference
number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC_ESTIMATE = 5_000.0

N_PARTICLES = 14_336
N_BOX = 4_096
N_RAYS = 1024
N_VIEWS = 1


def build_problem():
    rng = np.random.default_rng(10)
    # watercube-like scene: blob of fluid inside the [-1,1]^2 x [-1,2.43] box
    pos = rng.uniform(-0.6, 0.6, size=(N_PARTICLES, 3)).astype(np.float32)
    pos[:, 2] = rng.uniform(-0.9, 0.3, size=N_PARTICLES).astype(np.float32)
    vel = (rng.normal(size=(N_PARTICLES, 3)) * 0.1).astype(np.float32)
    box = rng.uniform(-1.0, 1.0, size=(N_BOX, 3)).astype(np.float32)
    nrm = rng.normal(size=(N_BOX, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)

    ro = np.asarray([[0.0, -11.0, 0.7]], np.float32).repeat(N_VIEWS, 0)
    d = rng.normal(size=(N_VIEWS, N_RAYS, 3)).astype(np.float32) * 0.05
    d[..., 1] += 1.0  # looking toward the box
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(ro[:, None, :], d.shape)
    rays = np.concatenate([o, d], -1)
    rgbs = rng.uniform(size=(N_VIEWS, N_RAYS, 3)).astype(np.float32)
    return pos, vel, box, nrm, ro, rays, rgbs


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from neurofluid_tpu.models.particle_net import ParticleNet
    from neurofluid_tpu.models.render_net import RenderNet
    from neurofluid_tpu.train import losses
    from neurofluid_tpu.train.e2e import make_e2e_train_step

    pos, vel, box, nrm, ro, rays, rgbs = build_problem()

    transition = ParticleNet(gravity=(0.0, 0.0, -9.81))
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

    print(
        f"# device={jax.devices()[0]}, compile={compile_s:.1f}s, "
        f"step={median * 1e3:.1f}ms, loss={float(out[4]):.5f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "e2e_train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

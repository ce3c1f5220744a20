"""Standalone transition-model throughput bench (bench.py metric 2 only).

Measures the 2-step-rollout trainer step (fwd+bwd+Adam, the reference
trainer_transmodel.py:179-200 counterpart) and the autoregressive eval
rollout at the watercube working point, without paying the e2e step's
compile. Use for search-backend / precision A/Bs:

  JAX_PLATFORMS=axon,cpu PYTHONPATH=/root/repo:/root/.axon_site \
    NF_BENCH_SEARCH=fused python tools/bench_transition.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np
import optax

import bench
from neurofluid_tpu.models.particle_net import ParticleNet
from neurofluid_tpu.train import losses
from neurofluid_tpu.train import transition as trans_mod


def main():
    pos, vel, box, nrm, *_ = bench.build_problem()
    net = ParticleNet(**bench.particle_net_kwargs())
    key = jax.random.PRNGKey(0)
    args = [jnp.asarray(x) for x in (pos, vel, box, nrm)]
    params = net.init(key, *args)
    topt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    opt_state = topt.init(params)
    bounds = losses.default_box_bounds()
    box_grid = net.make_grid(args[2])

    def t_train_step(params, opt_state, pos0, vel0, pos1, pos2, box_, nrm_,
                     box_grid_):
        # fused_cconv backend: no remat (custom-VJP saves only op inputs;
        # remat would just re-run the forward in the backward)
        ckpt = (
            (lambda f: f) if net.search_backend == "fused_cconv"
            else functools.partial(
                jax.checkpoint,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "nbr_static", "nbr_feats"
                ),
            )
        )

        @ckpt
        def one_step(p, pp, vv):
            return net.apply(p, pp, vv, box_, nrm_, return_diag=True,
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
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, ov

    tstep = jax.jit(t_train_step, donate_argnums=(0, 1))
    pos1_t, pos2_t = args[0] + 0.001, args[0] + 0.002
    t0 = time.time()
    out = tstep(params, opt_state, args[0], jnp.asarray(vel), pos1_t, pos2_t,
                args[2], args[3], box_grid)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    params, opt_state = out[0], out[1]
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = tstep(params, opt_state, args[0], jnp.asarray(vel), pos1_t,
                    pos2_t, args[2], args[3], box_grid)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        params, opt_state = out[0], out[1]
    med = sorted(times)[len(times) // 2]
    psps = 2 * bench.N_PARTICLES / med

    rollout = jax.jit(trans_mod.make_rollout_fn(net, with_diag=True),
                      static_argnames=("n_steps",))
    r_out = rollout(params, args[0], jnp.asarray(vel), args[2], args[3],
                    n_steps=10)
    jax.block_until_ready(r_out)
    r_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        r_out = rollout(params, args[0], jnp.asarray(vel), args[2], args[3],
                        n_steps=10)
        jax.block_until_ready(r_out)
        r_times.append(time.perf_counter() - t0)
    r_med = sorted(r_times)[len(r_times) // 2]
    print(
        f"backend={bench.SEARCH_BACKEND} precision={bench.CONV_PRECISION} "
        f"compile={compile_s:.1f}s train_step={med*1e3:.1f}ms "
        f"({psps:,.0f} particle-steps/s) overflow={bool(out[3])} "
        f"rollout10={r_med*1e3:.1f}ms "
        f"({10 * bench.N_PARTICLES / r_med:,.0f} psteps/s eval)",
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Trace the bench e2e train step on TPU and print an HLO-op time breakdown.

Usage: python tools/profile_step.py [--steps 3] [--logdir /tmp/nf_trace]

Captures a jax.profiler trace of the same fused train step bench.py measures,
then aggregates device time by HLO op category / name via xprof's converter.
This is the round-2 perf-work driver (VERDICT item 1).
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(logdir: str, steps: int):
    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from neurofluid_tpu.models.particle_net import ParticleNet
    from neurofluid_tpu.models.render_net import RenderNet
    from neurofluid_tpu.train import losses
    from neurofluid_tpu.train.e2e import make_e2e_train_step

    pos, vel, box, nrm, ro, rays, rgbs = bench.build_problem()
    transition = ParticleNet(**bench.particle_net_kwargs())
    renderer = RenderNet()
    key = jax.random.PRNGKey(0)
    args = [jnp.asarray(x) for x in (pos, vel, box, nrm)]
    params_t = transition.init(key, *args)
    params_r = renderer.init(key, args[0], jnp.asarray(ro[0]), jnp.asarray(rays[0, :8]))
    opt_r = optax.adam(3e-4)
    opt_t = optax.adam(1e-5)
    step = jax.jit(
        make_e2e_train_step(
            transition, renderer, opt_r, opt_t, losses.default_box_bounds(), 1.0
        ),
        donate_argnums=(0, 1, 2, 3),
    )
    carry = (params_r, params_t, opt_r.init(params_r), opt_t.init(params_t))
    box_grid = transition.make_grid(jnp.asarray(box))
    inputs = (
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(box), jnp.asarray(nrm),
        jnp.asarray(ro), jnp.asarray(rays), jnp.asarray(rgbs), box_grid,
    )
    out = step(*carry, *inputs)
    jax.block_until_ready(out)
    carry = out[:4]

    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        out = step(*carry, *inputs)
        jax.block_until_ready(out)
        carry = out[:4]
    jax.profiler.stop_trace()


def capture_transition(logdir: str, steps: int):
    """Trace the transition-only trainer step (bench.py metric 2 shape)."""
    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from neurofluid_tpu.models.particle_net import ParticleNet
    from neurofluid_tpu.train import losses

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
        import functools
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
    out = tstep(params, opt_state, args[0], jnp.asarray(vel), pos1_t, pos2_t,
                args[2], args[3], box_grid)
    jax.block_until_ready(out)
    params, opt_state = out[0], out[1]

    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        out = tstep(params, opt_state, args[0], jnp.asarray(vel), pos1_t,
                    pos2_t, args[2], args[3], box_grid)
        jax.block_until_ready(out)
        params, opt_state = out[0], out[1]
    jax.profiler.stop_trace()


def report(logdir: str, top: int = 40):
    from xprof.convert import raw_to_tool_data as rtd

    xplanes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not xplanes:
        print("no xplane.pb found under", logdir)
        return
    xplane = xplanes[-1]
    params = {"use_saved_result": False}
    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", params)
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    rows = json.loads(data) if data.lstrip().startswith("[") else None
    if rows is None:
        # gviz csv fallback
        print(data[:4000])
        return
    print(json.dumps(rows[:2], indent=2)[:2000])


def report_csv(logdir: str, top: int = 45):
    """hlo_stats arrives as gviz JSON; aggregate by (category, program) there."""
    from xprof.convert import raw_to_tool_data as rtd

    xplanes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    xplane = xplanes[-1]
    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    table = obj["table"] if isinstance(obj, dict) and "table" in obj else obj
    cols = [c["label"] if isinstance(c, dict) else c for c in table["cols"]]
    print("columns:", cols, file=sys.stderr)
    idx = {c: i for i, c in enumerate(cols)}
    # column names observed in xprof 2.21: 'HLO op category', 'HLO op name',
    # 'Total time (us)', 'Avg. time (us)', ...
    cat_i = next(i for c, i in idx.items() if "category" in c.lower())
    name_i = next(i for c, i in idx.items() if "expression" in c.lower() or "name" in c.lower())
    # SELF time: while-op "total time" double-counts loop bodies
    time_keys = [c for c in cols if "total self time (us)" == c.lower()] or [
        c for c in cols if "time" in c.lower() and "total" in c.lower()
    ]
    time_i = idx[time_keys[0]]

    def val(row, i):
        v = row["c"][i]
        return v["v"] if isinstance(v, dict) else v

    fw_i = idx.get("Framework op name")
    occ_i = idx.get("#Occurrences")
    src_i = idx.get("Source Info")
    txt_i = idx.get("HLO op text")

    by_cat = {}
    by_name = {}
    detail = {}
    total = 0.0
    for row in table["rows"]:
        cat = val(row, cat_i)
        name = str(val(row, name_i))
        t = float(val(row, time_i) or 0.0)
        total += t
        by_cat[cat] = by_cat.get(cat, 0.0) + t
        key = (cat, name[:110])
        by_name[key] = by_name.get(key, 0.0) + t
        if key not in detail:
            detail[key] = (
                val(row, fw_i) if fw_i is not None else "",
                val(row, occ_i) if occ_i is not None else "",
                val(row, src_i) if src_i is not None else "",
                str(val(row, txt_i))[:160] if txt_i is not None else "",
            )
    print(f"\n== total device time: {total/1e3:.1f} ms (all traced steps) ==")
    print("\n-- by HLO category --")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print(f"\n-- top {top} ops --")
    for (cat, name), t in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        fw, occ, src, txt = detail[(cat, name)]
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  [{cat}] {name}  x{occ}")
        print(f"            fw={fw}  src={src}")
        if txt:
            print(f"            {txt}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/nf_trace")
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--transition", action="store_true",
                    help="trace the transition-only trainer step instead")
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()
    if not args.report_only:
        os.makedirs(args.logdir, exist_ok=True)
        if args.transition:
            capture_transition(args.logdir, args.steps)
        else:
            capture(args.logdir, args.steps)
    report_csv(args.logdir, args.top)

"""Microbenchmark the Pallas ball-feature kernels at the renderer's bench
working point, without paying the full e2e train-step compile.

Usage: python tools/kernel_microbench.py [--unroll 1 3 9 27] [--gpb 8]

Shapes mirror the e2e bench trace: renderer grid dims (10, 10, 16),
cap=128, T=32, K=20, NG ~ 5704 (coarse pass) — the fwd kernel runs 2x per
step (coarse+fine) and the bwd kernel 2x, so step cost ~ 2*(fwd+bwd) here.
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache")

    from neurofluid_tpu.ops import pallas_features as pf

    ap = argparse.ArgumentParser()
    ap.add_argument("--unroll", type=int, nargs="+", default=[1, 3, 9, 27])
    ap.add_argument("--gpb", type=int, default=None)
    ap.add_argument("--ng", type=int, default=5704)
    ap.add_argument("--sentinel-frac", type=float, default=0.4,
                    help="trailing fraction of groups that are empty "
                         "sentinel slots (the +num_cells static bound)")
    args = ap.parse_args()

    dims = (10, 10, 16)
    num_cells = dims[0] * dims[1] * dims[2]
    cap, t, k, radius = 128, 32, 20, 0.225
    ng = args.ng
    rng = np.random.default_rng(0)

    # dense-ish tables: valid slots get coords inside the container
    tx = rng.uniform(-1.0, 1.0, (num_cells + 1, cap)).astype(np.float32)
    ty = rng.uniform(-1.0, 1.0, (num_cells + 1, cap)).astype(np.float32)
    tz = rng.uniform(-1.0, 1.0, (num_cells + 1, cap)).astype(np.float32)
    tx[-1] = ty[-1] = tz[-1] = 1e9
    n_real = int(ng * (1.0 - args.sentinel_frac))
    gcell = rng.integers(0, num_cells, ng).astype(np.int32)
    gcell.sort()
    gcell[n_real:] = num_cells  # trailing empty groups, as group_queries packs
    q_rep = rng.uniform(-1.0, 1.0, (ng * t, 3)).astype(np.float32)
    cot = rng.normal(size=(ng * t, pf.N_SUMS)).astype(np.float32)

    tx, ty, tz = jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(tz)
    gcell, q_rep, cot = jnp.asarray(gcell), jnp.asarray(q_rep), jnp.asarray(cot)

    if args.gpb:
        pf.GPB = args.gpb

    for unroll in args.unroll:
        pf.UNROLL = unroll
        pf.UNROLL_BWD = unroll

        fwd = jax.jit(lambda q: pf.forward(
            q, tx, ty, tz, gcell, dims, radius, k, t, interpret=False))
        bwd = jax.jit(lambda q, c: pf.backward(
            q, c, tx, ty, tz, gcell, dims, radius, k, t, interpret=False))

        t0 = time.time()
        out = jax.block_until_ready(fwd(q_rep))
        cf = time.time() - t0
        t0 = time.time()
        gtab = jax.block_until_ready(bwd(q_rep, cot))
        cb = time.time() - t0

        def timeit(f, *a, iters=20):
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                jax.block_until_ready(f(*a))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2] * 1e3

        tf = timeit(fwd, q_rep)
        tb = timeit(bwd, q_rep, cot)
        print(f"unroll={unroll:2d} gpb={pf.GPB}/{pf.GPB_BWD}: "
              f"fwd {tf:7.2f} ms (compile {cf:5.1f}s)  "
              f"bwd {tb:7.2f} ms (compile {cb:5.1f}s)  "
              f"~step 2*(f+b) = {2 * (tf + tb):7.2f} ms",
              flush=True)
        del out, gtab


if __name__ == "__main__":
    main()

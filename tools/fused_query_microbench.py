"""Microbench ops/fused_query.ball_query_compact against the generic grid
search at the transition working point (14,336 fluid particles), in
isolation from the trainer. Knobs via env:

  NF_FQ_T        group size (default fused_query.GROUP_SIZE)
  NF_FQ_K        neighbor cap (default 64)
  NF_FQ_XYZ      1 = emit xyz payloads (default 0 = ids only)

Usage: JAX_PLATFORMS=axon,cpu PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/fused_query_microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nf_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

import bench
from neurofluid_tpu.ops import fused_query as fq
from neurofluid_tpu.ops import neighbor_search as ns

LOWER = (-1.05, -1.05, -1.05)
UPPER = (1.05, 1.05, 2.55)
RADIUS = 0.225 / 2.0


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] * 1e3, out


def main():
    t = int(os.environ.get("NF_FQ_T", fq.GROUP_SIZE))
    k = int(os.environ.get("NF_FQ_K", 64))
    pos, vel, box, nrm, *_ = bench.build_problem()
    pts = jnp.asarray(pos)

    def build():
        return ns.build_cell_grid(pts, LOWER, UPPER, RADIUS, max_per_cell=32)

    build_j = jax.jit(build)
    ms_build, grid = timeit(build_j)

    emit_xyz = os.environ.get("NF_FQ_XYZ", "0") == "1"

    def fused(g):
        nb, over = fq.ball_query_compact(
            pts, g, LOWER, UPPER, RADIUS, k, exclude_self=True,
            group_size=t, backend="pallas", emit_xyz=emit_xyz,
        )
        return nb.idx, nb.count, over

    def generic(g):
        nb, over = ns.radius_search_grid(
            pts, g, RADIUS, k, order="nearest", inclusive=True,
            exclude_self=True,
        )
        return nb.idx, nb.count, over

    t0 = time.time()
    ms_f, out_f = timeit(jax.jit(fused), grid)
    c_f = time.time() - t0
    t0 = time.time()
    ms_g, out_g = timeit(jax.jit(generic), grid)
    c_g = time.time() - t0
    # sets must agree wherever count <= k
    cf, cg = np.asarray(out_f[1]), np.asarray(out_g[1])
    np.testing.assert_array_equal(cf, cg)
    print(
        f"T={t} K={k} grid_build={ms_build:.2f}ms  "
        f"fused={ms_f:.2f}ms (compile {c_f:.0f}s)  "
        f"generic={ms_g:.2f}ms (compile {c_g:.0f}s)  "
        f"overflow={bool(out_f[2])}/{bool(out_g[2])} "
        f"max_count={cf.max()}",
        flush=True,
    )


if __name__ == "__main__":
    main()

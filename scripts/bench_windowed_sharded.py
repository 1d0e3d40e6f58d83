"""Hardware bench: the sharded windowed-bucket sweeper (round 5,
VERDICT r4 item 1) on the real chip.

On one chip the mesh degenerates to a single device: the number shows
the sharded path's overhead over the raw windowed pass is nil (one
trivial psum), i.e. the production big-catalog regime keeps its
windowed O(r^3) cost under the distributed layouts.  Multi-device
scaling is gated on the CPU mesh (tests/test_scaling_overhead.py).

Run: python scripts/bench_windowed_sharded.py [--sources 10000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=256)
    ap.add_argument("--sources", type=int, default=10000)
    ap.add_argument("--radius", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from c2ray_tpu.config import test_problem_config
    from c2ray_tpu.ops.sweep import SweepScalars, raytrace_windowed
    from c2ray_tpu.ops.tables import build_rad_tables
    from c2ray_tpu.parallel.source_shard import (WindowedShardedSweeper,
                                                 make_device_mesh)

    n, s, r = args.mesh, args.sources, args.radius
    cfg = test_problem_config(mesh=n, dtype="float32", use_lls=True,
                              type_of_lls=1, cosmological=False,
                              sweep_backend="pallas", source_batch=256)
    tables = build_rad_tables(cfg)
    rng = np.random.default_rng(0)
    pos_np = rng.integers(0, n, (s, 3)).astype(np.int32)
    nf_np = 10.0 ** rng.uniform(6, 9, s)
    ndens = jnp.full(cfg.mesh, np.float32(1.98e-4))
    xh = jnp.asarray(rng.uniform(0.3, 0.9, cfg.mesh).astype(np.float32))
    dr = 2.9e24 / (n / 64)
    sc = SweepScalars(dr=jnp.float32(dr),
                      rate_scale=jnp.float32(cfg.sed.s_star / dr ** 3),
                      lls_coldens=jnp.float32(1e17),
                      rmax2_cells=jnp.float32(0.0))

    local = jax.jit(lambda p, f: raytrace_windowed(
        cfg, tables, ndens, xh, p, f, sc, radius=r))
    sweeper = WindowedShardedSweeper(make_device_mesh(None))
    ndev = sweeper.ndev

    def run(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*a)
            jax.block_until_ready(out)
        return (time.time() - t0) / args.iters, out

    pos_d = jnp.asarray(pos_np)
    nf_d = jnp.asarray(nf_np, jnp.float32)
    t_local, out_l = run(local, pos_d, nf_d)
    t_shard, out_s = run(lambda: sweeper.sweep(
        cfg, tables, r, ndens, xh, None, pos_np, nf_np, None, sc))
    rel = float(jnp.max(jnp.abs(out_s[0] - out_l[0]))
                / jnp.max(jnp.abs(out_l[0])))
    print(f"windowed {s} sources r={r} {n}^3: local {t_local*1e3:.1f} ms, "
          f"sharded({ndev} dev) {t_shard*1e3:.1f} ms "
          f"(overhead {100*(t_shard/t_local-1):+.1f}%), "
          f"max rel dev {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()

"""Per-iteration diagnosis of the adaptive (windowed) full timestep.

Runs the bench.py --full-step 10k-source configuration and logs, for
every convergence iteration: wall time, the radius-rung histogram, and
the promoted-source count — attributing the 10k-source step cost
(BENCH_HISTORY round 3) between promotion-driven radius growth,
bucket-capacity recompiles, and the index-bound windowed sweep itself.

Usage: python scripts/profile_adaptive_step.py [--mesh 256]
       [--sources 10000] [--steps 2] [--cpu]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=256)
    ap.add_argument("--sources", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from c2ray_tpu.config import test_problem_config
    from c2ray_tpu.ops.tables import build_rad_tables
    from c2ray_tpu.solver import Evolve3D
    from c2ray_tpu.state import initial_state

    n = args.mesh
    backend = ("pallas" if jax.devices()[0].platform == "tpu"
               else "facemajor")
    cfg = test_problem_config(mesh=n, dtype="float32", use_lls=True,
                              type_of_lls=1, cosmological=False,
                              sweep_backend=backend,
                              source_batch=min(args.sources, 256))
    tables = build_rad_tables(cfg)
    rng = np.random.default_rng(0)
    srcpos = rng.integers(0, n, (args.sources, 3)).astype(np.int32)
    nflux = (10.0 ** rng.uniform(6, 9, args.sources)).astype(np.float64)
    ndens = jnp.full(cfg.mesh, np.float32(1.98e-4))
    dr = 2.9e24 / (n / 64)
    dt = 3.0e13

    solver = Evolve3D(cfg, tables)
    ladder = solver._radius_ladder()

    # instrument: one log line per adaptive sweep dispatch
    orig_sweep = solver._adaptive_sweep
    orig_promote = solver._promote
    t_last = [time.time()]

    def sweep_logged(ndens_, xh_av, srcpos_np, nflux_np, srcpos_, nflux_,
                     sc, lls_grid, assign, nfx_np=None):
        hist = np.bincount(assign, minlength=len(ladder))
        t0 = time.time()
        out = orig_sweep(ndens_, xh_av, srcpos_np, nflux_np, srcpos_,
                         nflux_, sc, lls_grid, assign, nfx_np=nfx_np)
        disp = time.time() - t0
        print(f"  sweep dispatch {disp*1e3:7.1f} ms  rungs "
              + " ".join(f"r{r}:{h}" for r, h in zip(ladder, hist)
                         if h), flush=True)
        return out

    def promote_logged(per_src, nflux_np, assign):
        new = orig_promote(per_src, nflux_np, assign)
        moved = int(np.sum(new != assign))
        wall = time.time() - t_last[0]
        t_last[0] = time.time()
        print(f"  iter wall {wall*1e3:8.1f} ms  promoted {moved}",
              flush=True)
        return new

    solver._adaptive_sweep = sweep_logged
    solver._promote = promote_logged

    state = initial_state(cfg)
    state = state._replace(xh1=jnp.asarray(
        rng.uniform(0.3, 0.9, cfg.mesh).astype(np.float32)))

    for step in range(args.steps):
        t_last[0] = time.time()
        t0 = time.time()
        state, info = solver.evolve3d(state, ndens, dr, srcpos, nflux, dt,
                                      lls_coldens=1e17)
        print(f"step {step}: {time.time()-t0:.1f} s  niter={info.niter} "
              f"mean_x={info.mean_xh1:.4f}", flush=True)


if __name__ == "__main__":
    main()

"""Non-isothermal hardware validation (VERDICT r3 item 6).

One non-isothermal timestep (heating tables + thermal subcycle + the
three temperature states) on the TPU in the production f32/pallas
configuration, checked against the CPU float64 facemajor path on the
same problem: global means plus a dense subcube comparison.  The
thermal masked while_loop (<= 1e4 subcycles, ops/thermal.py) is exactly
the construct whose TPU cost/behavior is hardest to predict - this is
its first on-chip correctness + timing measurement.

Run:  python scripts/validate_thermal_tpu.py [--mesh 128] [--sources 4]
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(platform: str, n: int, s: int, out_npz: str,
            thermal_chunk: int = 0):
    """Subprocess body: run one step on `platform`, save xh1/T grids."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        dtype, backend = "float64", "facemajor"
    else:
        dtype, backend = "float32", "pallas"
    import jax.numpy as jnp

    from c2ray_tpu import constants as const
    from c2ray_tpu.config import test_problem_config
    from c2ray_tpu.ops.tables import build_rad_tables
    from c2ray_tpu.ops.thermal import setup_cool
    from c2ray_tpu.solver import Evolve3D
    from c2ray_tpu.state import initial_state

    cfg = test_problem_config(mesh=n, dtype=dtype, use_lls=False,
                              cosmological=False, isothermal=False,
                              sweep_backend=backend, source_batch=s,
                              thermal_chunk=thermal_chunk)
    tables = build_rad_tables(cfg)
    solver = Evolve3D(cfg, tables, cool=setup_cool(cfg))
    rng = np.random.default_rng(42)
    srcpos = rng.integers(0, n, (s, 3)).astype(np.int32)
    nflux = 10.0 ** rng.uniform(7.2, 8.2, s)
    nh = 1.98e-4
    ndens = jnp.full(cfg.mesh, cfg.np_dtype(nh))
    dr = 2.9e24 / (n / 64)
    dt = 3.0e13
    state = initial_state(cfg)

    t0 = time.time()
    state, info = solver.evolve3d(state, ndens, dr, srcpos, nflux, dt)
    compile_s = time.time() - t0
    t0 = time.time()
    state, info = solver.evolve3d(state, ndens, dr, srcpos, nflux, dt)
    step_s = time.time() - t0
    np.savez(out_npz,
             xh1=np.asarray(state.xh1, np.float64),
             temper=np.asarray(state.temper_current, np.float64),
             niter=info.niter, step_s=step_s, compile_s=compile_s,
             mean_x=info.mean_xh1)
    print(f"[{platform}] mesh={n}^3 s={s} niter={info.niter} "
          f"mean_x={info.mean_xh1:.6f} step={step_s:.2f}s "
          f"(compile+first {compile_s:.0f}s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=128)
    ap.add_argument("--sources", type=int, default=4)
    ap.add_argument("--worker", default=None)
    ap.add_argument("--thermal-chunk", type=int, default=0,
                    help="axis-0 rows per thermal slab (0 = whole grid; "
                         "the 256^3 whole-grid non-iso program crashes "
                         "the axon worker - chunking is the workaround)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.worker:
        return run_one(args.worker, args.mesh, args.sources, args.out,
                       args.thermal_chunk)

    here = os.path.abspath(__file__)
    outs = {}
    for plat in ("tpu", "cpu"):
        out = f"/tmp/thermal_{plat}_{args.mesh}.npz"
        outs[plat] = out
        rc = subprocess.run([sys.executable, here, "--worker", plat,
                             "--mesh", str(args.mesh),
                             "--sources", str(args.sources),
                             "--thermal-chunk", str(args.thermal_chunk),
                             "--out", out]).returncode
        assert rc == 0, f"{plat} worker failed"

    t = np.load(outs["tpu"])
    c = np.load(outs["cpu"])
    dx = np.abs(t["xh1"] - c["xh1"])
    dT = np.abs(t["temper"] - c["temper"]) / c["temper"]
    mean_rel = abs(t["mean_x"] - c["mean_x"]) / c["mean_x"]
    n = args.mesh
    sub = (slice(n // 4, n // 4 + 32),) * 3
    print(f"mean_x rel diff (f32 TPU vs f64 CPU): {mean_rel:.2e}")
    print(f"xh1  |diff|: mean {dx.mean():.2e}  p99 "
          f"{np.percentile(dx, 99):.2e}  max {dx.max():.2e}")
    print(f"T rel diff : mean {dT.mean():.2e}  p99 "
          f"{np.percentile(dT, 99):.2e}  max {dT.max():.2e}")
    print(f"subcube xh1 p99 |diff|: "
          f"{np.percentile(np.abs(t['xh1'][sub] - c['xh1'][sub]), 99):.2e}")
    assert mean_rel < 1e-3
    # fronts may shift by a fraction of a cell between precisions; the
    # bulk (99th percentile) must agree tightly
    assert np.percentile(dx, 99) < 5e-3
    assert np.percentile(dT, 99) < 5e-3
    print("OK", flush=True)


if __name__ == "__main__":
    main()

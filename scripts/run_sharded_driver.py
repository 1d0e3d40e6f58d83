"""End-to-end DRIVER run at a production mesh under the halo layout.

VERDICT r3 item 1's acceptance run: an 864^3 simulation — not a
standalone march — through C2RayDriver on the virtual 8-device CPU mesh,
with slab-sharded density ingestion (a synthetic cubep3m cube is
slab-read per shard; no process materializes the full grid), the
standard output streams, and a peak-RSS assertion proving the run fits
in ~sharded memory (a replicated-grid run at the same mesh would need
every device to hold every O(N^3) array: 8x the footprint).

The reference's production meshes run to 864^3-1200^3
(/root/reference/sizes.f90:50-71); its driver runs under any link-time
parallel mode (makefile_core:40-104).  This script proves the same
property runtime-selected: `python -m c2ray_tpu ... --layout halo`.

Run:  python scripts/run_sharded_driver.py [--mesh 864] [--max-shell 64]
(~30-60 min on the 2-core CPU image at 864^3; use --mesh 256 for a
quicker check)
"""

import argparse
import os
import resource
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=864)
    ap.add_argument("--max-shell", type=int, default=64,
                    help="march radius cap (full radius is N/2; capped so "
                         "the 2-core CPU run finishes in under an hour)")
    ap.add_argument("--workdir", default="/tmp/c2ray_sharded_run")
    ap.add_argument("--sources", type=int, default=8)
    ap.add_argument("--flux", type=float, default=1e56)
    ap.add_argument("--z2", type=float, default=8.95,
                    help="second redshift slice; closer to 9.0 = shorter "
                         "dt = fewer convergence iterations (use ~8.995 "
                         "for a fast acceptance run on the CPU mesh)")
    ap.add_argument("--max-iters", type=int, default=0,
                    help="cap the convergence iterations (0 = default): "
                         "reachability demos (e.g. 1200^3) bound the "
                         "step and still write outputs — the solver "
                         "commits the best iterate at the cap")
    ap.add_argument("--no-output-check", action="store_true")
    args = ap.parse_args()

    from c2ray_tpu.config import test_problem_config
    from c2ray_tpu.driver import C2RayDriver, DriverConfig
    from c2ray_tpu.models.nbody import cubep3m_adapter
    from c2ray_tpu.parallel.layout import ParallelLayout
    from c2ray_tpu.utils.io_fortran import write_stream_cube

    n = args.mesh
    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    t0 = time.time()

    # synthetic cubep3m inputs: a (seekable) density cube written in
    # z-streamed chunks so this script itself never holds the cube, and
    # a handful of bright sources
    dens_path = os.path.join(wd, "9.000n_all.dat")
    if not (os.path.exists(dens_path)
            and os.path.getsize(dens_path) == 12 + 4 * n**3):
        rng = np.random.default_rng(864)
        with open(dens_path, "wb") as f:
            np.asarray([n, n, n], np.int32).tofile(f)
            for k0 in range(0, n, 16):
                kc = min(16, n - k0)
                # F-order contiguous span = z-planes [k0, k0+kc)
                blk = rng.uniform(0.2, 3.0, (kc, n, n)).astype(np.float32)
                blk.tofile(f)      # (k, j, i) C-order == (i, j, k) F-order
        print(f"wrote synthetic density cube ({4 * n**3 / 1e9:.2f} GB) "
              f"in {time.time() - t0:.0f}s", flush=True)

    # a close slice pair keeps dt (and the convergence-iteration count)
    # bounded: fronts move few cells per step, so the 1e-4 relative
    # convergence criterion is met in a handful of iterations
    (lambda p: open(p, "w").write(f"2\n9.000\n{args.z2:5.3f}\n"))(
        os.path.join(wd, "redshifts.dat"))
    rng = np.random.default_rng(7)
    with open(os.path.join(wd, "9.000-coarsest_sources.dat"), "w") as f:
        f.write(f"{args.sources}\n")
        for _ in range(args.sources):
            i, j, k = rng.integers(1, n + 1, 3)
            f.write(f"{i} {j} {k} {args.flux:.3e} 0.0\n")  # raw rates (Test)

    cfg = test_problem_config(mesh=n, dtype="float32", use_lls=False,
                              boxsize_mpc_h=500.0,
                              max_shell=args.max_shell,
                              # per-iteration convergence statistics in
                              # the run log (diagnosing iteration counts
                              # at production meshes, VERDICT r4 weak 4)
                              log_convergence=True)
    if args.max_iters:
        cfg = cfg.replace(max_global_iterations=args.max_iters)
    ad = cubep3m_adapter(cfg, 500.0, 2 * n,
                         os.path.join(wd, "redshifts.dat"),
                         dir_dens=wd + "/", dir_src=wd + "/")
    dc = DriverConfig(number_timesteps=1, number_outputs=1, uv_recipe=7,
                      results_dir=os.path.join(wd, "results") + "/",
                      dump_dir=wd + "/")
    lay = ParallelLayout(kind="halo", n_dom=8)
    drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, layout=lay)
    print(f"driver init done at {time.time() - t0:.0f}s "
          f"rss={rss_gb():.1f} GB", flush=True)
    state = drv.run(max_slices=1)
    wall = time.time() - t0

    # footprint accounting: a replicated run holds every O(N^3) array on
    # every device - the 5 prognostic/rate cubes PLUS the march's staged
    # faces and scan temporaries (measured ~10 cubes/device at full
    # radius, BENCH_HISTORY round-3 864^3 entry: staged faces alone are
    # ~10.4 GB = 4 cubes on ONE device).  The sharded run must fit in a
    # fraction of that (and the replicated total provably exceeds this
    # 125 GB host).
    cube_gb = n**3 * 4 / 1e9
    live_arrays = 10           # 5 state/rate cubes + ~5 march/chem temps
    replicated_gb = 8 * live_arrays * cube_gb
    peak = rss_gb()
    shards = len(state.xh1.sharding.device_set)
    print(f"mesh={n}^3 halo driver run: wall={wall:.0f}s "
          f"peak_rss={peak:.1f} GB (replicated-equivalent ~{replicated_gb:.0f}"
          f" GB) shards={shards}", flush=True)
    res = sorted(os.listdir(os.path.join(wd, "results")))
    print("outputs:", res, flush=True)
    assert shards == 8
    assert any(f.startswith("xfrac3D") for f in res)
    assert any(f.startswith("PhotonCounts") for f in res)
    hist = drv.history[-1]
    print(f"niter={hist['niter']} mean_x={hist['mean_xh1']:.3e} "
          f"photcons={hist['photon_stats'].get('photon_cons', 0):.4f}",
          flush=True)
    if replicated_gb / 2 > 8.0:
        # only meaningful at production meshes where the grids dominate
        # the footprint (small meshes are fixed-overhead-dominated)
        assert peak < replicated_gb / 2, (
            f"peak RSS {peak:.1f} GB is not convincingly sub-replicated")
    print("OK", flush=True)


if __name__ == "__main__":
    main()

"""Worker process for the multi-process (multi-host analogue) driver test.

Launched by tests/test_multiprocess.py as N subprocesses, each with 4
virtual CPU devices; together they form one 4N-device distributed JAX
runtime (DCN collectives over Gloo).  Each process runs the SAME driver
code on the same inputs - the reference's SPMD rank discipline
(mpi.F90:83-178) - with sources sharded over the global device mesh and
all file I/O gated on process 0.

Usage: python mp_worker.py <process_id> <num_processes> <port> <workdir>
       [layout_kind]

layout_kind (default "src") selects the runtime parallel layout; "halo"
runs the fully grid-sharded layout with the dom mesh axis SPANNING the
processes (the Cartesian-topology distribution the reference built but
never enabled, mpi.F90:183-275).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4"
                           ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    layout_kind = sys.argv[5] if len(sys.argv) > 5 else "src"

    from c2ray_tpu.parallel import multihost as mh

    is_multi = mh.init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid)
    assert is_multi == (nproc > 1)
    assert mh.process_count() == nproc
    assert mh.process_index() == pid
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np

    from c2ray_tpu.config import test_problem_config
    from c2ray_tpu.driver import C2RayDriver, DriverConfig
    from c2ray_tpu.models.nbody import test_adapter
    from c2ray_tpu.parallel.source_shard import (make_device_mesh,
                                                 sharded_raytracer)

    cfg = test_problem_config(mesh=16, dtype="float64", use_lls=False)
    dc = DriverConfig(number_timesteps=2, number_outputs=1,
                      results_dir=os.path.join(workdir, "results") + "/",
                      dump_dir=workdir + "/")
    ad = test_adapter(cfg, source_dir=workdir + "/")
    if layout_kind == "src":
        # source sharding over the GLOBAL device mesh: collectives ride
        # ICI within a process and DCN across processes
        raytracer = sharded_raytracer(make_device_mesh())
        drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc,
                          raytracer=raytracer, verbose=(pid == 0))
    else:
        # grid-sharded layouts with the dom axis spanning the processes
        from c2ray_tpu.parallel.layout import ParallelLayout
        lay = (ParallelLayout(kind="halo", n_src=1, n_dom=4 * nproc)
               if layout_kind == "halo"
               else ParallelLayout(kind="dom", n_src=2, n_dom=2 * nproc))
        drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, layout=lay,
                          verbose=(pid == 0))

    # non-I/O processes must hold no open output files (rank-0 gating,
    # output.F90:179)
    if pid != 0:
        assert drv.output._pc1 is None
        assert drv._logf is None
        assert drv.clocks._f is None
        assert drv.dumper.collective or not drv.dumper.enabled

    state = drv.run(max_slices=1)
    if layout_kind == "halo":
        # the grid is cross-process sharded: assert it, then all-gather
        # (a collective both processes join) for the parity files
        assert not state.xh1.is_fully_addressable
        from c2ray_tpu.parallel.layout import replicate_to_host
        x = replicate_to_host(state.xh1)
    else:
        x = np.asarray(state.xh1)
    print(f"proc {pid}: mean_x={x.mean():.12e} niter="
          f"{[h['niter'] for h in drv.history]}", flush=True)
    # every process must hold the identical replicated answer
    np.save(os.path.join(workdir, f"state_proc{pid}.npy"), x)
    print(f"proc {pid}: OK", flush=True)


if __name__ == "__main__":
    main()

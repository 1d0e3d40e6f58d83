"""Multi-process runtime tests (the reference's multi-node MPI layer).

Two subprocesses x 4 virtual CPU devices form one 8-device distributed
JAX runtime (jax.distributed + Gloo DCN collectives) and run the full
driver with source sharding over the global mesh.  Asserts:
  * the distributed answer matches a single-process 8-device golden run
    of the same problem,
  * exactly ONE set of output files is produced (process-0 I/O gating,
    the reference's `rank == 0` discipline: output.F90:179,
    sourceprops.F90:154, mpi.F90:93-151),
  * both processes hold the identical replicated final state.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, workdir: str, timeout: float = 900.0,
                 layout: str = "src"):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(nproc), str(port), workdir,
         layout],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(nproc)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK" in out
    return outs


@pytest.mark.slow
def test_two_process_driver_matches_single_process(tmp_path):
    # shared "filesystem" inputs
    (tmp_path / "test_sources.dat").write_text(
        "2\n8 8 8 1e57 0.0\n4 12 6 5e56 0.0\n")

    # distributed run: 2 processes x 4 devices
    mp_dir = tmp_path / "mp"
    mp_dir.mkdir()
    (mp_dir / "test_sources.dat").write_text(
        (tmp_path / "test_sources.dat").read_text())
    _run_workers(2, str(mp_dir))

    # single-process golden: same problem, same 8-device sharded layout,
    # via one worker process with num_processes=1... but 4 devices != 8;
    # instead run the driver inline on this process's 8-device CPU mesh
    from c2ray_tpu.config import test_problem_config
    from c2ray_tpu.driver import C2RayDriver, DriverConfig
    from c2ray_tpu.models.nbody import test_adapter
    from c2ray_tpu.parallel.source_shard import (make_device_mesh,
                                                 sharded_raytracer)

    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()
    (sp_dir / "test_sources.dat").write_text(
        (tmp_path / "test_sources.dat").read_text())
    cfg = test_problem_config(mesh=16, dtype="float64", use_lls=False)
    dc = DriverConfig(number_timesteps=2, number_outputs=1,
                      results_dir=str(sp_dir / "results") + "/",
                      dump_dir=str(sp_dir) + "/")
    ad = test_adapter(cfg, source_dir=str(sp_dir) + "/")
    drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc,
                      raytracer=sharded_raytracer(make_device_mesh()),
                      verbose=False)
    s_golden = drv.run(max_slices=1)
    x_golden = np.asarray(s_golden.xh1)

    # 1. both processes hold the identical replicated final state
    x0 = np.load(mp_dir / "state_proc0.npy")
    x1 = np.load(mp_dir / "state_proc1.npy")
    np.testing.assert_array_equal(x0, x1)

    # 2. the distributed answer matches the single-process golden
    np.testing.assert_allclose(x0, x_golden, rtol=1e-12, atol=0.0)

    # 3. exactly one set of outputs: same files as the golden run, with
    #    the same PhotonCounts row count (doubled writes would double it)
    mp_files = sorted(os.listdir(mp_dir / "results"))
    sp_files = sorted(os.listdir(sp_dir / "results"))
    assert mp_files == sp_files
    mp_rows = (mp_dir / "results" / "PhotonCounts.out").read_text()
    sp_rows = (sp_dir / "results" / "PhotonCounts.out").read_text()
    assert len(mp_rows.splitlines()) == len(sp_rows.splitlines())
    # the output cube is the golden cube (rank-0 wrote device-replicated
    # data once)
    from c2ray_tpu.models.nbody import fortran_f6_3
    from c2ray_tpu.utils.io_fortran import read_sm3d
    z1 = fortran_f6_3(float(ad.zred_array[1]))
    cube = read_sm3d(str(mp_dir / "results" / f"xfrac3D_{z1}.bin"),
                     np.float64, expect_mesh=(16, 16, 16))
    np.testing.assert_allclose(cube, x_golden, rtol=1e-12)


@pytest.mark.slow
def test_two_process_halo_grid_sharding(tmp_path):
    """The fully grid-sharded (halo) layout with the dom mesh axis
    SPANNING two processes — each process holds only half the grid rows
    — matches a single-process serial driver run (the distributed-memory
    Cartesian decomposition the reference's mpi.F90:183-275 builds but
    never enables)."""
    srcs = "2\n8 8 8 1e57 0.0\n4 12 6 5e56 0.0\n"

    mp_dir = tmp_path / "mp"
    mp_dir.mkdir()
    (mp_dir / "test_sources.dat").write_text(srcs)
    _run_workers(2, str(mp_dir), layout="halo")

    # serial single-device golden
    from c2ray_tpu.config import test_problem_config
    from c2ray_tpu.driver import C2RayDriver, DriverConfig
    from c2ray_tpu.models.nbody import test_adapter

    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()
    (sp_dir / "test_sources.dat").write_text(srcs)
    cfg = test_problem_config(mesh=16, dtype="float64", use_lls=False)
    dc = DriverConfig(number_timesteps=2, number_outputs=1,
                      results_dir=str(sp_dir / "results") + "/",
                      dump_dir=str(sp_dir) + "/")
    ad = test_adapter(cfg, source_dir=str(sp_dir) + "/")
    drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False)
    x_golden = np.asarray(drv.run(max_slices=1).xh1)

    x0 = np.load(mp_dir / "state_proc0.npy")
    x1 = np.load(mp_dir / "state_proc1.npy")
    np.testing.assert_array_equal(x0, x1)
    np.testing.assert_allclose(x0, x_golden, rtol=1e-12, atol=0.0)

    # rank-0 wrote ONE set of outputs; the streamed (collectively
    # gathered) output cube matches the serial cube byte-for-byte
    from c2ray_tpu.models.nbody import fortran_f6_3
    z1 = fortran_f6_3(float(ad.zred_array[1]))
    mp_cube = (mp_dir / "results" / f"xfrac3D_{z1}.bin").read_bytes()
    sp_cube = (sp_dir / "results" / f"xfrac3D_{z1}.bin").read_bytes()
    assert mp_cube == sp_cube


def test_broadcast_obj_single_process_identity():
    from c2ray_tpu.parallel import multihost as mh

    obj = {"a": np.arange(3), "b": "text"}
    out = mh.broadcast_obj(obj)
    assert out is obj
    assert mh.read_on_io_rank(lambda v: v + 1, 41) == 42
    assert mh.process_count() >= 1 and mh.is_io_rank() in (True, False)

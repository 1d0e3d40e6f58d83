"""Checkpoint/restart tests: the reference's three restart mechanisms."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.ops.tables import build_rad_tables
from c2ray_tpu.solver import Evolve3D
from c2ray_tpu.state import initial_state
from c2ray_tpu.utils.checkpoint import IterDumper, load_slice_restart
from c2ray_tpu.utils.io_fortran import read_sm3d, write_sm3d
from c2ray_tpu.utils.output import OutputWriter


def test_sm3d_roundtrip(tmp_path):
    a = np.random.default_rng(0).random((5, 6, 7))
    p = str(tmp_path / "cube.bin")
    write_sm3d(p, a, np.float64)
    b = read_sm3d(p, np.float64, expect_mesh=(5, 6, 7))
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError):
        read_sm3d(p, np.float64, expect_mesh=(5, 6, 8))


def test_slice_restart_roundtrip(tmp_path):
    """restart=1: resume from the code's own xfrac3D output
    (C2Ray.F90:234-237)."""
    cfg = make_config(mesh=8, dtype="float64")
    state = initial_state(cfg)
    xh = np.random.default_rng(1).random((8, 8, 8))
    out = OutputWriter(cfg, results_dir=str(tmp_path) + "/")
    out.write_stream2(8.884, jnp.asarray(xh))
    st2 = load_slice_restart(cfg, str(tmp_path) + "/", 8.884)
    np.testing.assert_allclose(np.asarray(st2.xh1), xh, rtol=1e-15)


def test_iterdump_double_buffer(tmp_path):
    d = IterDumper(dump_dir=str(tmp_path), interval_s=0.0)
    g = np.ones((4, 4, 4))
    p1 = d.dump(3, 0.5, g, g * 2, g * 3)
    p2 = d.dump(4, 0.6, g, g * 2, g * 3)
    assert p1.endswith("iterdump1.npz") and p2.endswith("iterdump2.npz")
    loaded = IterDumper.load(str(tmp_path), 2)
    assert loaded["niter"] == 4
    np.testing.assert_array_equal(loaded["xh_av"], g * 2)


def test_iter_restart_resumes(tmp_path):
    """restart inside evolve3D from a dump reproduces the uninterrupted
    run (evolve.F90:328-426)."""
    n = 16
    cfg = make_config(mesh=n, dtype="float64", use_lls=False,
                      cosmological=False)
    tabs = build_rad_tables(cfg)
    solver = Evolve3D(cfg, tabs)
    state = initial_state(cfg)
    ndens = jnp.full((n, n, n), 1.98e-4)
    src = np.array([[8, 8, 8]], np.int32)
    nflux = np.array([1e9])
    dt = 3.1e14

    # uninterrupted run
    s_full, info_full = solver.evolve3d(state, ndens, 2.9e24, src, nflux, dt)
    assert info_full.niter > 6

    # interrupted mid-convergence: a run capped at fewer iterations
    # writes its dump (the "crash" point), then the full solver resumes
    # from it and must land on the uninterrupted answer - the resumed
    # trajectory re-runs the pending chemistry pass and continues with
    # identical iterates (start_from_dump, evolve.F90:328-426)
    cfg_cut = make_config(mesh=n, dtype="float64", use_lls=False,
                          cosmological=False, max_global_iterations=5)
    solver_cut = Evolve3D(cfg_cut, tabs)
    dumper = IterDumper(dump_dir=str(tmp_path), interval_s=0.0)
    solver_cut.evolve3d(state, ndens, 2.9e24, src, nflux, dt, dumper=dumper)
    which = 1 if os.path.exists(tmp_path / "iterdump1.npz") else 2
    loaded = IterDumper.load(str(tmp_path), which)
    assert int(loaded["niter"]) < info_full.niter
    s_res, info_res = solver.evolve3d(state, ndens, 2.9e24, src, nflux, dt,
                                      iter_restart=loaded)
    np.testing.assert_allclose(np.asarray(s_res.xh1), np.asarray(s_full.xh1),
                               rtol=1e-10)


def test_report_memory():
    from c2ray_tpu.utils.report_memory import report_memory
    m = report_memory()
    assert m.get("VmRSS", 0) > 0

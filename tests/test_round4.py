"""Round-4 parity additions: stdin input protocol, per-iteration Timings
stamps, driver-reachable grid-sharded layouts."""

import io
import os

import numpy as np
import pytest

from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.driver import C2RayDriver, DriverConfig, read_input_stdin
from c2ray_tpu.models.nbody import test_adapter as make_test_adapter


def test_stdin_protocol():
    """The reference reads the ordered answers from stdin when no input
    file is given (C2Ray.F90:115-127); one-line and per-line forms."""
    dc = read_input_stdin(stream=io.StringIO("n n 1 7 1 1"))
    assert (dc.restart, dc.nz0, dc.uv_recipe) == (0, 0, 7)
    assert (dc.number_timesteps, dc.number_outputs) == (1, 1)
    dc2 = read_input_stdin("cubep3m",
                           stream=io.StringIO("y\nn\n3\nzlist.dat\n0\n4\n2\n"))
    assert dc2.restart == 1 and dc2.redshift_file == "zlist.dat"
    assert dc2.number_timesteps == 4
    # empty pipe (< /dev/null) falls back to defaults instead of dying
    dc3 = read_input_stdin(stream=io.StringIO(""))
    assert dc3.number_timesteps == DriverConfig().number_timesteps


def test_per_iteration_timings_stamps(tmp_path):
    """evolve3D stamps Timings.log every convergence iteration
    (evolve.F90:272-273)."""
    cfg = make_config(mesh=16, dtype="float64", use_lls=False)
    (tmp_path / "test_sources.dat").write_text("1\n8 8 8 1e55 0.0\n")
    dc = DriverConfig(number_timesteps=1, number_outputs=1,
                      results_dir=str(tmp_path / "results") + "/")
    ad = make_test_adapter(cfg, source_dir=str(tmp_path) + "/")
    drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False)
    drv.run(max_slices=1)
    log = (tmp_path / "results" / "Timings.log").read_text()
    niter = drv.history[-1]["niter"]
    assert niter >= 2
    for i in range(1, niter + 1):
        assert f"Time after iteration {i}:" in log

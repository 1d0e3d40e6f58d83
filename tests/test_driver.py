"""End-to-end driver tests: test problem + synthetic cubep3m run."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.driver import C2RayDriver, DriverConfig, read_input_file
from c2ray_tpu.models.nbody import (cubep3m_adapter, fortran_f6_3,
                                    test_adapter as make_test_adapter)
from c2ray_tpu.utils.io_fortran import read_sm3d, write_stream_cube


def test_input_file_protocol(tmp_path):
    p = tmp_path / "input"
    p.write_text("n   ! restart\nn   ! mid\n1   ! slice\n7   ! uv\n"
                 "10  ! steps\n1   ! outputs\n")
    dc = read_input_file(str(p))
    assert (dc.restart, dc.nz0, dc.uv_recipe) == (0, 0, 7)
    assert (dc.number_timesteps, dc.number_outputs) == (10, 1)
    p2 = tmp_path / "input2"
    p2.write_text("y\nn\n3\nredshifts.dat\n0\n4\n2\n")
    dc2 = read_input_file(str(p2), nbody_type="cubep3m")
    assert dc2.restart == 1 and dc2.nz0 == 2
    assert dc2.redshift_file == "redshifts.dat"
    assert dc2.uv_recipe == 0
    # pmfast also reads a redshift file (nbody_pmfast.F90:212-247)
    dc3 = read_input_file(str(p2), nbody_type="pmfast")
    assert dc3.redshift_file == "redshifts.dat"
    # gadget reads ONE initial redshift (nbody_gadget.F90:204-227)
    p3 = tmp_path / "input3"
    p3.write_text("n\nn\n1\n8.5\n7\n4\n2\n")
    dc4 = read_input_file(str(p3), nbody_type="gadget")
    assert dc4.zred_initial == 8.5 and dc4.uv_recipe == 7


def test_driver_test_problem(tmp_path):
    """Two slices of the bundled test problem through the full driver."""
    cfg = make_config(mesh=16, dtype="float64", use_lls=False)
    (tmp_path / "test_sources.dat").write_text("1\n8 8 8 1e57 0.0\n")
    dc = DriverConfig(number_timesteps=2, number_outputs=1,
                      results_dir=str(tmp_path / "results") + "/")
    ad = make_test_adapter(cfg, source_dir=str(tmp_path) + "/")
    drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False)
    state = drv.run(max_slices=2)
    x = np.asarray(state.xh1)
    assert x[8, 8, 8] > 0.99
    # outputs with reference naming exist and are readable
    z1 = fortran_f6_3(float(ad.zred_array[1]))
    cube = read_sm3d(str(tmp_path / "results" / f"xfrac3D_{z1}.bin"),
                     np.float64, expect_mesh=(16, 16, 16))
    assert cube.max() > 0.99
    pc = (tmp_path / "results" / "PhotonCounts.out").read_text()
    assert len(pc.splitlines()) >= 3
    # slice restart from the produced output resumes cleanly
    dc2 = DriverConfig(number_timesteps=2, number_outputs=1, restart=1, nz0=1,
                       results_dir=str(tmp_path / "results") + "/")
    drv2 = C2RayDriver(cfg, adapter=ad, driver_cfg=dc2, verbose=False)
    state2 = drv2.run(max_slices=1)
    # re-running slice 1 from its restart point reproduces the original end
    np.testing.assert_allclose(np.asarray(state2.xh1), x, rtol=1e-8)


def test_driver_compressed_storage_roundtrip(tmp_path):
    """The full driver under compressed min-fraction storage: outputs
    decode to the dense run's cubes, and a slice restart re-encodes the
    stored f64 cube without drift."""
    from c2ray_tpu.state import xh1_of
    (tmp_path / "test_sources.dat").write_text("1\n8 8 8 1e57 0.0\n")

    def run(compressed, results, restart=None):
        cfg = make_config(mesh=16, dtype="float64", use_lls=False,
                          compressed_xfrac=compressed)
        dc = DriverConfig(number_timesteps=2, number_outputs=1,
                          results_dir=str(tmp_path / results) + "/")
        if restart is not None:
            dc.restart, dc.nz0 = 1, restart
        ad = make_test_adapter(cfg, source_dir=str(tmp_path) + "/")
        drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False)
        return drv.run(max_slices=2 if restart is None else 1), ad

    sd, _ = run(False, "res_dense")
    sc, ad = run(True, "res_comp")
    np.testing.assert_allclose(np.asarray(xh1_of(sc.xh1)),
                               np.asarray(sd.xh1), rtol=1e-10, atol=1e-14)
    # written cubes are decoded (identical to the dense run's)
    z1 = fortran_f6_3(float(ad.zred_array[1]))
    cube_d = read_sm3d(str(tmp_path / "res_dense" / f"xfrac3D_{z1}.bin"),
                       np.float64)
    cube_c = read_sm3d(str(tmp_path / "res_comp" / f"xfrac3D_{z1}.bin"),
                       np.float64)
    np.testing.assert_allclose(cube_c, cube_d, rtol=1e-10, atol=1e-14)
    # slice restart under compressed storage reproduces the dense end state
    s2, _ = run(True, "res_comp", restart=1)
    np.testing.assert_allclose(np.asarray(xh1_of(s2.xh1)),
                               np.asarray(sd.xh1), rtol=1e-8)


def test_driver_cubep3m_synthetic(tmp_path):
    """Synthetic cubep3m run: density cubes + source lists + redshift file
    in the reference's file formats, Iliev-et-al UV model."""
    n = 16
    n_box = 64
    cfg = make_config(mesh=n, dtype="float64", use_lls=False)
    zreds = [9.0, 8.9, 8.8]
    zfile = tmp_path / "redshifts.dat"
    zfile.write_text(f"{len(zreds)}\n" + "".join(f"{z}\n" for z in zreds))

    rng = np.random.default_rng(0)
    for z in zreds:
        zs = fortran_f6_3(z)
        # density in "grid" units (mean 1), stream-access with header
        # (nbody_cubep3m.F90:80-90,126-135)
        dens = rng.lognormal(0.0, 0.3, (n, n, n)).astype(np.float32)
        write_stream_cube(str(tmp_path / f"{zs}n_all.dat"), dens, np.float32)
        # source list: pos(3, 1-based) + HMACH + LMACH masses [grid masses]
        (tmp_path / f"{zs}-coarsest_sources.dat").write_text(
            "2\n8 8 8 50.0 0.0\n4 12 6 20.0 5.0\n")

    ad = cubep3m_adapter(cfg, boxsize=cfg.boxsize_mpc_h, n_box=n_box,
                         redshift_file=str(zfile), id_str="coarsest",
                         dir_dens=str(tmp_path) + "/",
                         dir_src=str(tmp_path) + "/")
    assert ad.num_zred == 3
    assert ad.m_grid > 0

    dc = DriverConfig(uv_recipe=0, number_timesteps=2, number_outputs=1,
                      results_dir=str(tmp_path / "results") + "/")
    drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False)
    state = drv.run(max_slices=2)
    x = np.asarray(state.xh1)
    assert x[7, 7, 7] > 0.5          # 0-based position of the 1-based (8,8,8)
    assert 0.0 < x.mean() < 1.0
    assert np.isfinite(x).all()


def test_driver_kitchen_sink(tmp_path):
    """All optional physics at once through the full driver: cosmological
    scaling, photo-heating, GCM clumping C(z), type-1 LLS, and an X-ray
    power-law component — the joint path no single-feature test covers."""
    from c2ray_tpu.config import SEDConfig
    sed = SEDConfig(use_xray_sed=True)
    cfg = make_config(mesh=12, dtype="float64", cosmological=True,
                      isothermal=False, initial_temperature=100.0,
                      use_lls=True, type_of_lls=1, lls_model=5,
                      type_of_clumping=2, sed=sed)
    # stellar (col 4) + X-ray (col 5) raw photon rates, Test recipe
    (tmp_path / "test_sources.dat").write_text(
        "2\n6 6 6 5e56 2e55\n3 9 4 1e56 0.0\n")
    dc = DriverConfig(number_timesteps=2, number_outputs=1,
                      results_dir=str(tmp_path / "results") + "/")
    ad = make_test_adapter(cfg, source_dir=str(tmp_path) + "/")
    # GCM C(z) parameter file in the reference's Fortran-unformatted
    # format (paramsGCM_<res>Mpc.dat, clumping_module.F90:122-157); the
    # driver loads it at init from the adapter's dir_clump, passing the
    # grid resolution (C2Ray.F90:264) - no manual injection
    from c2ray_tpu.utils.io_fortran import write_unformatted_records
    gcm = np.array([0.6, 0.02, 0.002, 0.0, 0.0, 0.0])
    res = f"{cfg.dr_comoving / const.MPC:5.3f}"
    write_unformatted_records(str(tmp_path / f"paramsGCM_{res}Mpc.dat"),
                              [gcm.tobytes()])
    ad.dir_clump = str(tmp_path)
    drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False)
    assert drv.clumping_model.evaluate(9.0) > 1.0
    state = drv.run(max_slices=2)
    x = np.asarray(state.xh1)
    t = np.asarray(state.temper_current)
    assert x[5, 5, 5] > 0.9            # 0-based position of 1-based (6,6,6)
    assert 0.0 < x.mean() < 1.0 and np.isfinite(x).all()
    # photo-heating raised the ionized region above the initial 100 K
    assert t[5, 5, 5] > 1e3
    assert np.isfinite(t).all()
    # LLS losses were tallied (homogeneous fog absorbs photons)
    assert any(h["lls_loss"] > 0.0 for h in drv.history)
    # conservation holds jointly within the reference's own 15% criterion
    pc = (tmp_path / "results" / "PhotonCounts.out").read_text()
    assert len(pc.splitlines()) >= 3


def test_cli_smoke(tmp_path, monkeypatch):
    from c2ray_tpu.__main__ import main
    (tmp_path / "test_sources.dat").write_text("1\n4 4 4 1e56 0.0\n")
    inp = tmp_path / "input"
    inp.write_text("n\nn\n1\n7\n1\n1\n")
    rc = main([str(inp), "--mesh", "8", "--dtype", "float64",
               "--source-dir", str(tmp_path) + "/",
               "--results-dir", str(tmp_path / "res") + "/",
               "--max-slices", "1"])
    assert rc == 0
    assert (tmp_path / "res" / "PhotonCounts2.out").exists()

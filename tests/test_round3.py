"""Round-3 regression tests: iterdump rate-grid resume, driver-wired
clumping parameter files, compressed photon audit, clustered-catalog
adaptive radii, per-step memory reporting, and the widened CLI."""

import os

import numpy as np
import jax.numpy as jnp

from c2ray_tpu import constants as const
from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.driver import C2RayDriver, DriverConfig
from c2ray_tpu.models.nbody import test_adapter as make_test_adapter
from c2ray_tpu.ops.tables import build_rad_tables
from c2ray_tpu.solver import Evolve3D
from c2ray_tpu.state import initial_state
from c2ray_tpu.utils.checkpoint import IterDumper
from c2ray_tpu.utils.io_fortran import write_unformatted_records


def _counting_solver(cfg, tabs):
    """Evolve3D with host-level sweep/chemistry dispatch counting."""
    solver = Evolve3D(cfg, tabs)
    events = []
    for name in ("_sweep", "_sweep_r", "_tail"):
        orig = getattr(solver, name)

        def wrapped(*a, _orig=orig, _tag=name, **k):
            # _tail is the fused chemistry+audit tail: one dispatch per
            # global chemistry pass
            events.append("chem" if _tag == "_tail" else "sweep")
            return _orig(*a, **k)

        setattr(solver, name, wrapped)
    return solver, events


class TestIterdumpRateGrids:
    def test_resume_enters_pending_chemistry_without_sweep(self, tmp_path):
        """start_from_dump restores phih/photon_loss and runs the pending
        global pass directly - no redundant re-sweep (evolve.F90:154-158,
        328-426); the dump is written post-sweep, pre-chemistry
        (evolve.F90:253-269)."""
        n = 16
        cfg = make_config(mesh=n, dtype="float64", use_lls=False,
                          cosmological=False)
        tabs = build_rad_tables(cfg)
        state = initial_state(cfg)
        ndens = jnp.full((n, n, n), 1.98e-4)
        src = np.array([[8, 8, 8]], np.int32)
        nflux = np.array([1e9])
        dt = 3.1e14

        solver0 = Evolve3D(cfg, tabs)
        s_full, info_full = solver0.evolve3d(state, ndens, 2.9e24, src,
                                             nflux, dt)

        dumper = IterDumper(dump_dir=str(tmp_path), interval_s=0.0)
        solver0.evolve3d(state, ndens, 2.9e24, src, nflux, dt, dumper=dumper)
        which = 1 if os.path.exists(tmp_path / "iterdump1.npz") else 2
        loaded = IterDumper.load(str(tmp_path), which)
        # the dump carries the rate grids (write_iteration_dump dumps
        # photon_loss_all + phih_grid, evolve.F90:285-326)
        assert "phih" in loaded and loaded["phih"].shape == (n, n, n)
        k = int(loaded["niter"])

        # dispatch-order property of the HOST-driven loop (the device
        # while_loop runs every post-resume iteration as one program, so
        # per-iteration dispatch counting only applies here)
        cfg_host = make_config(mesh=n, dtype="float64", use_lls=False,
                               cosmological=False, on_device_loop=False)
        solver, events = _counting_solver(cfg_host, tabs)
        s_res, info_res = solver.evolve3d(state, ndens, 2.9e24, src, nflux,
                                          dt, iter_restart=loaded)
        # first dispatched pass after the restore is CHEMISTRY (the
        # pending global pass), not a sweep
        assert events[0] == "chem"
        # exactly one sweep per post-resume iteration, none for the
        # restored one
        assert events.count("sweep") == info_res.niter - k
        np.testing.assert_allclose(np.asarray(s_res.xh1),
                                   np.asarray(s_full.xh1), rtol=1e-10)

        # the device-loop path resumes identically (pending chemistry,
        # no redundant re-sweep by construction: the whole continuation
        # is one program)
        solver_dev = Evolve3D(cfg, tabs)
        s_dev, info_dev = solver_dev.evolve3d(state, ndens, 2.9e24, src,
                                              nflux, dt,
                                              iter_restart=loaded)
        np.testing.assert_allclose(np.asarray(s_dev.xh1),
                                   np.asarray(s_full.xh1), rtol=1e-10)


class TestClumpingDriverWiring:
    def test_scm_type4_end_to_end(self, tmp_path):
        """Type-4 stochastic clumping through the full driver with
        parameter files loaded at init - no manual injection
        (C2Ray.F90:264, clumping_module.F90:159-223)."""
        cfg = make_config(mesh=10, dtype="float64", type_of_clumping=4,
                          use_lls=False)
        res = f"{cfg.dr_comoving / const.MPC:5.3f}"
        # DCM table: (nz, 7) rows of z a0 a1 a2 + errors, Fortran order
        dcm = np.array([[6.0, 0.1, 0.2, 1.0, 0, 0, 0],
                        [12.0, 0.1, 0.2, 1.0, 0, 0, 0]], np.float64)
        write_unformatted_records(
            str(tmp_path / f"paramsDCM_{res}Mpc.dat"),
            [np.array(dcm.shape, np.int32).tobytes(), dcm.T.tobytes()])
        # SCM table: (nz, nbins, 5) of mu sigma lo hi mid; sigma=0 makes
        # the lognormal draw deterministic exp(mu)
        mu = np.log(1.5)
        scm = np.zeros((2, 3, 5))
        for iz in range(2):
            scm[iz] = [[mu, 0.0, 0.0, 0.8, 0.5],
                       [mu, 0.0, 0.8, 1.5, 1.0],
                       [mu, 0.0, 1.5, 9.0, 2.0]]
        write_unformatted_records(
            str(tmp_path / f"paramsSCM_{res}Mpc.dat"),
            [np.array(scm.shape, np.int32).tobytes(), scm.T.tobytes()])

        (tmp_path / "test_sources.dat").write_text("1\n5 5 5 1e57 0.0\n")
        dc = DriverConfig(number_timesteps=2, number_outputs=1,
                          results_dir=str(tmp_path / "results") + "/")
        ad = make_test_adapter(cfg, source_dir=str(tmp_path) + "/")
        ad.dir_clump = str(tmp_path)
        drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False)
        assert drv.clumping_model.params_scm is not None
        # sigma=0, uniform density (delta=1) => every cell's clumping is
        # exactly exp(mu) = 1.5
        grid = drv.clumping_model.evaluate(
            9.0, np.ones((10, 10, 10)), 1.0)
        np.testing.assert_allclose(grid, 1.5, rtol=1e-12)
        state = drv.run(max_slices=1)
        x = np.asarray(state.xh1)
        assert x[4, 4, 4] > 0.9 and np.isfinite(x).all()

    def test_type2_loads_at_init(self, tmp_path):
        """GCM parameters auto-load from the adapter's dir_clump."""
        cfg = make_config(mesh=8, dtype="float64", type_of_clumping=2)
        res = f"{cfg.dr_comoving / const.MPC:5.3f}"
        gcm = np.array([0.6, 0.02, 0.002, 0.0, 0.0, 0.0])
        write_unformatted_records(
            str(tmp_path / f"paramsGCM_{res}Mpc.dat"), [gcm.tobytes()])
        ad = make_test_adapter(cfg, source_dir=str(tmp_path) + "/")
        ad.dir_clump = str(tmp_path)
        dc = DriverConfig(results_dir=str(tmp_path / "results") + "/")
        drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False)
        c = drv.clumping_model.evaluate(9.0)
        assert abs(c - (0.6 * np.exp(0.02 * 9 + 0.002 * 81) + 1.0)) < 1e-12


class TestCompressedAudit:
    def test_f32_compressed_audit_keeps_neutral_tail(self):
        """The photon audit reads the neutral side natively from
        compressed storage: the x_HI tail inside ionized regions survives
        f32 where the dense path floors it (the reference's compressed
        photonstatistics variant sums both fractions from storage,
        /root/reference/compressed/photonstatistics.F90)."""
        from c2ray_tpu.ops.photonstats import grid_counts
        from c2ray_tpu.state import compress_xh

        n = 8
        tail = 3.7e-9                    # x_HI deep inside an ionized region
        cfg64 = make_config(mesh=n, dtype="float64")
        cfg32c = make_config(mesh=n, dtype="float32",
                             compressed_xfrac=True)
        nd64 = jnp.full((n, n, n), 2e-4, jnp.float64)
        x1_64 = jnp.full((n, n, n), 1.0 - tail, jnp.float64)

        truth = grid_counts(cfg64, nd64, x1_64)
        h0_truth = float(truth.h0)
        assert h0_truth > 0.0

        # dense f32: 1 - tail rounds to 1.0f -> the neutral side vanishes
        nd32 = nd64.astype(jnp.float32)
        dense32 = grid_counts(cfg32c, nd32, x1_64.astype(jnp.float32))
        assert float(dense32.h0) == 0.0

        # compressed f32 stores -tail; the audit reads it tail-exactly
        xc32 = compress_xh(x1_64, jnp.full((n, n, n), tail,
                                           jnp.float64)).astype(jnp.float32)
        comp32 = grid_counts(cfg32c, nd32, xc32, compressed=True)
        np.testing.assert_allclose(float(comp32.h0), h0_truth, rtol=1e-6)

    def test_solver_counts_route_compressed(self):
        """Evolve3D._counts passes compressed storage through natively."""
        from c2ray_tpu.state import compress_xh

        n = 8
        cfg = make_config(mesh=n, dtype="float32", compressed_xfrac=True)
        tabs = build_rad_tables(cfg)
        solver = Evolve3D(cfg, tabs)
        nd = jnp.full((n, n, n), 2e-4, jnp.float32)
        tail = 5e-9
        xc = compress_xh(jnp.full((n, n, n), 1.0 - tail, jnp.float64),
                         jnp.full((n, n, n), tail,
                                  jnp.float64)).astype(jnp.float32)
        c = solver._counts(nd, xc, jnp.zeros(()) + 1e4, jnp.ones(()))
        expect_h0 = 2e-4 * tail * n**3
        np.testing.assert_allclose(float(c.h0), expect_h0, rtol=1e-5)


class TestClusteredCatalog:
    def test_bright_source_in_clump_converges_like_full_radius(self):
        """One 1e57 source inside a 50-source clump: the adaptive-radius
        path must reproduce the full-radius sweep within golden tolerance
        and within +2 convergence iterations (the spacing cap exempts
        top-decile-flux sources; evolve_source.F90:128-136 grows per
        source with no neighbor-spacing cap)."""
        n = 64
        rng = np.random.default_rng(7)
        center = np.array([32, 32, 32])
        pos = np.clip(center + rng.integers(-5, 6, size=(50, 3)), 0, n - 1)
        pos = np.vstack([center, pos]).astype(np.int32)
        # bright enough that its Strömgren radius (~25 cells) exceeds the
        # 51-source spacing cap (~13 cells): the exemption matters here
        flux = np.concatenate([[1e60], rng.uniform(0.5, 2.0, 50) * 1e54])

        cfg_full = make_config(mesh=n, dtype="float64", use_lls=False,
                               cosmological=False, adaptive_sweep=False)
        cfg_ad = cfg_full.replace(adaptive_sweep=True)
        tabs = build_rad_tables(cfg_full)
        state = initial_state(cfg_full)
        ndens = jnp.full((n, n, n), 1.98e-4)
        dt = 1.5e14
        nflux = flux / cfg_full.sed.s_star

        s_full, i_full = Evolve3D(cfg_full, tabs).evolve3d(
            state, ndens, 2.9e24, pos, nflux, dt)
        s_ad, i_ad = Evolve3D(cfg_ad, tabs).evolve3d(
            state, ndens, 2.9e24, pos, nflux, dt)

        assert i_ad.niter <= i_full.niter + 2
        np.testing.assert_allclose(np.asarray(s_ad.xh1),
                                   np.asarray(s_full.xh1),
                                   rtol=2e-4, atol=1e-8)

    def test_top_decile_exempt_from_spacing_cap(self):
        """The bright source's initial radius follows its Strömgren
        estimate, not the many-source spacing cap."""
        n = 64
        cfg = make_config(mesh=n, dtype="float64")
        tabs = build_rad_tables(cfg)
        solver = Evolve3D(cfg, tabs)
        flux = np.concatenate([[1e60], np.full(50, 1e54)]) / cfg.sed.s_star
        assign = solver._initial_radii(flux, 1.98e-4, 2.9e24, 1.5e14)
        ladder = solver._radius_ladder()
        # spacing cap for 51 sources is ~0.75*64/51^(1/3) ~ 13 cells; the
        # bright source's Strömgren radius (~25 cells) is larger
        assert ladder[assign[0]] > ladder[assign[1]]


class TestMemoryReporting:
    def test_memory_lines_in_run_log(self, tmp_path):
        cfg = make_config(mesh=8, dtype="float64", use_lls=False)
        (tmp_path / "test_sources.dat").write_text("1\n4 4 4 1e56 0.0\n")
        dc = DriverConfig(number_timesteps=2, number_outputs=1,
                          results_dir=str(tmp_path / "results") + "/")
        ad = make_test_adapter(cfg, source_dir=str(tmp_path) + "/")
        drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False)
        drv.run(max_slices=1)
        log = (tmp_path / "results" / "C2Ray.log").read_text()
        mem_lines = [ln for ln in log.splitlines() if "memory:" in ln]
        # one per timestep (C2Ray.F90:354)
        assert len(mem_lines) >= 2
        assert "VmRSS" in mem_lines[0]


class TestWidenedCLI:
    def test_physics_flags(self, tmp_path):
        from c2ray_tpu.__main__ import main
        (tmp_path / "test_sources.dat").write_text("1\n4 4 4 1e56 0.0\n")
        inp = tmp_path / "input"
        inp.write_text("n\nn\n1\n7\n1\n1\n")
        rc = main([str(inp), "--mesh", "8", "--dtype", "float64",
                   "--source-dir", str(tmp_path) + "/",
                   "--results-dir", str(tmp_path / "res") + "/",
                   "--max-slices", "1",
                   "--cosmology", "WMAP5", "--rate-eval", "table",
                   "--sweep-backend", "grid", "--compressed-xfrac",
                   "--type-of-lls", "1", "--lls-model", "5"])
        assert rc == 0
        assert (tmp_path / "res" / "PhotonCounts2.out").exists()

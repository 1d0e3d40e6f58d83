"""Round-5 additions: windowed O(r^3) subbox sweeps composed with the
sharded layouts (VERDICT r4 item 1 — the reference's production shape:
each MPI rank traces its source subset WITH subboxes intact,
master_slave.F90:74-96 + evolve_source.F90:128-212)."""

import numpy as np
import pytest

import jax

from c2ray_tpu import (Evolve3D, initial_state, proper_fields,
                       uniform_material)
from c2ray_tpu import test_problem_config as make_config
from c2ray_tpu import constants as const
from c2ray_tpu.cosmology import CosmoClock
from c2ray_tpu.ops.tables import build_rad_tables


def _setup(S=24, mesh=32):
    cfg = make_config(mesh=mesh, dtype="float64", use_lls=False)
    cfg = cfg.replace(adaptive_sweep=True, source_batch=8,
                      adaptive_min_shell=4)
    tabs = build_rad_tables(cfg)
    rng = np.random.default_rng(7)
    src = rng.integers(0, mesh, (S, 3)).astype(np.int32)
    nflux = rng.uniform(3e8, 1e10, S)
    mat = uniform_material(cfg)
    clock = CosmoClock.init(cfg.cosmo, 9.0)
    dt = 1.5e7 * const.YEAR
    nd, dr, _ = proper_fields(cfg, mat, clock.time2zred(0.5 * dt))
    return cfg, tabs, src, nflux, nd, dr, dt


def _run(cfg, solver, nd, dr, src, nflux, dt, sharding=None):
    st = initial_state(cfg)
    if sharding is not None:
        st = type(st)(*[jax.device_put(f, sharding) if f is not None
                        else None for f in st])
    st, info = solver.evolve3d(st, nd, dr, src, nflux, dt)
    return np.asarray(st.xh1), info


@pytest.fixture(scope="module")
def golden():
    cfg, tabs, src, nflux, nd, dr, dt = _setup()
    ref, info = _run(cfg, Evolve3D(cfg, tabs), nd, dr, src, nflux, dt)
    assert info.converged and info.niter >= 3   # promotions exercised
    return cfg, tabs, src, nflux, nd, dr, dt, ref, info


def test_windowed_sharded_src_matches_serial(golden):
    """Adaptive windowed buckets under the source-sharded mesh: each
    device traces its shard through the O(r^3) windowed machinery, one
    psum per bucket — bitwise-equal to the serial adaptive run."""
    from c2ray_tpu.parallel.source_shard import (WindowedShardedSweeper,
                                                 make_device_mesh,
                                                 sharded_raytracer)
    cfg, tabs, src, nflux, nd, dr, dt, ref, info0 = golden
    mesh = make_device_mesh(8)
    sweeper = WindowedShardedSweeper(mesh)
    sol = Evolve3D(cfg, tabs, raytracer=sharded_raytracer(mesh),
                   windowed=sweeper)
    got, info = _run(cfg, sol, nd, dr, src, nflux, dt)
    np.testing.assert_array_equal(got, ref)
    assert info.niter == info0.niter
    # proof the windowed path ran distributed (the round-4 gate is gone)
    assert sweeper._cache, "windowed buckets fell through to full sweeps"


@pytest.mark.parametrize("n_src,n_dom", [(1, 2), (2, 4)])
def test_windowed_halo_matches_serial(golden, n_src, n_dom):
    """Adaptive windowed buckets under the fully grid-sharded halo
    layout: halo-extended slab windows + reverse-ring accumulator fold,
    every window swept once by its owning slab.  Bitwise-equal grids
    (radius == slab height boundary case included at 2x4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from c2ray_tpu.parallel.domain import (WindowedHaloSweeper,
                                           halo_sharded_raytracer,
                                           make_domain_mesh,
                                           sharded_chemistry)
    cfg, tabs, src, nflux, nd, dr, dt, ref, info0 = golden
    mesh = make_domain_mesh(n_src, n_dom)
    gs = NamedSharding(mesh, P("dom"))
    sa = "src" if n_src > 1 else None
    sweeper = WindowedHaloSweeper(mesh, src_axis=sa)
    sol = Evolve3D(cfg, tabs,
                   raytracer=halo_sharded_raytracer(mesh, src_axis=sa),
                   chemistry=sharded_chemistry(mesh, "dom"),
                   windowed=sweeper, rate_sharding=gs)
    got, info = _run(cfg, sol, nd, dr, src, nflux, dt, sharding=gs)
    np.testing.assert_array_equal(got, ref)
    assert info.niter == info0.niter
    assert sweeper._cache, "windowed buckets fell through to strip march"
    # slab-height gate: rungs beyond the slab must NOT be windowed
    m = cfg.mesh[0] // n_dom
    assert all(r <= m for (r, *_rest) in sweeper._cache)


def test_windowed_sharded_driver_layouts(tmp_path):
    """Driver-level: a many-source run under --layout src and halo
    reproduces the serial adaptive run byte-exactly (outputs included),
    with the windowed machinery active in both."""
    import os

    from c2ray_tpu.driver import C2RayDriver, DriverConfig
    from c2ray_tpu.models.nbody import test_adapter as make_test_adapter
    from c2ray_tpu.parallel.layout import ParallelLayout

    mesh = 32
    rng = np.random.default_rng(3)
    S = 40
    pos = rng.integers(1, mesh + 1, (S, 3))    # source files are 1-based
    lum = rng.uniform(2e55, 4e56, S)

    def run(tag, layout=None):
        cfg = make_config(mesh=mesh, dtype="float64", use_lls=False)
        cfg = cfg.replace(adaptive_sweep=True, source_batch=8,
                          adaptive_min_shell=4)
        d = tmp_path / tag
        d.mkdir(exist_ok=True)
        lines = [f"{S}"] + [
            f"{p[0]} {p[1]} {p[2]} {f:.6e} 0.0" for p, f in zip(pos, lum)]
        (d / "test_sources.dat").write_text("\n".join(lines) + "\n")
        rdir = str(d / "results") + "/"
        dc = DriverConfig(number_timesteps=2, number_outputs=1,
                          results_dir=rdir)
        ad = make_test_adapter(cfg, source_dir=str(d) + "/")
        drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False,
                          layout=layout)
        state = drv.run(max_slices=1)
        return np.asarray(state.xh1), rdir, drv

    from c2ray_tpu.utils.io_fortran import read_sm3d

    ref, ref_dir, _ = run("serial")
    for kind, n_src, n_dom in [("src", 8, 0), ("halo", 1, 2)]:
        lay = ParallelLayout(kind=kind, n_src=n_src, n_dom=n_dom)
        got, got_dir, drv = run(f"{kind}", layout=lay)
        # the sharded windowed buckets accumulate in a different order
        # than the serial chunk loop (scan-over-batches inside shard_map
        # vs host chunking), so parity is to summation-order rounding
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-13)
        assert drv.solver._windowed is not None
        assert drv.solver._windowed._cache, f"{kind}: windowed inactive"
        for f in sorted(os.listdir(ref_dir)):
            if f.startswith("xfrac3D"):
                a = read_sm3d(os.path.join(ref_dir, f), np.float64)
                b = read_sm3d(os.path.join(got_dir, f), np.float64)
                np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("clump_t,lls_t", [(3, 1), (4, 1), (5, 1), (1, 2)])
def test_halo_layout_percell_models(tmp_path, clump_t, lls_t):
    """Per-cell clumping (types 3/4/5) and the type-2 LLS grid now run
    under the halo layout (the round-4 gates in parallel/layout.py are
    gone): device-side slab evaluation / slab file ingestion, matching
    the serial run.  Reference: any clumping/LLS model under any
    parallel mode (clumping_module.F90:327-487, LLS.F90:214-316)."""
    from c2ray_tpu import constants as c5
    from c2ray_tpu.driver import C2RayDriver, DriverConfig
    from c2ray_tpu.models.nbody import fortran_f6_3
    from c2ray_tpu.models.nbody import test_adapter as make_test_adapter
    from c2ray_tpu.parallel.layout import ParallelLayout
    from c2ray_tpu.utils.io_fortran import (write_stream_cube,
                                            write_unformatted_records)

    mesh = 16

    def run(tag, layout=None):
        rng = np.random.default_rng(11)   # same cubes for both runs
        cfg = make_config(mesh=mesh, dtype="float64",
                                  use_lls=(lls_t == 2))
        cfg = cfg.replace(type_of_clumping=clump_t, type_of_lls=lls_t,
                          lls_model=1)
        d = tmp_path / tag
        d.mkdir(exist_ok=True)
        res = f"{cfg.dr_comoving / c5.MPC:5.3f}"
        if clump_t in (3, 4):
            dcm = np.array([[6.0, 0.05, 0.1, 1.2, 0, 0, 0],
                            [12.0, 0.05, 0.1, 1.2, 0, 0, 0]], np.float64)
            write_unformatted_records(
                str(d / f"paramsDCM_{res}Mpc.dat"),
                [np.array(dcm.shape, np.int32).tobytes(), dcm.T.tobytes()])
        if clump_t == 4:
            scm = np.zeros((2, 3, 5))
            for iz in range(2):
                scm[iz] = [[np.log(1.3), 0.2, 0.0, 0.8, 0.5],
                           [np.log(1.5), 0.3, 0.8, 1.5, 1.0],
                           [np.log(1.8), 0.2, 1.5, 9.0, 2.0]]
            write_unformatted_records(
                str(d / f"paramsSCM_{res}Mpc.dat"),
                [np.array(scm.shape, np.int32).tobytes(), scm.T.tobytes()])
        if clump_t == 5:
            cube = 1.0 + rng.random((mesh, mesh, mesh))
            write_stream_cube(str(d / f"{fortran_f6_3(9.0)}_scat.dat"),
                              cube.astype(np.float32))
        if lls_t == 2:
            cube = rng.random((mesh, mesh, mesh)) * 0.1
            write_stream_cube(
                str(d / f"{fortran_f6_3(9.0)}"
                        "cross_section_normalized.bin"),
                cube.astype(np.float32))
        (d / "test_sources.dat").write_text(
            f"2\n{mesh//2} {mesh//2} {mesh//2} 1e56 0.0\n"
            f"{mesh//4} {mesh//2} {mesh//2} 3e55 0.0\n")
        dc = DriverConfig(number_timesteps=2, number_outputs=1,
                          results_dir=str(d / "results") + "/")
        ad = make_test_adapter(cfg, source_dir=str(d) + "/")
        ad.dir_clump = str(d)
        ad.dir_lls = str(d)
        drv = C2RayDriver(cfg, adapter=ad, driver_cfg=dc, verbose=False,
                          layout=layout)
        state = drv.run(max_slices=1)
        return np.asarray(state.xh1)

    ref = run("serial")
    got = run("halo", ParallelLayout(kind="halo", n_src=1, n_dom=2))
    assert np.isfinite(ref).all() and ref.max() > 0.5  # physics happened
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-14)


def test_timings_fidelity_forces_host_loop(tmp_path, monkeypatch):
    """cfg.timings_fidelity=True + a Clocks sink runs the host-driven
    convergence loop, so Timings.log iteration stamps carry REAL
    per-iteration wall-clock (the device loop replays them at loop exit;
    reference stamps elapsed time each iteration, evolve.F90:272-273)."""
    from c2ray_tpu.utils.clocks import Clocks

    cfg0 = make_config(mesh=16, dtype="float64", use_lls=False)
    tabs = build_rad_tables(cfg0)
    src = np.array([[8, 8, 8]], np.int32)
    nflux = np.array([1e9])
    mat = uniform_material(cfg0)
    clock = CosmoClock.init(cfg0.cosmo, 9.0)
    dt = 5e6 * const.YEAR
    nd, dr, _ = proper_fields(cfg0, mat, clock.time2zred(0.5 * dt))

    calls = []
    orig = Evolve3D._evolve_device_loop

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(Evolve3D, "_evolve_device_loop", spy)
    for fidelity, expect_device in [(False, True), (True, False)]:
        calls.clear()
        cfg = cfg0.replace(timings_fidelity=fidelity)
        cl = Clocks(str(tmp_path / f"Timings_{fidelity}.log"))
        sol = Evolve3D(cfg, tabs)
        st, info = sol.evolve3d(initial_state(cfg), nd, dr, src, nflux,
                                dt, clocks=cl)
        assert bool(calls) == expect_device, (fidelity, calls)
        assert info.converged
        txt = open(str(tmp_path / f"Timings_{fidelity}.log")).read()
        assert txt.count("Time after iteration") >= info.niter


def test_thermal_compaction_and_chunking_bitwise():
    """Straggler compaction (thermal_compact) and slab chunking
    (thermal_chunk) re-schedule the subcycle loop without changing a
    single bit of the result (same substep closure, same per-cell
    sequences; thermal.f90:98-159)."""
    from c2ray_tpu.ops.thermal import setup_cool, thermal

    cfg = make_config(mesh=16, dtype="float64", isothermal=False)
    cool = setup_cool(cfg)
    rng = np.random.default_rng(0)
    n = 16
    import jax.numpy as jnp
    t0 = jnp.asarray(rng.uniform(50.0, 3e4, (n, n, n)))
    nd = jnp.asarray(rng.uniform(1e-5, 1e-3, (n, n, n)))
    x1e = jnp.asarray(rng.uniform(0, 1, (n, n, n)))
    x1a = jnp.asarray(rng.uniform(0, 1, (n, n, n)))
    x1o = jnp.asarray(rng.uniform(0, 1, (n, n, n)))
    heat = jnp.asarray(10.0 ** rng.uniform(-30, -22, (n, n, n)))
    dt = 3e13

    ref = thermal(cfg.replace(thermal_compact=False), cool, dt, t0, None,
                  nd, x1e, x1a, x1o, heat, cosmo_cool_coeff=1e-18)
    for variant in (cfg, cfg.replace(thermal_chunk=4),
                    cfg.replace(thermal_chunk=4, thermal_compact=False)):
        got = thermal(variant, cool, dt, t0, None, nd, x1e, x1a, x1o,
                      heat, cosmo_cool_coeff=1e-18)
        np.testing.assert_array_equal(np.asarray(ref.final_temperature),
                                      np.asarray(got.final_temperature))
        np.testing.assert_array_equal(
            np.asarray(ref.average_temperature),
            np.asarray(got.average_temperature))


def test_sm3d_subrecords_roundtrip(tmp_path, monkeypatch):
    """Records beyond the 4-byte marker limit use gfortran SUBRECORD
    framing (negative continuation markers) — the format the reference's
    own gfortran binaries produce for production cubes (864^3 f64 =
    5.2 GB data records).  Exercised with a tiny patched limit so every
    reader/writer crosses subrecord boundaries."""
    from c2ray_tpu.utils import io_fortran as iof

    monkeypatch.setattr(iof, "_SUBRECORD_MAX", 1000)
    rng = np.random.default_rng(0)
    cube = rng.normal(size=(11, 9, 7))

    # streaming writer + whole-record reader
    p1 = str(tmp_path / "a.bin")

    def blocks():
        for k0 in range(0, 7, 3):
            yield cube[:, :, k0:k0 + 3]

    iof.write_sm3d_stream(p1, cube.shape, np.float64, blocks())
    got = iof.read_sm3d(p1, np.float64, expect_mesh=cube.shape)
    np.testing.assert_array_equal(got, cube)

    # slab reader crosses subrecord markers
    slab = iof.read_sm3d_slab(p1, np.float64, cube.shape, 3, 5)
    np.testing.assert_array_equal(slab, cube[3:8])

    # whole-array writer round-trips through the same framing
    p2 = str(tmp_path / "b.bin")
    iof.write_sm3d(p2, cube)
    np.testing.assert_array_equal(iof.read_sm3d(p2, np.float64), cube)
    # and the small-record fast path is untouched: below the limit the
    # bytes are classic single-record Fortran format
    monkeypatch.setattr(iof, "_SUBRECORD_MAX", 2147483639)
    p3 = str(tmp_path / "c.bin")
    iof.write_sm3d_stream(p3, cube.shape, np.float64, blocks())
    import struct
    raw = open(p3, "rb").read()
    assert struct.unpack("<i", raw[20:24])[0] == cube.size * 8
    np.testing.assert_array_equal(iof.read_sm3d(p3, np.float64), cube)
    np.testing.assert_array_equal(
        iof.read_sm3d_slab(p3, np.float64, cube.shape, 3, 5), cube[3:8])

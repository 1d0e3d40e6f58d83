"""Multi-device source sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.ops.sweep import SweepScalars, raytrace_all_sources
from c2ray_tpu.ops.tables import build_rad_tables
from c2ray_tpu.parallel.source_shard import (make_device_mesh, pad_sources,
                                             sharded_raytracer)
from c2ray_tpu.solver import Evolve3D
from c2ray_tpu.state import initial_state


def setup(n=16):
    cfg = make_config(mesh=n, dtype="float64", use_lls=False,
                      cosmological=False)
    tabs = build_rad_tables(cfg)
    dr = 2.9e24
    sc = SweepScalars(dr=jnp.float64(dr),
                      rate_scale=jnp.float64(cfg.sed.s_star / dr**3),
                      lls_coldens=jnp.float64(0.0),
                      rmax2_cells=jnp.float64(0.0))
    nd = jnp.full((n, n, n), 1.98e-4)
    xa = jnp.full((n, n, n), 0.1)
    return cfg, tabs, sc, nd, xa, dr


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_matches_serial():
    """Source sharding + psum reproduces the serial scan bitwise-close
    (the multi-host parity check of SURVEY.md section 4)."""
    cfg, tabs, sc, nd, xa, dr = setup()
    rng = np.random.default_rng(1)
    srcpos = rng.integers(0, 16, size=(8, 3)).astype(np.int32)
    nflux = (10.0 ** rng.uniform(6, 9, size=8))

    serial = raytrace_all_sources(cfg, tabs, nd, xa, jnp.asarray(srcpos),
                                  jnp.asarray(nflux), sc)

    mesh = make_device_mesh(8)
    rt = sharded_raytracer(mesh)
    shard = rt(cfg, tabs, nd, xa, jnp.asarray(srcpos), jnp.asarray(nflux), sc)

    np.testing.assert_allclose(np.asarray(shard[0]), np.asarray(serial[0]),
                               rtol=1e-12)
    assert float(shard[2]) == pytest.approx(float(serial[2]), rel=1e-12)
    # per-source losses survive sharding (order preserved)
    np.testing.assert_allclose(np.asarray(shard[4]), np.asarray(serial[4]),
                               rtol=1e-12)


def test_padding_neutral():
    """Zero-flux padding sources change nothing."""
    cfg, tabs, sc, nd, xa, dr = setup()
    srcpos = np.array([[3, 4, 5], [10, 2, 8]], np.int32)
    nflux = np.array([1e8, 3e7])
    p_pos, p_flux, s = pad_sources(srcpos, nflux, 8)
    assert len(p_flux) == 8 and s == 2
    r1 = raytrace_all_sources(cfg, tabs, nd, xa, jnp.asarray(srcpos),
                              jnp.asarray(nflux), sc)
    r2 = raytrace_all_sources(cfg, tabs, nd, xa, jnp.asarray(p_pos),
                              jnp.asarray(p_flux), sc)
    np.testing.assert_allclose(np.asarray(r2[0]), np.asarray(r1[0]),
                               rtol=1e-14)


def test_solver_with_sharded_raytracer():
    """Full evolve3D with the sharded raytracer matches the serial solver."""
    n = 16
    cfg = make_config(mesh=n, dtype="float64", use_lls=False,
                      cosmological=False)
    tabs = build_rad_tables(cfg)
    srcpos, nflux, _ = pad_sources(
        np.array([[8, 8, 8], [3, 12, 5]], np.int32),
        np.array([1e9, 1e8]), 8)
    ndens = jnp.full((n, n, n), 1.98e-4)
    dt = 3.1e14

    results = {}
    for key, rt in [("serial", None),
                    ("sharded", sharded_raytracer(make_device_mesh(8)))]:
        solver = Evolve3D(cfg, tabs, raytracer=rt)
        state = initial_state(cfg)
        for _ in range(2):
            state, info = solver.evolve3d(state, ndens, 2.9e24, srcpos,
                                          nflux, dt)
        results[key] = (np.asarray(state.xh1), info.mean_xh1)
    np.testing.assert_allclose(results["sharded"][0], results["serial"][0],
                               rtol=1e-10)


def test_sharded_chemistry_in_solver():
    """Slab-sharded chemistry (parallel phase 2) matches the serial solver."""
    from c2ray_tpu.parallel.domain import sharded_chemistry
    n = 16
    cfg = make_config(mesh=n, dtype="float64", use_lls=False,
                      cosmological=False)
    tabs = build_rad_tables(cfg)
    srcpos = np.array([[8, 8, 8]], np.int32)
    nflux = np.array([1e9])
    ndens = jnp.full((n, n, n), 1.98e-4)
    mesh = make_device_mesh(8)
    results = {}
    for key, kw in [("serial", {}),
                    ("domain", dict(raytracer=sharded_raytracer(mesh),
                                    chemistry=sharded_chemistry(mesh)))]:
        solver = Evolve3D(cfg, tabs, **kw)
        state = initial_state(cfg)
        state, info = solver.evolve3d(state, ndens, 2.9e24, srcpos, nflux,
                                      3.1e14)
        results[key] = np.asarray(state.xh1)
    np.testing.assert_allclose(results["domain"], results["serial"],
                               rtol=1e-12)


def test_sharded_chemistry_add_photon_losses():
    """add_photon_losses passes a full (N,N,N) rate grid into the
    chemistry; the sharded variant must slab-shard it like the other
    grids (regression: it had a replicated in_spec -> shape error)."""
    from c2ray_tpu.parallel.domain import sharded_chemistry
    n = 16
    # radius-capped strong source: photons escape the r=4 sweep boundary
    # and feed the redistribution grid (as in test_round2's coverage)
    cfg = make_config(mesh=n, dtype="float64", use_lls=False,
                      cosmological=False, add_photon_losses=True,
                      max_shell=4)
    tabs = build_rad_tables(cfg)
    srcpos = np.array([[8, 8, 8]], np.int32)
    nflux = np.array([1e57]) / 1e48
    ndens = jnp.full((n, n, n), 1.98e-4)
    mesh = make_device_mesh(8)
    results = {}
    for key, kw in [("serial", {}),
                    ("domain", dict(raytracer=sharded_raytracer(mesh),
                                    chemistry=sharded_chemistry(mesh)))]:
        solver = Evolve3D(cfg, tabs, **kw)
        state = initial_state(cfg)
        state, info = solver.evolve3d(state, ndens, 5.7e24 / 8, srcpos,
                                      nflux, 3.1e14)
        results[key] = np.asarray(state.xh1)
        assert info.photon_loss > 0.0      # the loss grid path is active
    np.testing.assert_allclose(results["domain"], results["serial"],
                               rtol=1e-12)


# --------------------------------------------------------------------------
# Domain decomposition (parallel phase 2): grid-slab-sharded rate physics
# --------------------------------------------------------------------------

def test_domain_sharded_matches_serial():
    """Slab-decomposed sweep (replicated march + sharded rate pass)
    reproduces the serial result."""
    from c2ray_tpu.parallel.domain import domain_sharded_raytracer
    cfg, tabs, sc, nd, xa, dr = setup()
    rng = np.random.default_rng(3)
    srcpos = rng.integers(0, 16, size=(5, 3)).astype(np.int32)
    nflux = 10.0 ** rng.uniform(6, 9, size=5)

    serial = raytrace_all_sources(cfg, tabs, nd, xa, jnp.asarray(srcpos),
                                  jnp.asarray(nflux), sc)

    mesh = make_device_mesh(8, axis_name="dom")
    rt = domain_sharded_raytracer(mesh)
    dom = rt(cfg, tabs, nd, xa, jnp.asarray(srcpos), jnp.asarray(nflux), sc)

    np.testing.assert_allclose(np.asarray(dom[0]), np.asarray(serial[0]),
                               rtol=1e-12)
    assert float(dom[2]) == pytest.approx(float(serial[2]), rel=1e-12,
                                          abs=1e-300)
    np.testing.assert_allclose(np.asarray(dom[4]), np.asarray(serial[4]),
                               rtol=1e-12)


def test_domain_sharded_with_lls():
    """Slab decomposition with scalar and grid LLS opacity."""
    from c2ray_tpu.parallel.domain import domain_sharded_raytracer
    n = 16
    cfg = make_config(mesh=n, dtype="float64", use_lls=True, type_of_lls=2,
                      cosmological=False)
    tabs = build_rad_tables(cfg)
    dr = 2.9e24
    rng = np.random.default_rng(4)
    sc = SweepScalars(dr=jnp.float64(dr),
                      rate_scale=jnp.float64(cfg.sed.s_star / dr**3),
                      lls_coldens=jnp.float64(0.0),
                      rmax2_cells=jnp.float64(0.0))
    nd = jnp.full((n, n, n), 1.98e-4)
    xa = jnp.asarray(rng.uniform(0.0, 0.5, (n, n, n)))
    lls_grid = jnp.asarray(10.0 ** rng.uniform(15, 17, (n, n, n)))
    srcpos = jnp.asarray(rng.integers(0, n, (3, 3)), jnp.int32)
    nflux = jnp.asarray(10.0 ** rng.uniform(7, 9, 3))

    serial = raytrace_all_sources(cfg, tabs, nd, xa, srcpos, nflux, sc,
                                  lls_grid=lls_grid)
    mesh = make_device_mesh(8, axis_name="dom")
    rt = domain_sharded_raytracer(mesh)
    dom = rt(cfg, tabs, nd, xa, srcpos, nflux, sc, lls_grid=lls_grid)
    np.testing.assert_allclose(np.asarray(dom[0]), np.asarray(serial[0]),
                               rtol=1e-12)
    assert float(dom[3]) == pytest.approx(float(serial[3]), rel=1e-12)


def test_src_x_dom_2d_mesh():
    """Composed parallelism: sources sharded x grid slabs on a 2D mesh."""
    from c2ray_tpu.parallel.domain import (domain_sharded_raytracer,
                                           make_domain_mesh)
    cfg, tabs, sc, nd, xa, dr = setup()
    rng = np.random.default_rng(5)
    srcpos = rng.integers(0, 16, size=(6, 3)).astype(np.int32)
    nflux = 10.0 ** rng.uniform(6, 9, size=6)

    serial = raytrace_all_sources(cfg, tabs, nd, xa, jnp.asarray(srcpos),
                                  jnp.asarray(nflux), sc)
    mesh = make_domain_mesh(2, 4)
    rt = domain_sharded_raytracer(mesh, src_axis="src")
    dom = rt(cfg, tabs, nd, xa, jnp.asarray(srcpos), jnp.asarray(nflux), sc)
    np.testing.assert_allclose(np.asarray(dom[0]), np.asarray(serial[0]),
                               rtol=1e-12)
    assert float(dom[2]) == pytest.approx(float(serial[2]), rel=1e-12,
                                          abs=1e-300)
    np.testing.assert_allclose(np.asarray(dom[4]), np.asarray(serial[4]),
                               rtol=1e-12)


def test_solver_with_domain_raytracer():
    """Full evolve3D on the 2D (src, dom) mesh with slab-sharded chemistry
    matches the serial solver."""
    from c2ray_tpu.parallel.domain import (domain_sharded_raytracer,
                                           make_domain_mesh,
                                           sharded_chemistry)
    n = 16
    cfg = make_config(mesh=n, dtype="float64", use_lls=False,
                      cosmological=False)
    tabs = build_rad_tables(cfg)
    srcpos = np.array([[8, 8, 8], [3, 12, 5]], np.int32)
    nflux = np.array([1e9, 1e8])
    ndens = jnp.full((n, n, n), 1.98e-4)
    mesh = make_domain_mesh(2, 4)
    results = {}
    for key, kw in [("serial", {}),
                    ("domain", dict(
                        raytracer=domain_sharded_raytracer(mesh,
                                                           src_axis="src"),
                        chemistry=sharded_chemistry(mesh, "dom")))]:
        solver = Evolve3D(cfg, tabs, **kw)
        state = initial_state(cfg)
        for _ in range(2):
            state, info = solver.evolve3d(state, ndens, 2.9e24, srcpos,
                                          nflux, 3.1e14)
        results[key] = np.asarray(state.xh1)
    np.testing.assert_allclose(results["domain"], results["serial"],
                               rtol=1e-10)


# ---------- halo-exchange sharded march (parallel phase 2b) ----------


def test_halo_sharded_columns_bitwise():
    """The slab-sharded causal march (per-shell halo exchange) reproduces
    the replicated face-major column field to a few ulps, including
    sources at wrap rows and slab boundaries."""
    from jax.sharding import PartitionSpec as P
    from c2ray_tpu.ops.sweep import compute_columns_facemajor, roll3
    from c2ray_tpu.ops.sweep_sharded import compute_columns_slab
    from c2ray_tpu.parallel.source_shard import make_device_mesh

    n = 16
    c = n // 2
    cfg = make_config(mesh=n, dtype="float64", use_lls=False,
                      cosmological=False)
    dr = 2.9e23
    sc = SweepScalars(dr=jnp.float64(dr),
                      rate_scale=jnp.float64(cfg.sed.s_star / dr**3),
                      lls_coldens=jnp.float64(0.0),
                      rmax2_cells=jnp.float64(0.0))
    rng = np.random.default_rng(11)
    ndhi = jnp.asarray(rng.uniform(1e-4, 3e-4, (n, n, n)))
    mesh = make_device_mesh(8, axis_name="dom")
    m = n // 8

    for pos in ([8, 8, 8], [0, 3, 15], [15, 0, 0], [1, 9, 2]):
        for max_shell in (c, 4):
            px, py, pz = pos
            ndhi_c = roll3(ndhi, (c - px, c - py, c - pz))
            ref = compute_columns_facemajor(cfg, ndhi_c, sc, None, max_shell)
            # reference cdo is fully centered; the slab march returns
            # grid-ordered rows with centered axes 1/2
            ref_grid_rows = jnp.roll(ref, px - c, axis=0)

            def local(nd_slab):
                r0 = jax.lax.axis_index("dom") * m
                return compute_columns_slab(
                    cfg, nd_slab, sc, None, max_shell,
                    jnp.int32(px), r0, 8, "dom")

            nd_rows = jnp.roll(ndhi_c, px - c, axis=0)
            got = jax.shard_map(local, mesh=mesh, in_specs=P("dom"),
                                out_specs=P("dom"), check_vma=False)(nd_rows)
            # identical math; XLA fuses the strip and full-plane programs
            # differently (FMA contraction), so allow a few ulps
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref_grid_rows), rtol=1e-13,
                err_msg=f"pos={pos} max_shell={max_shell}")


def test_halo_sharded_matches_serial():
    """Fully domain-decomposed sweep (sharded density, march, rates)
    reproduces the serial result on random fields."""
    from c2ray_tpu.parallel.domain import halo_sharded_raytracer
    cfg, tabs, sc, _, _, dr = setup()
    n = 16
    rng = np.random.default_rng(12)
    nd = jnp.asarray(rng.uniform(1e-4, 3e-4, (n, n, n)))
    xa = jnp.asarray(rng.uniform(0.0, 0.5, (n, n, n)))
    srcpos = rng.integers(0, n, size=(5, 3)).astype(np.int32)
    nflux = 10.0 ** rng.uniform(6, 9, size=5)

    serial = raytrace_all_sources(cfg, tabs, nd, xa, jnp.asarray(srcpos),
                                  jnp.asarray(nflux), sc)
    mesh = make_device_mesh(8, axis_name="dom")
    rt = halo_sharded_raytracer(mesh)
    got = rt(cfg, tabs, nd, xa, jnp.asarray(srcpos), jnp.asarray(nflux), sc)

    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(serial[0]),
                               rtol=1e-12)
    assert float(got[2]) == pytest.approx(float(serial[2]), rel=1e-12,
                                          abs=1e-300)
    np.testing.assert_allclose(np.asarray(got[4]), np.asarray(serial[4]),
                               rtol=1e-12)


def test_halo_sharded_2d_mesh_lls_heat():
    """Halo-sharded march on a 2D (src x dom) mesh with grid LLS opacity
    and photo-heating."""
    from c2ray_tpu.parallel.domain import (halo_sharded_raytracer,
                                           make_domain_mesh)
    n = 16
    cfg = make_config(mesh=n, dtype="float64", use_lls=True, type_of_lls=2,
                      isothermal=False, cosmological=False)
    tabs = build_rad_tables(cfg)
    dr = 2.9e22
    sc = SweepScalars(dr=jnp.float64(dr),
                      rate_scale=jnp.float64(cfg.sed.s_star / dr**3),
                      lls_coldens=jnp.float64(0.0),
                      rmax2_cells=jnp.float64(0.0))
    rng = np.random.default_rng(13)
    nd = jnp.asarray(rng.uniform(1e-4, 3e-4, (n, n, n)))
    xa = jnp.asarray(rng.uniform(0.0, 0.5, (n, n, n)))
    lls = jnp.asarray(rng.uniform(1e15, 1e17, (n, n, n)))
    srcpos = rng.integers(0, n, size=(3, 3)).astype(np.int32)
    nflux = 10.0 ** rng.uniform(7, 9, size=3)

    serial = raytrace_all_sources(cfg, tabs, nd, xa, jnp.asarray(srcpos),
                                  jnp.asarray(nflux), sc, lls_grid=lls)
    mesh = make_domain_mesh(2, 4)
    rt = halo_sharded_raytracer(mesh, src_axis="src")
    got = rt(cfg, tabs, nd, xa, jnp.asarray(srcpos), jnp.asarray(nflux), sc,
             lls_grid=lls)

    for i in (0, 1):   # phih, phiheat
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(serial[i]),
                                   rtol=1e-12)
    for i in (2, 3):   # photon loss, LLS loss
        assert float(got[i]) == pytest.approx(float(serial[i]), rel=1e-12,
                                              abs=1e-300)


def test_solver_with_halo_raytracer():
    """Full evolve3D with the halo-sharded march + slab chemistry matches
    the serial solver."""
    from c2ray_tpu.parallel.domain import (halo_sharded_raytracer,
                                           make_domain_mesh,
                                           sharded_chemistry)
    n = 16
    cfg = make_config(mesh=n, dtype="float64", use_lls=False,
                      cosmological=False)
    tabs = build_rad_tables(cfg)
    srcpos = np.array([[8, 8, 8], [3, 12, 5]], np.int32)
    nflux = np.array([1e9, 1e8])
    ndens = jnp.full((n, n, n), 1.98e-4)
    mesh = make_domain_mesh(2, 4)
    results = {}
    for key, kw in [("serial", {}),
                    ("halo", dict(
                        raytracer=halo_sharded_raytracer(mesh,
                                                         src_axis="src"),
                        chemistry=sharded_chemistry(mesh, "dom")))]:
        solver = Evolve3D(cfg, tabs, **kw)
        state = initial_state(cfg)
        for _ in range(2):
            state, info = solver.evolve3d(state, ndens, 2.9e24, srcpos,
                                          nflux, 3.1e14)
        results[key] = np.asarray(state.xh1)
    np.testing.assert_allclose(results["halo"], results["serial"],
                               rtol=1e-10)


@pytest.mark.slow
def test_halo_sharded_production_mesh():
    """The halo-exchange march at a production mesh size: 256^3 decomposed
    over 8 slab domains, parity vs the replicated serial sweep, with the
    per-device field footprint pinned to N^3/ndom.

    This is the designated path for the reference's largest production
    meshes (864^3-1200^3, sizes.f90:50-71) where the full cube exceeds
    one chip's HBM; scripts/validate_halo_large.py runs the same check
    at 864^3 (recorded in BENCH_HISTORY.md).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from c2ray_tpu.parallel.domain import halo_sharded_raytracer

    n, ndom = 256, 8
    cfg = make_config(mesh=n, dtype="float64", use_lls=False,
                      cosmological=False)
    tabs = build_rad_tables(cfg)
    dr = 2.9e24 / (n / 64)
    sc = SweepScalars(dr=jnp.float64(dr),
                      rate_scale=jnp.float64(cfg.sed.s_star / dr**3),
                      lls_coldens=jnp.float64(0.0),
                      rmax2_cells=jnp.float64(0.0))
    rng = np.random.default_rng(864)
    nd = jnp.asarray(rng.uniform(1e-4, 3e-4, (n, n, n)).astype(np.float64))
    xa = jnp.asarray(rng.uniform(0.0, 0.5, (n, n, n)).astype(np.float64))
    # one interior + one wrap-row source
    srcpos = np.array([[131, 77, 200], [2, 250, 13]], np.int32)
    nflux = np.array([1e9, 3e8])

    serial = raytrace_all_sources(cfg, tabs, nd, xa, jnp.asarray(srcpos),
                                  jnp.asarray(nflux), sc)

    mesh = make_device_mesh(ndom, axis_name="dom")
    # pre-shard the fields so no replicated N^3 copy is materialized
    sh = NamedSharding(mesh, P("dom"))
    nd_s = jax.device_put(nd, sh)
    xa_s = jax.device_put(xa, sh)
    rt = halo_sharded_raytracer(mesh)
    got = rt(cfg, tabs, nd_s, xa_s, jnp.asarray(srcpos),
             jnp.asarray(nflux), sc)

    # per-device resident slab = N^3/ndom cells exactly
    phih = got[0]
    for arr in (nd_s, xa_s, phih):
        shard_shapes = {s.data.shape for s in arr.addressable_shards}
        assert shard_shapes == {(n // ndom, n, n)}

    np.testing.assert_allclose(np.asarray(phih), np.asarray(serial[0]),
                               rtol=1e-11)
    assert float(got[2]) == pytest.approx(float(serial[2]), rel=1e-11,
                                          abs=1e-300)
    np.testing.assert_allclose(np.asarray(got[4]), np.asarray(serial[4]),
                               rtol=1e-11)

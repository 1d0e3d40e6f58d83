"""Compressed ionization-fraction storage (the reference's compressed/
variant, compressed/README:1-13): min-fraction with sign disambiguation.

Beyond parity, this is the float32 production mode's accuracy fix: the
neutral-fraction tail inside ionized regions (residual opacity,
recombination budget) survives f32 storage instead of flooring at
1 - nextafter(1) ~ 6e-8.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.ops.tables import build_rad_tables
from c2ray_tpu.solver import Evolve3D
from c2ray_tpu.state import compress_xh, initial_state, xh0_of, xh1_of

NH = 1.98e-4


class TestCodec:
    def test_roundtrip_preserves_both_tails_f32(self):
        x1 = np.array([1e-10, 2e-4, 0.5, 1.0 - 1e-10], np.float64)
        x0 = 1.0 - x1
        xc = np.asarray(compress_xh(jnp.asarray(x1), jnp.asarray(x0)),
                        np.float32)
        # neutral tail of the ionized cell survives f32 exactly
        assert float(xh0_of(jnp.asarray(xc))[3]) == pytest.approx(
            1e-10, rel=1e-6)
        # ionized tail of the neutral cell survives too
        assert float(xh1_of(jnp.asarray(xc))[0]) == pytest.approx(
            1e-10, rel=1e-6)
        # dense f32 storage would destroy it
        assert 1.0 - np.float32(x1[3]) == 0.0

    def test_sign_convention(self):
        # compressed/README: negative = x_HI stored
        xc = compress_xh(jnp.asarray([0.2, 0.8]))
        assert float(xc[0]) == pytest.approx(0.2)
        assert float(xc[1]) == pytest.approx(-0.2)

    def test_saturated_cell_does_not_invert(self):
        """x_HI == 0 must NOT encode as -0.0 (IEEE -0.0 >= 0 would decode
        a fully IONIZED cell as fully NEUTRAL)."""
        xc = compress_xh(jnp.asarray([1.0, 0.5, 2e-4], jnp.float32))
        assert float(xh1_of(xc)[0]) == 1.0
        assert float(xh0_of(xc)[0]) == 0.0
        # explicit-xh0 form too (the chemistry path)
        xc2 = compress_xh(jnp.asarray([1.0]), jnp.asarray([0.0]))
        assert float(xh1_of(xc2)[0]) == 1.0

    def test_restart_encode_keeps_f64_tail(self, tmp_path):
        """load_slice_restart must encode the f64 cube BEFORE the f32
        cast, so the neutral tail survives (and saturated cells do not
        invert)."""
        from c2ray_tpu.config import test_problem_config
        from c2ray_tpu.utils.checkpoint import load_slice_restart
        from c2ray_tpu.utils.io_fortran import write_sm3d
        from c2ray_tpu.models.nbody import fortran_f6_3
        cfg = test_problem_config(mesh=4, dtype="float32", use_lls=False,
                                  compressed_xfrac=True)
        cube = np.full((4, 4, 4), 2e-4)
        cube[0, 0, 0] = 1.0 - 1e-10       # f32-saturating ionized cell
        cube[1, 1, 1] = 1.0               # exactly saturated
        zs = fortran_f6_3(8.5)
        write_sm3d(str(tmp_path / f"xfrac3D_{zs}.bin"), cube)
        state = load_slice_restart(cfg, str(tmp_path) + "/", 8.5)
        x0 = np.asarray(xh0_of(state.xh1), np.float64)
        assert x0[0, 0, 0] == pytest.approx(1e-10, rel=1e-6)
        assert float(xh1_of(state.xh1)[1, 1, 1]) == 1.0


def _run(cfg, steps=2, dt_frac=0.05):
    tabs = build_rad_tables(cfg)
    cool = None
    if not cfg.isothermal:
        from c2ray_tpu.ops.thermal import setup_cool
        cool = setup_cool(cfg)
    solver = Evolve3D(cfg, tabs, cool=cool)
    state = initial_state(cfg)
    n = cfg.mesh[0]
    ndens = jnp.full((n, n, n), NH, cfg.jnp_dtype)
    dr = 5.7e24 / 4
    src = np.array([[n // 2, n // 2, n // 2]], np.int32)
    nflux = np.array([1e57]) / cfg.sed.s_star
    dt = dt_frac / (const.BH00 * NH)
    for _ in range(steps):
        state, info = solver.evolve3d(state, ndens, dr, src, nflux, dt)
    return state, info


class TestCompressedSolver:
    def test_f64_compressed_equals_dense(self):
        """In float64 the compressed mode is a pure re-encoding: decoded
        ionized fractions match the dense run to rounding."""
        base = dict(mesh=16, dtype="float64", use_lls=False,
                    cosmological=False)
        sd, _ = _run(make_config(**base))
        sc, _ = _run(make_config(**base, compressed_xfrac=True))
        x_dense = np.asarray(sd.xh1)
        x_comp = np.asarray(xh1_of(sc.xh1))
        np.testing.assert_allclose(x_comp, x_dense, rtol=1e-10, atol=1e-14)

    def test_f32_compressed_recovers_neutral_tail(self):
        """The physically meaningful observable: the residual neutral
        fraction INSIDE the ionized sphere.  Dense f32 floors it at the
        representation limit; compressed f32 tracks the f64 truth."""
        base = dict(mesh=16, use_lls=False, cosmological=False)
        s64, _ = _run(make_config(**base, dtype="float64"), dt_frac=0.2)
        s32, _ = _run(make_config(**base, dtype="float32"), dt_frac=0.2)
        s32c, _ = _run(make_config(**base, dtype="float32",
                                   compressed_xfrac=True), dt_frac=0.2)
        c = 8
        truth = 1.0 - np.asarray(s64.xh1, np.float64)[c, c, c]
        dense = 1.0 - np.asarray(s32.xh1, np.float64)[c, c, c]
        comp = float(xh0_of(s32c.xh1)[c, c, c])
        assert truth < 1e-4              # deep inside the sphere
        # compressed tracks the f64 neutral tail to a few percent
        assert comp == pytest.approx(truth, rel=0.05), (comp, truth, dense)
        # and is at least 10x closer than dense f32 storage (unless dense
        # happens to be representable, which it is not at this depth)
        assert abs(comp - truth) < 0.1 * max(abs(dense - truth), 1e-30)

    def test_compressed_mean_matches_dense_f32(self):
        base = dict(mesh=16, dtype="float32", use_lls=False,
                    cosmological=False)
        sd, infod = _run(make_config(**base))
        sc, infoc = _run(make_config(**base, compressed_xfrac=True))
        assert infoc.mean_xh1 == pytest.approx(infod.mean_xh1, rel=1e-4)

    def test_nonisothermal_compressed_equals_dense(self):
        """Photo-heating coupling runs identically under compressed
        storage (the thermal path consumes decoded fractions)."""
        base = dict(mesh=12, dtype="float64", use_lls=False,
                    cosmological=False, isothermal=False,
                    initial_temperature=100.0)
        sd, infod = _run(make_config(**base))
        sc, infoc = _run(make_config(**base, compressed_xfrac=True))
        np.testing.assert_allclose(np.asarray(xh1_of(sc.xh1)),
                                   np.asarray(sd.xh1),
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(sc.temper_current),
                                   np.asarray(sd.temper_current),
                                   rtol=1e-10)

    def test_windowed_multisource_compressed_equals_dense(self):
        """The windowed multi-source sweep decodes compressed xh_av the
        same way the full-cube path does."""
        from c2ray_tpu.cosmology import CosmoClock
        base = dict(mesh=24, dtype="float64", use_lls=False,
                    cosmological=False, window_sweep=True,
                    adaptive_sweep=True, source_batch=4)
        rng = np.random.default_rng(5)
        src = np.asarray(rng.integers(0, 24, (6, 3)), np.int32)
        nflux = 10.0 ** rng.uniform(7.5, 8.5, 6)
        states = {}
        for compressed in (False, True):
            cfg = make_config(**base, compressed_xfrac=compressed)
            tabs = build_rad_tables(cfg)
            solver = Evolve3D(cfg, tabs)
            state = initial_state(cfg)
            ndens = jnp.full((24, 24, 24), NH, cfg.jnp_dtype)
            dt = 0.05 / (const.BH00 * NH)
            state, info = solver.evolve3d(state, ndens, 5.7e24 / 6, src,
                                          nflux, dt)
            states[compressed] = (np.asarray(xh1_of(state.xh1))
                                  if compressed else np.asarray(state.xh1))
        np.testing.assert_allclose(states[True], states[False],
                                   rtol=1e-10, atol=1e-14)

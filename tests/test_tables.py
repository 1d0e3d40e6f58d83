"""Radiation table tests: SED scaling, grey-opacity closed form, lookups."""

import numpy as np
import jax.numpy as jnp
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.ops.romberg import scalar_romberg, vector_romberg
from c2ray_tpu.ops.tables import (build_rad_tables, photoion_rates,
                                  sed_properties, table_lookup)


def cfg64(**kw):
    return make_config(mesh=8, dtype="float64", **kw)


class TestRomberg:
    def test_polynomial_exact(self):
        # Romberg is exact for low-order polynomials
        x = np.linspace(0.0, 2.0, 129)
        assert scalar_romberg(x**3, x[1] - x[0]) == pytest.approx(4.0, rel=1e-12)

    def test_exponential(self):
        x = np.linspace(0.0, 1.0, 129)
        assert scalar_romberg(np.exp(x), x[1] - x[0]) == pytest.approx(
            np.e - 1.0, rel=1e-12)

    def test_vector_matches_scalar(self):
        x = np.linspace(0.0, 1.0, 65)
        y = np.stack([np.sin(x), np.cos(x)], axis=1)
        v = vector_romberg(y, x[1] - x[0], axis=0)
        assert v[0] == pytest.approx(scalar_romberg(np.sin(x), x[1] - x[0]))
        assert v[1] == pytest.approx(scalar_romberg(np.cos(x), x[1] - x[0]))


class TestSED:
    def test_bb_scaling_gives_s_star(self):
        """spec_diag scales R_star so the photon integral equals S_star
        (radiation_sed_parameters.F90:184-192)."""
        cfg = cfg64()
        props = sed_properties(cfg)
        from c2ray_tpu.ops.tables import integrate_sed
        s = integrate_sed(cfg, cfg.sed.bb_min_freq, cfg.sed.bb_max_freq,
                          "B", "S", r_star=props.r_star)
        assert s == pytest.approx(cfg.sed.s_star, rel=1e-10)

    def test_pl_scaling(self):
        cfg = cfg64(sed=make_config().sed.__class__(stellar_type="P"))
        props = sed_properties(cfg)
        from c2ray_tpu.ops.tables import integrate_sed
        s = integrate_sed(cfg, cfg.sed.pl_min_freq, cfg.sed.pl_max_freq,
                          "P", "S", s_scaling=props.s_scaling)
        assert s == pytest.approx(cfg.sed.pl_s_star, rel=1e-10)


class TestTables:
    def test_normalization_at_tau_zero(self):
        """thick table at tau=0 integrates the full scaled SED = 1 S_star."""
        cfg = cfg64()
        t = build_rad_tables(cfg)
        assert float(t.photo_thick[0]) == pytest.approx(1.0, rel=1e-10)

    def test_monotone_decreasing(self):
        cfg = cfg64()
        t = np.asarray(build_rad_tables(cfg).photo_thick)
        assert np.all(np.diff(t) <= 1e-15)
        assert t[-1] < 1e-10

    def test_grey_closed_form(self):
        """With grey opacities, thick(tau) = exp(-tau) exactly
        (radiation_tables.F90:346-349 sets xsec ≡ 1)."""
        cfg = cfg64(grey=True)
        t = build_rad_tables(cfg)
        dlogtau = (cfg.maxlogtau - cfg.minlogtau) / cfg.num_tau
        for i in [1, 500, 1000, 1650]:
            tau = 10.0 ** (cfg.minlogtau + dlogtau * (i - 1))
            assert float(t.photo_thick[i]) == pytest.approx(
                np.exp(-tau), rel=1e-9), i

    def test_thin_is_negative_derivative(self):
        """thin = -d(thick)/d(tau) by construction."""
        cfg = cfg64()
        t = build_rad_tables(cfg)
        dlogtau = (cfg.maxlogtau - cfg.minlogtau) / cfg.num_tau
        i = 1500  # tau around 0.05
        tau_i = 10.0 ** (cfg.minlogtau + dlogtau * (i - 1))
        tau_j = 10.0 ** (cfg.minlogtau + dlogtau * i)
        numeric = -(float(t.photo_thick[i + 1]) - float(t.photo_thick[i])) / (
            tau_j - tau_i)
        mid = float(t.photo_thin[i]) * 0.5 + float(t.photo_thin[i + 1]) * 0.5
        assert numeric == pytest.approx(mid, rel=0.05)


class TestMixtureRefinement:
    """Round-5 node-refined exponential mixture (_refine_mixture_nodes):
    fewer terms than the NNLS fit at <= its max weighted relative error,
    exact photon-count normalization preserved."""

    def _targets(self, cfg, t):
        from c2ray_tpu import constants as const
        from c2ray_tpu.ops.romberg import romberg_weights
        from c2ray_tpu.ops.tables import _bb_sed_photon, sed_properties
        props = sed_properties(cfg)
        freq_min = max(const.ION_FREQ_HI, cfg.sed.min_freq)
        n = cfg.num_freq
        freq = np.linspace(freq_min, cfg.sed.max_freq, n + 1)
        h = (cfg.sed.max_freq - freq_min) / n
        sed_vals = _bb_sed_photon(freq, props.h_over_kt, props.r_star**2)
        ahat = (freq / freq_min) ** (-cfg.pl_index_cross_section_hi)
        wq = romberg_weights(n) * h * sed_vals
        taus = np.concatenate([[0.0],
                               np.geomspace(1e-6, 3.0 / ahat.min(), 240)])
        target = (wq[None, :] * np.exp(-np.outer(taus, ahat))).sum(axis=1)
        return taus, target

    def test_refined_fit_beats_nnls_with_fewer_terms(self):
        from c2ray_tpu.ops.tables import _fit_exp_mixture
        from c2ray_tpu.ops import tables as T
        from c2ray_tpu import constants as const
        from c2ray_tpu.ops.romberg import romberg_weights
        cfg = cfg64()
        t = build_rad_tables(cfg)
        a = np.asarray(t.exp_a)
        w = np.asarray(t.exp_w)
        # NNLS baseline on the same inputs
        props = T.sed_properties(cfg)
        freq_min = max(const.ION_FREQ_HI, cfg.sed.min_freq)
        n = cfg.num_freq
        freq = np.linspace(freq_min, cfg.sed.max_freq, n + 1)
        h = (cfg.sed.max_freq - freq_min) / n
        sed_vals = T._bb_sed_photon(freq, props.h_over_kt, props.r_star**2)
        ahat = (freq / freq_min) ** (-cfg.pl_index_cross_section_hi)
        wq = romberg_weights(n) * h * sed_vals
        a0, w0 = _fit_exp_mixture(wq, ahat, k=cfg.num_exp_terms)
        live = int((w0 != 0).sum())
        assert len(a) < live, (len(a), live)

        taus, target = self._targets(cfg, t)
        row_w = 1.0 / np.maximum(np.abs(target), 1e-7 * abs(target[0]))

        def err(ak, wk):
            fit = (wk[None, :] * np.exp(-np.outer(taus, ak))).sum(axis=1)
            return np.max(np.abs(fit - target) * row_w)

        # shipped (refined) error must not exceed the NNLS error, and the
        # mixture's normalization ratio is tied to S_star units; tau=0
        # photon count matches the quadrature exactly
        assert err(a, w * target[0] / w.sum()) <= err(a0, w0) + 1e-12

    def test_refined_mixture_tau_zero_normalization(self):
        """sum(w_k) equals the thick table at tau=0 (both in S_star
        units): photon-count exactness survives the refinement."""
        cfg = cfg64()
        t = build_rad_tables(cfg)
        assert float(np.asarray(t.exp_w).sum()) == pytest.approx(
            float(t.photo_thick[0]), rel=1e-9)

    def test_heat_gate_non_isothermal(self):
        """With heating built, the shared-basis heat weights exist for
        every term and the term count still shrinks vs the NNLS live
        set (or falls back without error)."""
        cfg = cfg64(isothermal=False)
        t = build_rad_tables(cfg)
        a = np.asarray(t.exp_a)
        hw = np.asarray(t.heat_exp_w)
        assert hw.shape == a.shape
        assert np.all(hw >= 0.0)
        assert len(a) <= cfg.num_exp_terms


class TestLookup:
    def test_interior_interpolation(self):
        cfg = cfg64(grey=True)
        t = build_rad_tables(cfg)
        # linear interpolation on the log-spaced table degrades for tau >> 1
        # (exactly as in the reference); test the physically relevant range
        taus = jnp.asarray([1e-6, 1e-3, 0.1, 1.0, 2.0])
        vals = np.asarray(table_lookup(t.photo_thick, taus, cfg))
        np.testing.assert_allclose(vals, np.exp(-np.asarray(taus)), rtol=2e-4)

    def test_tau_zero_reads_position_one(self):
        """The reference clamps tau at 1e-20 so tau=0 reads table(1)
        (radiation_photoionrates.F90:195-198)."""
        cfg = cfg64()
        t = build_rad_tables(cfg)
        v = float(table_lookup(t.photo_thick, jnp.asarray(0.0), cfg))
        assert v == pytest.approx(float(t.photo_thick[1]), rel=1e-12)


class TestPhotoionRates:
    def test_photon_conserving_telescoping(self):
        """Sum of per-cell rates over a ray equals absorbed photon rate."""
        cfg = cfg64()
        t = build_rad_tables(cfg)
        # a ray through 50 cells of equal column
        dcol = 1e17  # tau ~ 0.63/cell
        edges = jnp.asarray(np.arange(51) * dcol)
        cin, cout = edges[:-1], edges[1:]
        vol = jnp.ones_like(cin)
        r = photoion_rates(cfg, t, cin, cout, vol, jnp.asarray(1.0))
        total_cell = float(jnp.sum(r.photo_cell))
        absorbed = float(t.photo_thick[1]) - float(
            table_lookup(t.photo_thick, edges[-1] * const.SIGMA_HI_AT_ION_FREQ, cfg))
        assert total_cell == pytest.approx(absorbed, rel=1e-6)

    def test_thin_thick_branch_continuity(self):
        cfg = cfg64()
        t = build_rad_tables(cfg)
        cin = jnp.full((2,), 1e15)
        # straddle the 1e-7 tau threshold
        dtau_lo, dtau_hi = 0.9e-7, 1.1e-7
        couts = cin + jnp.asarray([dtau_lo, dtau_hi]) / const.SIGMA_HI_AT_ION_FREQ
        r = photoion_rates(cfg, t, cin, couts, jnp.ones(2), jnp.asarray(1.0))
        v = np.asarray(r.photo_cell)
        # the thick-difference and thin-derivative estimates differ by the
        # table's local interpolation error (~0.6%, same as the reference)
        assert v[1] == pytest.approx(v[0] * (dtau_hi / dtau_lo), rel=2e-2)


class TestXraySED:
    def test_xray_tables_and_rates(self):
        """X-ray (power-law) source path: tables built, rates additive
        (radiation_photoionrates.F90:133-138,167-173)."""
        from c2ray_tpu.config import SEDConfig
        cfg = make_config(mesh=8, dtype="float64",
                          sed=SEDConfig(use_xray_sed=True))
        t = build_rad_tables(cfg)
        assert float(t.xray_photo_thick[0]) == pytest.approx(1.0, rel=1e-8)
        cin = jnp.asarray([1e17])
        cout = jnp.asarray([2e17])
        vol = jnp.ones(1)
        r_b = photoion_rates(cfg, t, cin, cout, vol, jnp.asarray(1.0))
        r_bx = photoion_rates(cfg, t, cin, cout, vol, jnp.asarray(1.0),
                              nflux_xray=jnp.asarray(1.0))
        # adding an X-ray component strictly increases the cell rate, and
        # the X-ray (harder PL) component penetrates relatively more
        assert float(r_bx.photo_cell[0]) > float(r_b.photo_cell[0])
        r_x_only = photoion_rates(cfg, t, cin, cout, vol, jnp.asarray(0.0),
                                  nflux_xray=jnp.asarray(1.0))
        assert float(r_bx.photo_cell[0]) == pytest.approx(
            float(r_b.photo_cell[0]) + float(r_x_only.photo_cell[0]),
            rel=1e-12)

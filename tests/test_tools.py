"""Post-processing tools tests."""

import numpy as np
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.config import WMAP3PLUS
from c2ray_tpu.tools import (brightness_temperature_21cm, ionized_fractions,
                             ksz_map, power_spectrum, rate_pdf,
                             rms_fluctuation, thomson_tau)


def test_ionized_fractions():
    x = np.zeros((8, 8, 8))
    x[:4] = 1.0                       # half the volume ionized
    n = np.ones((8, 8, 8))
    n[:4] = 3.0                       # ionized half is denser
    f = ionized_fractions(x, n)
    assert f["vol_ionized"] == pytest.approx(0.5)
    assert f["mass_ionized"] == pytest.approx(0.75)
    assert f["vol_neutral"] == pytest.approx(0.5)


def test_21cm_scaling():
    """dTb scales linearly with the neutral density."""
    n = np.full((8, 8, 8), 2e-4)
    x0 = np.zeros((8, 8, 8))
    t1 = brightness_temperature_21cm(x0, n, 9.0, WMAP3PLUS)
    t2 = brightness_temperature_21cm(x0, 2 * n, 9.0, WMAP3PLUS)
    np.testing.assert_allclose(t2, 2 * t1)
    # fully neutral mean baryon density at z~9 gives dTb of order 10 mK
    assert 1.0 < t1.mean() < 100.0
    # ionized gas: no signal
    t3 = brightness_temperature_21cm(np.ones((8, 8, 8)), n, 9.0, WMAP3PLUS)
    assert np.all(t3 == 0.0)


def test_rms_and_power_spectrum():
    rng = np.random.default_rng(0)
    n = 32
    cube = 1.0 + 0.1 * rng.standard_normal((n, n, n))
    mean, rms = rms_fluctuation(cube)
    assert mean == pytest.approx(1.0, abs=0.01)
    assert rms == pytest.approx(0.1, rel=0.1)
    k, d2 = power_spectrum(cube, boxsize_cm=1.0)
    # white noise: Delta^2 ~ k^3
    assert np.all(np.isfinite(d2))
    assert d2[-2] > d2[2]


def test_rate_pdf():
    rates = 10.0 ** np.random.default_rng(1).uniform(-14, -12, 10000)
    centers, pdf = rate_pdf(rates)
    assert pdf[(centers > -14) & (centers < -12)].mean() > 0
    assert pdf[centers < -16].sum() == 0


def test_tau_and_ksz():
    n = 8
    x = np.ones((n, n, n))
    nd = np.full((n, n, n), 2e-4)
    tau = thomson_tau([x], [nd], [9.0], WMAP3PLUS)
    assert tau.shape == (n, n)
    assert np.all(tau > 0)
    vel = np.full((n, n, n), 1e7)     # 100 km/s toward observer
    m = ksz_map(x, nd, vel, 3e24)
    assert m.shape == (n, n)
    assert np.all(m > 0)


def test_cube_pdf_and_ifrit(tmp_path):
    from c2ray_tpu.tools import cube_pdf, write_ifrit_cube
    from c2ray_tpu.utils.io_fortran import read_unformatted_records

    cube = np.random.default_rng(2).normal(5.0, 1.0, (16, 16, 16))
    centers, pdf = cube_pdf(cube, nbins=50)
    # density integrates to 1
    assert np.trapezoid(pdf, centers) == pytest.approx(1.0, rel=0.05)

    m = np.arange(16.0).reshape(4, 4) / 16.0
    path = str(tmp_path / "ifrit.bin")
    write_ifrit_cube(m, path, scale=1e6)
    recs = read_unformatted_records(path)
    assert np.frombuffer(recs[0], np.int32).tolist() == [4, 4, 4]
    data = np.frombuffer(recs[1], np.float32).reshape(4, 4, 4, order="F")
    # every z-plane equals the scaled input map (Fortran (i,j) layout)
    for k in range(4):
        np.testing.assert_allclose(data[:, :, k], m.astype(np.float32) * 1e6,
                                   rtol=1e-6)


def test_ksz_interp_and_source_history(tmp_path):
    from c2ray_tpu.tools import ksz_map_interpolated, source_luminosity_history

    a = np.ones((8, 8)); b = np.zeros((8, 8))
    tot = ksz_map_interpolated([a, a], [b, b], [0.25, 0.75])
    np.testing.assert_allclose(tot, np.full((8, 8), 1.0))
    # with a pure random-velocity term on a unit tau map
    tot2 = ksz_map_interpolated([b], [b], [1.0], tau_maps=[a],
                                random_vel_sigma=[100.0], seed=3)
    assert np.all(tot2 == tot2[0, 0]) and tot2[0, 0] != 0.0

    rows = source_luminosity_history(
        [9.0, 8.5], [np.ones(10), np.ones(12)],
        [np.ones(4) * 2, np.ones(5) * 2],
        results_file=str(tmp_path / "srcs.dat"))
    assert rows.shape == (2, 5)
    assert rows[0].tolist() == [9.0, 10, 4, 10.0, 8.0]
    text = (tmp_path / "srcs.dat").read_text().splitlines()
    assert text[0].split()[0] == "9.000"

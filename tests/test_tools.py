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

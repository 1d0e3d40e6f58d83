"""doric ionization-update tests vs direct ODE integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from c2ray_tpu import constants as const
from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.ops.doric import doric, electrondens


CFG = make_config(mesh=8, dtype="float64")


def rk4_reference(dt, temp, ne, x0, phih, clumping=1.0, nsub=20000):
    """Brute-force integration of dx/dt = (1-x)(phih + ne C) - x ne alphaB
    with fixed rates, plus its running time average."""
    alpha = clumping * const.BH00 * (temp / 1e4) ** const.ALBPOW
    cion = const.COLH0 * np.sqrt(temp) * np.exp(-const.TEMPH0 / temp)
    a = phih + ne * cion
    b = ne * alpha

    def f(x):
        return (1.0 - x) * a - x * b

    h = dt / nsub
    x = x0
    acc = 0.0
    for _ in range(nsub):
        k1 = f(x)
        k2 = f(x + 0.5 * h * k1)
        k3 = f(x + 0.5 * h * k2)
        k4 = f(x + h * k3)
        xn = x + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        acc += 0.5 * (x + xn) * h
        x = xn
    return x, acc / dt


@pytest.mark.parametrize("phih,dt_years", [
    (1e-12, 1e6),    # strong ionization
    (1e-14, 1e7),    # moderate
    (0.0, 3e8),      # pure recombination toward equilibrium
])
def test_doric_matches_ode(phih, dt_years):
    temp = 1e4
    nh = 2e-4
    x_start = 0.3
    ne = nh * (x_start + const.ABU_C)  # fixed electron density (as in doric)
    dt = dt_years * const.YEAR
    res = doric(CFG, jnp.float64(dt), jnp.float64(temp), jnp.float64(ne),
                jnp.float64(x_start), jnp.float64(phih))
    x_ref, xav_ref = rk4_reference(dt, temp, ne, x_start, phih)
    assert float(res.xh1) == pytest.approx(x_ref, rel=1e-6, abs=1e-12)
    assert float(res.xh1_av) == pytest.approx(xav_ref, rel=1e-6, abs=1e-12)


def test_equilibrium_fixed_point():
    """Starting at the analytic equilibrium, doric stays there."""
    temp, nh, phih = 1e4, 1e-3, 1e-13
    alpha = const.BH00
    # solve x = a/(a+b) self-consistently in ne
    x = 0.5
    for _ in range(200):
        ne = nh * (x + const.ABU_C)
        cion = const.COLH0 * np.sqrt(temp) * np.exp(-const.TEMPH0 / temp)
        a = phih + ne * cion
        b = ne * alpha * (temp / 1e4) ** const.ALBPOW
        x = a / (a + b)
    ne = nh * (x + const.ABU_C)
    res = doric(CFG, jnp.float64(1e15), jnp.float64(temp), jnp.float64(ne),
                jnp.float64(x), jnp.float64(phih))
    assert float(res.xh1) == pytest.approx(x, rel=1e-10)
    assert float(res.xh1_av) == pytest.approx(x, rel=1e-10)


def test_time_average_bounds():
    """<x> must lie between x_start and x_end for monotonic evolution."""
    res = doric(CFG, jnp.float64(3e13), jnp.float64(1e4), jnp.float64(2e-4),
                jnp.float64(0.01), jnp.float64(1e-12))
    x0, x1, xav = 0.01, float(res.xh1), float(res.xh1_av)
    assert x0 < xav < x1


def test_epsilon_floor():
    """Fully ionized cells clamp x_HI at epsilon (doric.f90:108-111,128)."""
    # phih huge so the equilibrium neutral fraction drops below epsilon
    res = doric(CFG, jnp.float64(1e16), jnp.float64(1e4), jnp.float64(1e-3),
                jnp.float64(0.5), jnp.float64(1.0))
    assert float(res.xh0) == pytest.approx(CFG.epsilon)
    assert float(res.xh1) == pytest.approx(1.0 - CFG.epsilon)


def test_electrondens():
    assert float(electrondens(jnp.float64(1e-3), jnp.float64(0.4))) == (
        pytest.approx(1e-3 * (0.4 + const.ABU_C)))

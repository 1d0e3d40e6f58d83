"""Analytic time-dependent ionization update ("doric").

Vectorized re-implementation of the reference's per-cell ionization ODE
solution (/root/reference/doric.f90:33-134): with (iterated) constant
rates over the step, x(t) relaxes exponentially toward its equilibrium,
and the exact time average over the step is also produced — the key to
C2-Ray's large-timestep photon conservation.

All functions are pure, elementwise over arbitrarily shaped arrays, and
jit/vmap/shard_map friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as const
from ..config import RunConfig


class DoricResult(NamedTuple):
    xh1: jax.Array      # ionized fraction at end of step
    xh0: jax.Array      # neutral fraction at end of step
    xh1_av: jax.Array   # time-averaged ionized fraction
    xh0_av: jax.Array   # time-averaged neutral fraction


def electrondens(ndens: jax.Array, xh1: jax.Array) -> jax.Array:
    """Electron density n_e = n (x_HII + abu_c). tped.f90:75-83."""
    return ndens * (xh1 + const.ABU_C)


def doric(cfg: RunConfig, dt, temperature, rhe, xh1_old, phih,
          clumping=1.0, xh0_old=None) -> DoricResult:
    """Time-dependent H ionization solution over a step dt.

    Args mirror doric.f90:33-134:
      temperature: local T [K] (sets recombination + collisional rates)
      rhe:         (time-averaged, externally iterated) electron density
      xh1_old:     ionized fraction at start of step
      phih:        photoionization rate per neutral atom [1/s]
      clumping:    sub-grid clumping factor C (doric.f90:74)

    Solution (doric.f90:96-124):
      A = phih + n_e * colH0(T)          (total ionization rate)
      D = A + n_e * C * alphaB(T)        (relaxation rate)
      x_eq = A / D ;  x(t) = (x0 - x_eq) e^{-D dt} + x_eq
      <x> = x_eq + (x0 - x_eq) (1 - e^{-D dt}) / (D dt)

    xh0_old: optional EXACT start-of-step neutral fraction (the
    compressed-storage path, state.compress_xh).  When given, the
    neutral-side solution and average are computed natively from it (the
    same relaxation toward eqxfh0), so the x_HI tail never routes
    through 1 - x_HII; when None the reference's 1-x formulas apply
    bitwise-unchanged.
    """
    dtype = jnp.result_type(xh1_old)
    eps = jnp.asarray(cfg.epsilon, dtype)

    # recombination + collisional ionization rates at local T (doric.f90:74-79)
    brech0 = clumping * const.BH00 * (temperature / 1e4) ** const.ALBPOW
    sqrtt0 = jnp.sqrt(temperature)
    acolh0 = const.COLH0 * sqrtt0 * jnp.exp(-const.TEMPH0 / temperature)

    aih0 = phih + rhe * acolh0
    delth = aih0 + rhe * brech0
    eqxfh1 = aih0 / delth
    eqxfh0 = rhe * brech0 / delth
    deltht = delth * dt
    ee = jnp.exp(-deltht)

    native_xh0 = xh0_old is not None
    if not native_xh0:
        xh0_old = 1.0 - xh1_old
    xh1 = (xh1_old - eqxfh1) * ee + eqxfh1
    xh0 = (xh0_old - eqxfh0) * ee + eqxfh0

    # precision guard (doric.f90:108-111)
    under = xh0 < eps
    xh0 = jnp.where(under, eps, xh0)
    xh1 = jnp.where(under, 1.0 - eps, xh1)

    # exact time average; -expm1(-x)/x is stable for all x and reproduces the
    # reference's small-deltht guard (doric.f90:112-124) to rounding.
    avg_factor = jnp.where(deltht < 1.0e-8,
                           jnp.ones_like(deltht),
                           -jnp.expm1(-deltht) / deltht)
    xh1_av = eqxfh1 + (xh1_old - eqxfh1) * avg_factor
    if native_xh0:
        # the same relaxation applied to the neutral side directly
        # (mathematically 1 - xh1_av; tail-exact in float32)
        xh0_av = eqxfh0 + (xh0_old - eqxfh0) * avg_factor
        xh0_av = jnp.maximum(xh0_av, eps)
    else:
        xh0_av = 1.0 - xh1_av
        xh0_av = jnp.maximum(xh0_av, eps)  # doric.f90:128

    return DoricResult(xh1, xh0, xh1_av, xh0_av)

"""Grid state containers and problem initialization.

Replaces the reference's mutable module-level field arrays
(density_module.F90 ndens, ionfractions_module.F90 xh,
temperature_module.F90 temperature_grid, evolve_data.F90 work grids)
with an immutable pytree threaded through the solver.

Design choice: the *comoving* density and cell size are the invariant
base state; proper (physical) values are derived per step from the
current redshift, which reproduces the reference's in-place incremental
rescaling (cosmology.F90:161-193 cosmo_evol) without mutation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from . import constants as const
from .config import RunConfig


class GridState(NamedTuple):
    """Prognostic fields (all (N,N,N) at cfg dtype).

    xh1:      H ionized fraction at the last completed step (xh).
              With cfg.compressed_xfrac this holds the COMPRESSED form
              (see compress_xh below); decode with xh1_of/xh0_of.
    temper_*: temperature states {current, average, intermed}
              (temperature_module.F90:21-35); None when isothermal.
    """

    xh1: jax.Array
    temper_current: Optional[jax.Array] = None
    temper_av: Optional[jax.Array] = None
    temper_intermed: Optional[jax.Array] = None


# ---------------------------------------------------------------------------
# compressed ionization-fraction storage (the reference's compressed/
# variant, compressed/README:1-13): always store the SMALLER of
# (x_HI, x_HII), the sign disambiguating which - negative means x_HI is
# stored.  This keeps full float precision on BOTH tails: the neutral
# fraction inside ionized regions (which sets the residual opacity and
# recombination photon budget) survives float32 storage, where the plain
# representation floors it at ~1e-7 (1 - float32-nearest-to-1).
# ---------------------------------------------------------------------------

def compress_xh(xh1: jax.Array, xh0: Optional[jax.Array] = None) -> jax.Array:
    """Encode (x_HII [, x_HI]) into the signed compressed form.

    Pass the natively-computed neutral fraction xh0 when available (the
    chemistry does) so the x_HI tail never routes through 1 - x_HII.

    A fully saturated cell (x_HI == 0) must NOT encode as -0.0: IEEE
    -0.0 >= 0 is true, so the decoders would read it as fully NEUTRAL.
    It is stored as +1.0 instead, which decodes exactly (x1=1, x0=0).
    """
    if xh0 is None:
        xh0 = 1.0 - xh1
    return jnp.where(xh1 <= 0.5, xh1,
                     jnp.where(xh0 > 0.0, -xh0, jnp.ones_like(xh1)))


def xh1_of(xc: jax.Array) -> jax.Array:
    """Ionized fraction from the compressed form (tail-exact for x<=0.5)."""
    return jnp.where(xc >= 0, xc, 1.0 + xc)


def xh0_of(xc: jax.Array) -> jax.Array:
    """Neutral fraction from the compressed form (tail-exact for x_HI<=0.5)."""
    return jnp.where(xc >= 0, 1.0 - xc, -xc)


class MaterialState(NamedTuple):
    """Non-prognostic material fields.

    ndens_comoving: comoving H(+He) number density [cm^-3 comoving]
                    (density_module.F90:22 - single precision there too).
    clumping_grid:  per-cell clumping factors (None => scalar model).
    lls_grid:       per-cell LLS column densities (None => scalar model).
    """

    ndens_comoving: jax.Array
    clumping_grid: Optional[jax.Array] = None
    lls_grid: Optional[jax.Array] = None


def initial_state(cfg: RunConfig) -> GridState:
    """Initial ionization (RECFAST 2e-4, ionfractions_module.F90:41-50)
    and temperature (initial_temperature, material.F90)."""
    n = cfg.mesh
    dt = cfg.jnp_dtype
    xh1 = jnp.full(n, cfg.initial_xh, dt)
    if cfg.compressed_xfrac:
        xh1 = compress_xh(xh1)
    if cfg.isothermal:
        return GridState(xh1=xh1)
    t = jnp.full(n, cfg.initial_temperature, dt)
    return GridState(xh1=xh1, temper_current=t, temper_av=t, temper_intermed=t)


def mean_baryon_density(cfg: RunConfig, redshift: float) -> float:
    """Proper mean (H+He) number density at `redshift`.

    avg_dens = rho_crit_0 * Omega_B / (mu m_p) * (1+z)^3
    (density_module.F90:129-147, set_constant_average_density).
    """
    c = cfg.cosmo
    return c.rho_crit_0 * c.omega_b / (const.MU * const.M_P) * (1.0 + redshift) ** 3


def uniform_material(cfg: RunConfig) -> MaterialState:
    """Test-problem material: uniform density at the comoving mean.

    The comoving value is the z=0 mean; proper density at z follows by
    (1+z)^3, matching set_constant_average_density for every slice.
    """
    c = cfg.cosmo
    n0 = c.rho_crit_0 * c.omega_b / (const.MU * const.M_P)
    nd = jnp.full(cfg.mesh, n0, cfg.jnp_dtype)
    return MaterialState(ndens_comoving=nd)


def proper_fields(cfg: RunConfig, mat: MaterialState, redshift: float):
    """Derive (ndens_proper, dr_proper, vol_proper) at a redshift.

    For non-cosmological runs the comoving values are used as-is
    (cosmological flag, c2ray_parameters.f90:105).
    """
    if cfg.cosmological:
        zp1 = 1.0 + redshift
    else:
        zp1 = 1.0
    ndens = mat.ndens_comoving * cfg.np_dtype(zp1**3)
    dr = cfg.dr_comoving / zp1
    vol = dr**3
    return ndens, dr, vol

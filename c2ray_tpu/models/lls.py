"""Lyman-limit system (LLS) absorption models.

Re-implementation of /root/reference/LLS.F90: three mechanisms selected
by cfg.type_of_lls:
  1: homogeneous extra column per cell from a mean-free-path model
  2: position-dependent grid (from file), scaled to a target mfp
  3: hard spherical barrier at R_max (21cmFAST-style)
and five mfp models (LLS.F90:89-103) for types 1/2.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np

from .. import constants as const
from ..config import RunConfig

# typical optical depth of one mean free path and its column (LLS.F90:76-77)
OPDEPTH_LL = 1.0
N_1 = OPDEPTH_LL / const.SIGMA_HI_AT_ION_FREQ

# do not let the mfp drop below these (LLS.F90:85-86)
LIMIT_MFP_PMPC = 0.2
LIMIT_MFP_CMPC = 1.0


class MfpModel(NamedTuple):
    """mfp(z) = A * ((1+z)/(1+z_ref))^yz  [proper Mpc]. LLS.F90:68-103."""

    reference: str
    a_lls: float
    z_ref: float
    yz_lls: float


def mfp_models(h: float) -> dict:
    """The 5 models (LLS_model 1..5); A scales with h (LLS.F90:89-103)."""
    return {
        1: MfpModel("W14 mfp std", 37.0 / (h / 0.7), 4.0, -5.4),
        2: MfpModel("W14 mfp low", 35.0 / (h / 0.7), 4.0, -5.8),
        3: MfpModel("W14 mfp high", 39.0 / (h / 0.7), 4.0, -5.0),
        4: MfpModel("constant proper mfp", 1.0, 4.0, 0.0),
        5: MfpModel("constant comoving mfp", 10.0, 0.0, -1.0),
    }


@dataclass
class LLSState:
    """Per-step LLS quantities fed to the sweep."""

    coldensh_lls: float = 0.0   # column density per cell [cm^-2] (types 1,2)
    mfp_pmpc: float = 0.0       # diagnostic
    r_max_cells: float = 0.0    # barrier radius in cell units (type 3)
    grid: Optional[np.ndarray] = None  # per-cell columns (type 2)


def set_lls(cfg: RunConfig, zred: float, dr_proper: float,
            lls_grid: Optional[np.ndarray] = None) -> LLSState:
    """Per-redshift LLS setup (set_LLS, LLS.F90:167-195).

    dr_proper: proper cell size [cm].
    """
    if not cfg.use_lls:
        return LLSState()
    if cfg.type_of_lls == 1:
        m = mfp_models(cfg.cosmo.h)[cfg.lls_model]
        mfp_pmpc = m.a_lls * ((1.0 + zred) / (1.0 + m.z_ref)) ** m.yz_lls
        mfp_pmpc = max(mfp_pmpc, LIMIT_MFP_CMPC / (1.0 + zred))
        n_lls = dr_proper / (mfp_pmpc * const.MPC)
        coldens = N_1 * n_lls
        return LLSState(coldensh_lls=coldens, mfp_pmpc=mfp_pmpc)
    if cfg.type_of_lls == 2:
        if lls_grid is None:
            raise ValueError("type_of_lls=2 requires an LLS grid")
        # read_LLS_grid conversion (LLS.F90:269-300): lls_grid holds
        # normalized LLS cross sections (unit mean free path in pMpc);
        # scale to the model mfp (no floor in this branch), zero the grid
        # when the mfp falls below the comoving limit, else convert the
        # per-cell covering fractions to column densities
        m = mfp_models(cfg.cosmo.h)[cfg.lls_model]
        mfp_pmpc = m.a_lls * ((1.0 + zred) / (1.0 + m.z_ref)) ** m.yz_lls
        g = np.asarray(lls_grid, np.float64) / mfp_pmpc
        if mfp_pmpc < LIMIT_MFP_CMPC / (1.0 + zred):
            g = np.zeros_like(g)
        else:
            g = g * (const.MPC / dr_proper) ** 2 * N_1
        return LLSState(coldensh_lls=float(np.mean(g)), mfp_pmpc=mfp_pmpc,
                        grid=g)
    elif cfg.type_of_lls == 3:
        # hard barrier: R_max comoving Mpc -> proper, in cell units
        # (LLS.F90:151-158,186)
        r_max_cm = cfg.r_max_cmpc * const.MPC / (1.0 + zred)
        return LLSState(r_max_cells=r_max_cm / dr_proper)
    return LLSState()


def set_lls_device(cfg: RunConfig, zred: float, dr_proper: float,
                   lls_grid) -> LLSState:
    """Type-2 LLS setup on a (possibly sharded) DEVICE grid: identical
    math to set_lls's type-2 branch, elementwise on the slab-resident
    cross-section cube (round 5, VERDICT item 6 — the halo layout's
    grid LLS without a host cube; read_LLS_grid, LLS.F90:269-300)."""
    import jax.numpy as jnp

    assert cfg.use_lls and cfg.type_of_lls == 2
    m = mfp_models(cfg.cosmo.h)[cfg.lls_model]
    mfp_pmpc = m.a_lls * ((1.0 + zred) / (1.0 + m.z_ref)) ** m.yz_lls
    if mfp_pmpc < LIMIT_MFP_CMPC / (1.0 + zred):
        g = jnp.zeros_like(lls_grid)
        return LLSState(coldensh_lls=0.0, mfp_pmpc=mfp_pmpc, grid=g)
    scale = (1.0 / mfp_pmpc) * (const.MPC / dr_proper) ** 2 * N_1
    g = lls_grid * lls_grid.dtype.type(scale)
    return LLSState(coldensh_lls=float(jnp.mean(g)), mfp_pmpc=mfp_pmpc,
                    grid=g)

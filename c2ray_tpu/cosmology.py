"""Cosmological evolution helpers.

Re-implementation of the reference's cosmology layer
(/root/reference/cosmology.F90) in functional form: instead of mutating
global grid/density state in place (cosmo_evol, cosmology.F90:161-193),
we track a single proper/comoving scale factor on the host and apply it
to the (comoving, immutable) base state when constructing the per-step
physical fields.  All formulas are the matter-dominated high-z
approximations the reference uses.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .config import CosmologyParams


@dataclass
class CosmoClock:
    """Tracks redshift and proper scaling, mirroring module `cosmology`.

    Reference: cosmology.F90:40-44 (module data zred_t0, t0, zred, Hz).
    """

    params: CosmologyParams
    zred_t0: float       # initial redshift
    t0: float            # cosmic time at zred_t0
    zred: float = 0.0    # current redshift (0 => fields still comoving)

    @classmethod
    def init(cls, params: CosmologyParams, zred0: float) -> "CosmoClock":
        """cosmology_init: cosmology.F90:51-75.

        t0 = 2 (1+z0)^{-3/2} / (3 H0 sqrt(Omega0)); zred starts at 0 so
        the first redshift_evol converts comoving -> proper.
        """
        t0 = 2.0 * (1.0 + zred0) ** (-1.5) / (3.0 * params.H0 * np.sqrt(params.omega0))
        return cls(params=params, zred_t0=zred0, t0=t0, zred=0.0)

    # ------------------------------------------------------------------
    def time2zred(self, time: float) -> float:
        """cosmology.F90:80-98 (high-z matter-dominated)."""
        return -1.0 + (1.0 + self.zred_t0) * (self.t0 / (self.t0 + time)) ** (2.0 / 3.0)

    def zred2time(self, zred1: float) -> float:
        """cosmology.F90:103-121."""
        return self.t0 * (((1.0 + self.zred_t0) / (1.0 + zred1)) ** 1.5 - 1.0)

    # ------------------------------------------------------------------
    def redshift_evol(self, time: float) -> float:
        """Advance current redshift; return zfactor = (1+z_prev)/(1+z_new).

        Reference: cosmology.F90:127-155.  The returned zfactor is what
        cosmo_evol would use to rescale lengths (and ndens by 1/zfactor^3).
        """
        zred_prev = self.zred
        self.zred = -1.0 + (1.0 + self.zred_t0) * ((self.t0 + time) / self.t0) ** (-2.0 / 3.0)
        return (1.0 + zred_prev) / (1.0 + self.zred)

    @property
    def Hz(self) -> float:
        """Hubble constant at current redshift. cosmology.F90:153."""
        p = self.params
        return p.H0 * (1.0 + self.zred) ** 1.5 * np.sqrt(p.omega0)

    @property
    def proper_scale(self) -> float:
        """Overall comoving->proper length factor 1/(1+zred).

        Equivalent to the product of all zfactors applied since init
        (the reference applies them incrementally in cosmo_evol).
        """
        return 1.0 / (1.0 + self.zred) if self.zred != 0.0 else 1.0

    # ------------------------------------------------------------------
    def cosmo_cool_rate(self, e_int, zred=None):
        """Adiabatic (Hubble) cooling rate. cosmology.F90:198-225."""
        p = self.params
        z = self.zred if zred is None else zred
        dzdt = p.H0 * (1.0 + z) * np.sqrt(p.omega0 * (1.0 + z) ** 3 + 1.0 - p.omega0)
        return e_int * 2.0 / (1.0 + z) * dzdt

    def compton_cool_rate(self, temper, eldens, zred=None):
        """Compton cooling vs the CMB. cosmology.F90:230-251."""
        z = self.zred if zred is None else zred
        return 5.65e-36 * eldens * (1.0 + z) ** 4 * (temper - self.params.cmbtemp * (1.0 + z))

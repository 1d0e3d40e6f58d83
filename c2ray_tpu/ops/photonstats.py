"""Photon conservation statistics.

Re-implementation of /root/reference/photonstatistics.F90: the per-step
audit comparing photons emitted against ionizations + recombinations +
losses.  Device-side code computes only unit-safe normalized reductions
(float32 would overflow on cgs totals ~1e68); the host assembles physical
totals in float64.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from .. import constants as const
from ..config import RunConfig
from .doric import electrondens


class GridCounts(NamedTuple):
    """Device reductions, per unit cell volume (multiply by vol on host)."""

    h0: jax.Array          # sum of n * x_HI over cells
    h1: jax.Array          # sum of n * x_HII over cells
    rec_rate: jax.Array    # sum of recombination rates [cm^-3 s^-1 * cells]
    coll_rate: jax.Array   # sum of collisional ionization rates


def grid_counts(cfg: RunConfig, ndens, xh1, temper_av=None,
                clumping: Union[float, jax.Array] = 1.0,
                compressed: bool = False) -> GridCounts:
    """Neutral/ionized atom counts and total recombination/collision rates.

    Reference: photonstatistics.F90:104-185 (state_before/after,
    total_rates).  The rate formulas intentionally match doric's
    (photonstatistics.F90:150-151 comment).

    compressed: `xh1` is in the signed compressed min-fraction form
    (state.compress_xh); both sides are decoded natively so the neutral
    tail inside ionized regions keeps its full stored precision in the
    recombination audit - the analogue of the reference's compressed
    photonstatistics variant summing both fractions from storage
    (/root/reference/compressed/photonstatistics.F90).
    """
    if compressed:
        from ..state import xh0_of, xh1_of
        x1 = xh1_of(xh1)
        x0 = xh0_of(xh1)
    else:
        x1 = xh1
        x0 = 1.0 - xh1
    h0 = jnp.sum(ndens * x0)
    h1 = jnp.sum(ndens * x1)
    if temper_av is None:
        t = cfg.initial_temperature
        brech = clumping * const.BH00 * (t / 1e4) ** const.ALBPOW
        acol = const.COLH0 * jnp.sqrt(jnp.asarray(t, ndens.dtype)) * jnp.exp(
            jnp.asarray(-const.TEMPH0 / t, ndens.dtype))
    else:
        brech = clumping * const.BH00 * (temper_av / 1e4) ** const.ALBPOW
        acol = const.COLH0 * jnp.sqrt(temper_av) * jnp.exp(-const.TEMPH0 / temper_av)
    ne = electrondens(ndens, x1)
    rec = jnp.sum(ndens * x1 * ne * brech)
    coll = jnp.sum(ndens * x0 * ne * acol)
    return GridCounts(h0, h1, rec, coll)


@dataclass
class PhotonStatistics:
    """Host-side accumulator mirroring module photonstatistics.

    All quantities in physical photon counts (float64 on host).
    Reference: photonstatistics.F90:39-66 (state), :222-293.
    """

    cfg: RunConfig
    do_photonstatistics: bool = True
    h0_before: float = 0.0
    h1_before: float = 0.0
    h0_after: float = 0.0
    h1_after: float = 0.0
    totrec: float = 0.0
    totcollisions: float = 0.0
    dh0: float = 0.0
    total_ion: float = 0.0
    grtotal_ion: float = 0.0      # grand totals (initialize_photonstatistics)
    grtotal_src: float = 0.0
    # last reported derived numbers
    photon_cons: float = 1.0
    total_photon_loss: float = 0.0
    total_lls_loss: float = 0.0
    totalsrc: float = 0.0

    def state_before(self, counts: GridCounts, vol: float) -> None:
        """photonstatistics.F90:104-132."""
        self.h0_before = float(counts.h0) * vol
        self.h1_before = float(counts.h1) * vol

    def calculate(self, counts_after: GridCounts, rate_counts: GridCounts,
                  vol: float, dt: float) -> None:
        """calculate_photon_statistics: photonstatistics.F90:82-99,190-228.

        counts_after: from the end-of-step ionization state (xh_l arg).
        rate_counts:  from the time-averaged state (xh_r arg) - supplies
                      the recombination/collision totals.
        """
        self.h0_after = float(counts_after.h0) * vol
        self.h1_after = float(counts_after.h1) * vol
        self.totrec = float(rate_counts.rec_rate) * vol * dt
        self.totcollisions = float(rate_counts.coll_rate) * vol * dt
        self.dh0 = self.h0_before - self.h0_after
        self.total_ion = self.totrec + self.dh0

    def report(self, dt: float, photon_loss: float, lls_loss: float,
               total_flux_s_star: float) -> dict:
        """report_photonstatistics: photonstatistics.F90:254-281.

        photon_loss / lls_loss are in S_star photon-rate units (as produced
        by the sweep); total_flux_s_star is sum(NormFlux) in the same units.
        """
        s_star = self.cfg.sed.s_star
        self.total_photon_loss = photon_loss * s_star * dt
        self.total_lls_loss = lls_loss * s_star * dt
        self.totalsrc = total_flux_s_star * s_star * dt
        lls_count = self.total_lls_loss
        if self.totalsrc > 0.0:
            self.photon_cons = (self.total_ion + lls_count
                                - self.totcollisions) / self.totalsrc
        else:
            self.photon_cons = 1.0
        ti = self.total_ion if self.total_ion != 0.0 else 1.0
        return {
            "total_ion": self.total_ion,
            "totalsrc": self.totalsrc,
            "photon_cons": self.photon_cons,
            "frac_new_ion": self.dh0 / ti,
            "frac_rec": self.totrec / ti,
            "frac_lls_loss": lls_count / self.totalsrc if self.totalsrc else 0.0,
            "frac_photon_loss": (self.total_photon_loss / self.totalsrc
                                 if self.totalsrc else 0.0),
            "frac_coll": self.totcollisions / ti,
            "h1_before": self.h1_before,
            "h1_after": self.h1_after,
        }

    def update_grandtotal(self, dt: float, total_flux_s_star: float) -> None:
        """photonstatistics.F90:286-293."""
        self.grtotal_src += total_flux_s_star * self.cfg.sed.s_star * dt
        self.grtotal_ion += self.total_ion - self.totcollisions

"""Grid-wide chemistry pass: apply accumulated rates to every cell.

Vectorized re-implementation of evolve0D_global + do_chemistry
(/root/reference/evolve_point.F90:305-555): for each cell, a fixed-point
iteration couples the analytic doric ionization update to the (time
averaged) electron density (and, non-isothermally, to the thermal
evolution), starting every iteration from the step-initial ionization
state.  The per-cell convergence exits become a masked lax.while_loop:
converged cells freeze, the loop runs until all cells converge or the
400-iteration cap (evolve_point.F90:541) is hit.

Parity notes:
  * The reference's inner-loop temperature convergence test compares
    temperature_end%current against itself (never updated inside the loop,
    evolve_point.F90:451,534) and is therefore always satisfied; we
    reproduce that by testing only the ionization criterion.
  * The outer non-convergence count (conv_flag) reproduces the exact
    compound condition at evolve_point.F90:384-391.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
from jax import lax

from ..config import RunConfig
from .doric import doric, electrondens
from .thermal import CoolingTable, thermal


class ChemistryResult(NamedTuple):
    xh1_intermed: jax.Array   # end-of-step ionized fraction (xh_intermed)
    xh1_av: jax.Array         # time-averaged ionized fraction (xh_av)
    temper_intermed: jax.Array  # end-of-step temperature (states%intermed)
    temper_av: jax.Array        # time-averaged temperature (states%average)
    conv_flag: jax.Array      # number of non-converged cells (int32 scalar)
    n_iterations: jax.Array   # inner fixed-point iterations used


def global_chemistry(cfg: RunConfig, dt,
                     ndens: jax.Array,
                     xh1_old: jax.Array,       # xh (step-initial)
                     xh1_intermed: jax.Array,  # xh_intermed (iterate)
                     xh1_av: jax.Array,        # xh_av (iterate)
                     phih: jax.Array,          # accumulated per-atom rate [1/s]
                     phiheat: Optional[jax.Array] = None,
                     temper_current: Optional[jax.Array] = None,
                     temper_av: Optional[jax.Array] = None,
                     clumping: Union[float, jax.Array] = 1.0,
                     cool: Optional[CoolingTable] = None,
                     cosmo_cool_coeff: float = 0.0,
                     photon_loss_rate: Union[float, jax.Array] = 0.0,
                     ) -> ChemistryResult:
    """One global pass over the mesh (global_pass -> evolve0D_global).

    Reference: evolve.F90:499-573 drives evolve0D_global over every cell;
    here the triple loop is a single vectorized computation.

    photon_loss_rate: optional per-cell rate from redistributed boundary
    losses (add_photon_losses, disabled by default as in
    c2ray_parameters.f90:64).
    """
    dtype = ndens.dtype
    eps = cfg.epsilon
    dt = jnp.asarray(dt, dtype)
    compressed = cfg.compressed_xfrac

    # initial local states (evolve_point.F90:341-354); under compressed
    # storage (state.compress_xh) the x inputs are signed min-fraction
    # arrays and BOTH sides decode tail-exactly
    if compressed:
        from ..state import compress_xh, xh0_of, xh1_of
        h1_start = jnp.maximum(eps, xh1_of(xh1_intermed))
        h0_start = jnp.maximum(eps, xh0_of(xh1_intermed))
        h1_old = jnp.maximum(eps, xh1_of(xh1_old))
        h0_old = jnp.maximum(eps, xh0_of(xh1_old))
        h_av1_start = jnp.maximum(eps, xh1_of(xh1_av))
        h_av0_start = jnp.maximum(eps, xh0_of(xh1_av))
    else:
        h1_start = jnp.maximum(eps, xh1_intermed)
        h1_old = jnp.maximum(eps, xh1_old)
        h_av1_start = jnp.maximum(eps, xh1_av)
        h0_start = 1.0 - h1_start
        h0_old = None
        h_av0_start = jnp.maximum(eps, 1.0 - h_av1_start)

    isothermal = cfg.isothermal
    if isothermal:
        t_av0 = jnp.full_like(ndens, cfg.initial_temperature)
        t_cur0 = t_av0
    else:
        t_cur0 = temper_current
        t_av0 = temper_av

    phih_total = phih + photon_loss_rate

    max_iter = cfg.max_chemistry_iterations

    def cond(state):
        nit = state[0]
        active = state[-1]
        return jnp.logical_and(nit <= max_iter, jnp.any(active))

    def body(state):
        nit, h1, h0, h_av1, h_av0, t_int, t_av, active = state
        h_av0_prev = h_av0 if compressed else jnp.maximum(1.0 - h_av1, eps)
        # mean electron density from the time-averaged state
        de = electrondens(ndens, h_av1)
        # doric restarts from the step-initial state each iteration
        # (evolve_point.F90:463)
        res = doric(cfg, dt, t_av, de, h1_old, phih_total, clumping,
                    xh0_old=h0_old)
        if isothermal:
            t_int_new, t_av_new = t_int, t_av
        else:
            de2 = electrondens(ndens, res.xh1_av)
            th = thermal(cfg, cool, dt, t_cur0, de2, ndens,
                         res.xh1, res.xh1_av, h1_old, phiheat,
                         cosmo_cool_coeff)
            t_int_new, t_av_new = th.final_temperature, th.average_temperature
        # per-cell convergence on the time-averaged neutral fraction
        # (evolve_point.F90:531-538; the T criterion is vacuous, see module
        # docstring)
        converged = jnp.logical_or(
            jnp.abs((res.xh0_av - h_av0_prev) / res.xh0_av)
            < cfg.minimum_fractional_change,
            res.xh0_av < cfg.minimum_fraction_of_atoms)
        keep = lambda new, old: jnp.where(active, new, old)
        h1_n = keep(res.xh1, h1)
        h0_n = keep(res.xh0, h0)
        h_av1_n = keep(res.xh1_av, h_av1)
        h_av0_n = keep(res.xh0_av, h_av0)
        t_int_n = keep(t_int_new, t_int)
        t_av_n = keep(t_av_new, t_av)
        active_n = jnp.logical_and(active, jnp.logical_not(converged))
        return (nit + 1, h1_n, h0_n, h_av1_n, h_av0_n, t_int_n, t_av_n,
                active_n)

    active0 = jnp.ones(ndens.shape, bool)
    state0 = (jnp.asarray(1, jnp.int32), h1_start, h0_start, h_av1_start,
              h_av0_start, t_cur0, t_av0, active0)
    nit, h1, h0, h_av1, h_av0_n, t_int, t_av, _ = lax.while_loop(
        cond, body, state0)

    # outer non-convergence count (evolve_point.F90:384-391)
    if compressed:
        yh0_av_old = h_av0_start
        h_av0 = h_av0_n
    else:
        yh1_av_old = jnp.maximum(eps, xh1_av)
        yh0_av_old = 1.0 - yh1_av_old
        h_av0 = jnp.maximum(1.0 - h_av1, eps)
    mfc = cfg.minimum_fractional_change
    ion_cond = ((jnp.abs(h_av0 - yh0_av_old) > mfc)
                & (jnp.abs((h_av0 - yh0_av_old) / h_av0) > mfc)
                & (h_av0 > cfg.minimum_fraction_of_atoms))
    if isothermal:
        temp_cond = jnp.zeros(ndens.shape, bool)
    else:
        temp_cond = ((jnp.abs((t_av0 - t_av) / t_av) > 1.0e-1)
                     & (jnp.abs(t_av0 - t_av) > 100.0))
    conv_flag = jnp.sum(ion_cond | temp_cond).astype(jnp.int32)

    if compressed:
        out_int = compress_xh(h1, h0)
        out_av = compress_xh(h_av1, h_av0_n)
        return ChemistryResult(out_int, out_av, t_int, t_av, conv_flag,
                               nit - 1)
    return ChemistryResult(h1, h_av1, t_int, t_av, conv_flag, nit - 1)

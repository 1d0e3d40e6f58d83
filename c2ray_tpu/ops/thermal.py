"""Thermal evolution: CIE cooling table + subcycled heating/cooling ODE.

Reference mapping:
  - cooling table + interpolation: /root/reference/cooling.f90:26-87
  - per-cell thermal integration:  /root/reference/thermal.f90:22-176
  - T/pressure/electron-density:   /root/reference/tped.f90:41-83

The reference reads a 61-point log10(T) CIE cooling curve from an external
file 'tables/corocool.tab' which is NOT part of the repository.  We default
to an analytic H-only CIE curve (collisional excitation + ionization,
recombination, bremsstrahlung; standard Cen 1992 / Hui & Gnedin 1997 fits)
sampled in the same 61-point format, and support loading a corocool.tab
for exact parity with a reference run.

The per-cell adaptively subcycled loop (thermal.f90:98-159) becomes a
masked lax.while_loop over the whole grid: every cell advances with its
own adaptive dt until its cumulative time reaches the step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import constants as const
from ..config import RunConfig
from .doric import electrondens

TEMPPOINTS = 61  # cooling.f90:26


class CoolingTable(NamedTuple):
    """log10(T)-indexed CIE cooling curve (erg cm^3/s). cooling.f90:26-31."""

    cie_cool: jax.Array  # (TEMPPOINTS,) linear cooling rates
    mintemp: float       # lowest log10(T)
    dtemp: float         # log10(T) step


def analytic_cie_curve(logT: np.ndarray) -> np.ndarray:
    """H-only collisional-ionization-equilibrium cooling curve.

    Normalized per n_H * n_e (erg cm^3 / s), like the corocool table.
    Components (standard fits, Cen 1992):
      - collisional excitation of HI: 7.5e-19 exp(-118348/T)/(1+sqrt(T/1e5)) * x_HI
      - collisional ionization of HI: 1.27e-21 sqrt(T) exp(-157809/T)/(1+sqrt(T/1e5)) * x_HI
      - recombination (case B):       0.75 * 3.41e-27 T^0.5 (T/1e3)^-0.2 / (1+(T/1e6)^0.7) * x_HII
      - free-free (g_ff=1.3):         1.42e-27 * 1.3 * sqrt(T) * x_HII
    with x_HI/x_HII the CIE balance between collisional ionization and
    case-B recombination at temperature T.
    """
    T = 10.0 ** np.asarray(logT, dtype=np.float64)
    sq5 = 1.0 + np.sqrt(T / 1e5)
    with np.errstate(over="ignore", under="ignore"):
        # CIE ionization balance: x1/x0 = C(T)/alphaB(T)
        cion = 5.85e-11 * np.sqrt(T) * np.exp(-157809.1 / T) / sq5
        alphab = const.BH00 * (T / 1e4) ** const.ALBPOW
        x1 = cion / (cion + alphab)
        x0 = 1.0 - x1
        lam_exc = 7.50e-19 * np.exp(-118348.0 / T) / sq5 * x0
        lam_cion = 1.27e-21 * np.sqrt(T) * np.exp(-157809.1 / T) / sq5 * x0
        lam_rec = 0.75 * 3.41e-27 * np.sqrt(T) * (T / 1e3) ** (-0.2) / (
            1.0 + (T / 1e6) ** 0.7) * x1
        lam_ff = 1.42e-27 * 1.3 * np.sqrt(T) * x1
    lam = lam_exc + lam_cion + lam_rec + lam_ff
    return np.maximum(lam, 1e-60)


def setup_cool(cfg: RunConfig, table_file: Optional[str] = None) -> CoolingTable:
    """Build (or read) the cooling table. cooling.f90:64-87."""
    if table_file is not None:
        data = np.loadtxt(table_file)
        logT = data[:, 0]
        cie = 10.0 ** data[:, 1]
    else:
        logT = np.linspace(1.0, 9.0, TEMPPOINTS)
        cie = analytic_cie_curve(logT)
    return CoolingTable(
        cie_cool=jnp.asarray(cie.astype(cfg.np_dtype)),
        mintemp=float(logT[0]),
        dtemp=float(logT[1] - logT[0]),
    )


def coolin(cool: CoolingTable, nucldens, eldens, temp):
    """Cooling rate with linear table interpolation. cooling.f90:38-59."""
    dtype = jnp.result_type(temp)
    tpos = (jnp.log10(temp) - cool.mintemp) / cool.dtemp + 1.0
    itpos = jnp.clip(jnp.floor(tpos).astype(jnp.int32), 1, TEMPPOINTS - 1)
    dtpos = tpos - itpos.astype(dtype)
    itpos1 = jnp.minimum(TEMPPOINTS, itpos + 1)
    c0 = jnp.take(cool.cie_cool, itpos - 1)
    c1 = jnp.take(cool.cie_cool, itpos1 - 1)
    return nucldens * eldens * (c0 + (c1 - c0) * dtpos)


def temper2pressr(temper, ndens, eldens):
    """p = (n + n_e) k_B T. tped.f90:41-53."""
    return (ndens + eldens) * const.K_B * temper


def pressr2temper(pressr, ndens, eldens):
    """T = p / ((n + n_e) k_B). tped.f90:58-70."""
    return pressr / (const.K_B * (ndens + eldens))


class ThermalResult(NamedTuple):
    final_temperature: jax.Array
    average_temperature: jax.Array


def _make_substep(cfg, cool, dt, ndens_atom, ne_av, cosmo_rate,
                  heat_rate):
    """One adaptive subcycle step (thermal.f90:98-159) as a closure over
    the per-cell fields — the SAME function serves the dense grid pass
    and the compacted straggler pass, so the per-cell substep sequences
    (and therefore every bit of the result) are identical."""
    dt = jnp.asarray(dt, jnp.result_type(ne_av))

    def substep(state):
        i, e_int, t_interm, avg_acc, cum, running = state
        cooling = coolin(cool, ndens_atom, ne_av, t_interm) + cosmo_rate
        thermal_rate = jnp.maximum(1e-50, jnp.abs(cooling - heat_rate))
        dt_thermal = cfg.relative_denergy * e_int / thermal_rate
        dt_ode = jnp.minimum(dt_thermal, dt - cum)
        e_new = e_int + dt_ode * (heat_rate - cooling)
        avg_new = avg_acc + 0.5 * t_interm * dt_ode
        t_new = pressr2temper(e_new * const.GAMMA1, ndens_atom, ne_av)
        avg_new = avg_new + 0.5 * t_new * dt_ode
        # temperature floor (thermal.f90:142-148); note the reference
        # stores the *pressure* as internal energy here (no /gamma1) -
        # reproduced.
        floor = t_new < cfg.minitemp
        e_new = jnp.where(floor, temper2pressr(cfg.minitemp, ndens_atom,
                                               ne_av), e_new)
        t_new = jnp.where(floor, cfg.minitemp, t_new)
        cum_new = cum + dt_ode
        done = jnp.logical_or(cum_new >= dt,
                              jnp.abs(cum_new - dt) < 1e-6 * dt)
        still = jnp.logical_and(running, jnp.logical_not(done))
        keep = lambda new, old: jnp.where(running, new, old)
        return (i + 1, keep(e_new, e_int), keep(t_new, t_interm),
                keep(avg_new, avg_acc), keep(cum_new, cum), still)

    return substep


def _thermal_core(cfg: RunConfig, cool: CoolingTable, dt,
                  initial_temperature, ndens_atom, ne_av, e0, cosmo_rate,
                  heat_rate, active0, max_subcycles: int):
    """Subcycle integration for one (sub)grid; returns (e_int, avg_acc)."""
    shape = initial_temperature.shape
    substep = _make_substep(cfg, cool, dt, ndens_atom, ne_av, cosmo_rate,
                            heat_rate)
    zero = jnp.zeros_like(initial_temperature)
    state0 = (jnp.asarray(0, jnp.int32), e0, initial_temperature, zero,
              zero, jnp.broadcast_to(active0, shape))

    if not cfg.thermal_compact:
        def cond(state):
            return jnp.logical_and(state[0] < max_subcycles,
                                   jnp.any(state[5]))
        final = jax.lax.while_loop(cond, substep, state0)
        return final[1], final[3]

    # --- straggler compaction (round 5, VERDICT r4 item 5) ---
    # The dense masked loop's trip count follows the WORST cell: one
    # cold high-rate cell holds the whole O(N^3) loop open (measured
    # ~0.6 s/iter at 128^3 vs ~40 ms isothermal).  Instead: run the
    # dense loop only while more than M cells are still subcycling,
    # then gather the <= M stragglers into a compact vector, finish
    # them there with the SAME substep closure (bitwise-equal), and
    # scatter back.  The dense trip count now follows the typical cell;
    # the straggler tail costs O(M) per trip.
    ncell = int(np.prod(shape))
    m_cap = min(ncell, max(1024, ncell // 64))

    def dense_cond(state):
        return jnp.logical_and(state[0] < max_subcycles,
                               jnp.sum(state[5]) > m_cap)

    fs = jax.lax.while_loop(dense_cond, substep, state0)
    i_dense, e_f, t_f, avg_f, cum_f, run_f = (
        fs[0],) + tuple(s.reshape(-1) for s in fs[1:])

    # gather stragglers; fill slots point at a dummy cell appended to
    # every vector, so duplicate fill indices are harmless
    idx = jnp.nonzero(run_f, size=m_cap, fill_value=ncell)[0]

    def flat(x):
        return jnp.broadcast_to(x, shape).reshape(-1)

    def take(v, pad):
        return jnp.concatenate([v, jnp.full((1,), pad, v.dtype)])[idx]

    csub = _make_substep(cfg, cool, dt, take(flat(ndens_atom), 1.0),
                         take(flat(ne_av), 0.0),
                         take(flat(cosmo_rate), 0.0),
                         take(flat(heat_rate), 0.0))
    cstate = (i_dense, take(e_f, 1.0), take(t_f, cfg.minitemp),
              take(avg_f, 0.0), take(cum_f, 0.0), take(run_f, False))

    def ccond(state):
        return jnp.logical_and(state[0] < max_subcycles,
                               jnp.any(state[5]))

    cfinal = jax.lax.while_loop(ccond, csub, cstate)
    _, ce, _, cavg, _, _ = cfinal

    def put(v, upd):
        return jnp.concatenate(
            [v, jnp.zeros((1,), v.dtype)]).at[idx].set(upd)[:ncell]

    return (put(e_f, ce).reshape(shape), put(avg_f, cavg).reshape(shape))


def thermal(cfg: RunConfig, cool: CoolingTable, dt,
            initial_temperature, ndens_electron, ndens_atom,
            xh1_end, xh1_av, xh1_old, heat_rate,
            cosmo_cool_coeff=0.0,
            max_subcycles: int = 10000) -> ThermalResult:
    """Subcycled explicit internal-energy integration for every cell.

    Mirrors thermal.f90:22-176: the energy step is limited to a fraction
    `relative_denergy` of the thermal timescale; the time-averaged
    temperature is accumulated trapezoidally over the subcycles.

    cosmo_cool_coeff: 2*(dz/dt)/(1+z) at the current redshift; the
    reference evaluates the adiabatic cooling rate once from the INITIAL
    internal energy (thermal.f90:74-79) - reproduced here.

    cfg.thermal_compact finishes straggler cells in a compacted vector
    (bitwise-identical, trip count follows the typical cell);
    cfg.thermal_chunk > 0 evaluates the grid in axis-0 slabs of that
    many rows (bounds live-buffer sizes — the 256^3 non-isothermal
    program crashes the axon TPU worker whole-grid, BENCH_HISTORY).
    """
    dtype = jnp.result_type(initial_temperature)
    dt = jnp.asarray(dt, dtype)

    e0 = temper2pressr(initial_temperature,
                       ndens_atom, electrondens(ndens_atom, xh1_old)) / const.GAMMA1
    cosmo_rate = cosmo_cool_coeff * e0
    ne_av = electrondens(ndens_atom, xh1_av)
    active0 = initial_temperature > cfg.minitemp  # thermal.f90:83

    rows = cfg.thermal_chunk
    full = jnp.broadcast_to
    shape = initial_temperature.shape
    if rows == 0 and len(shape) == 3:
        # auto: on TPU, slab the subcycle program above the validated
        # whole-grid envelope (the 128^3-class program is fine; the
        # whole-grid 256^3 one crashes the axon worker).  Largest
        # divisor of the x-extent keeping a slab <= ~4M cells (the
        # hardware-validated 64-row 256^3 configuration).
        ncell = int(np.prod(shape))
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu and ncell > (1 << 21):
            per = max(1, (1 << 22) // (shape[1] * shape[2]))
            divs = [d for d in range(1, shape[0] + 1)
                    if shape[0] % d == 0 and d <= per]
            rows = divs[-1] if divs else 1
            if rows >= shape[0]:
                rows = 0
    if rows < 0:
        rows = 0
    if (rows and len(shape) == 3 and shape[0] > rows
            and shape[0] % rows == 0):
        k = shape[0] // rows
        csh = (k, rows) + shape[1:]

        def chunk(args):
            t0, na, ne, e, cr, hr, a0 = args
            return _thermal_core(cfg, cool, dt, t0, na, ne, e, cr, hr,
                                 a0, max_subcycles)

        e_int, avg_acc = jax.lax.map(chunk, (
            initial_temperature.reshape(csh),
            full(ndens_atom, shape).reshape(csh),
            full(ne_av, shape).reshape(csh),
            full(e0, shape).reshape(csh),
            full(cosmo_rate, shape).reshape(csh),
            full(heat_rate, shape).reshape(csh),
            full(active0, shape).reshape(csh)))
        e_int = e_int.reshape(shape)
        avg_acc = avg_acc.reshape(shape)
    else:
        e_int, avg_acc = _thermal_core(cfg, cool, dt, initial_temperature,
                                       ndens_atom, ne_av, e0, cosmo_rate,
                                       heat_rate, active0, max_subcycles)

    avg_t = jnp.where(dt > 0.0, avg_acc / dt, initial_temperature)
    final_t = pressr2temper(e_int * const.GAMMA1, ndens_atom,
                            electrondens(ndens_atom, xh1_end))
    # inactive (below minitemp) cells are untouched (thermal.f90:83,174)
    avg_t = jnp.where(active0, avg_t, initial_temperature)
    final_t = jnp.where(active0, final_t, initial_temperature)
    return ThermalResult(final_t, avg_t)

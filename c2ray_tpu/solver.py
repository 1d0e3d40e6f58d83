"""evolve3D: the global convergence iteration over sources + chemistry.

Re-implementation of /root/reference/evolve.F90:83-281.  One call evolves
the whole grid over a timestep dt by iterating
  [zero rates -> sweep all sources -> (psum) -> global chemistry pass]
until the grid converges.  The host drives the (typically 2-10 step)
convergence loop and reads back only a few scalars per iteration; all
heavy work is in two jitted device programs (the source sweep scan and
the vectorized chemistry pass).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .config import RunConfig
from .ops.chemistry import global_chemistry
from .ops.photonstats import PhotonStatistics, grid_counts
from .ops.sweep import SweepScalars, raytrace_all_sources
from .ops.tables import RadTables
from .ops.thermal import CoolingTable
from .state import GridState


class EvolveInfo(NamedTuple):
    niter: int
    conv_flag: int
    converged: bool
    mean_xh1: float
    photon_loss: float       # S_star units
    lls_loss: float          # S_star units
    per_source_loss: np.ndarray
    photon_stats: dict
    phih: Optional[jax.Array] = None      # last accumulated rate grid [1/s]
    phiheat: Optional[jax.Array] = None   # last heating grid [erg/s/cm^3]


class Evolve3D:
    """Compiled evolve3D solver for a fixed config + tables.

    `raytracer` may be overridden (parallel/source_shard.py injects a
    shard_map-wrapped version); it must have the signature of
    ops.sweep.raytrace_all_sources.
    """

    def __init__(self, cfg: RunConfig, tables: RadTables,
                 cool: Optional[CoolingTable] = None,
                 raytracer: Optional[Callable] = None,
                 chemistry: Optional[Callable] = None):
        self.cfg = cfg
        self.tables = tables
        self.cool = cool
        rt = raytracer if raytracer is not None else raytrace_all_sources

        @jax.jit
        def _sweep(ndens, xh_av1, srcpos, nflux, sc, lls_grid, nflux_xray):
            return rt(cfg, tables, ndens, xh_av1, srcpos, nflux, sc,
                      lls_grid=lls_grid, nflux_xray=nflux_xray)

        from functools import partial as _partial

        @_partial(jax.jit, static_argnames=("max_shell",))
        def _sweep_r(ndens, xh_av1, srcpos, nflux, sc, lls_grid, nflux_xray,
                     max_shell):
            return rt(cfg, tables, ndens, xh_av1, srcpos, nflux, sc,
                      lls_grid=lls_grid, max_shell=max_shell,
                      nflux_xray=nflux_xray)

        @jax.jit
        def _chem(dt, ndens, xh1_old, xh1_int, xh1_av, phih, phiheat,
                  t_cur, t_av, clumping, cosmo_cool_coeff, photon_loss_rate):
            if chemistry is not None:
                # injected distributed variant (parallel/domain.py)
                return chemistry(cfg, dt, ndens, xh1_old, xh1_int, xh1_av,
                                 phih, phiheat, t_cur, t_av, clumping,
                                 cool, cosmo_cool_coeff,
                                 photon_loss_rate=photon_loss_rate)
            return global_chemistry(cfg, dt, ndens, xh1_old, xh1_int, xh1_av,
                                    phih, phiheat, t_cur, t_av, clumping,
                                    cool, cosmo_cool_coeff,
                                    photon_loss_rate=photon_loss_rate)

        def _dense_x1(x):
            if cfg.compressed_xfrac:
                from .state import xh1_of
                return xh1_of(x)
            return x

        @jax.jit
        def _counts(ndens, xh1, t_av, clumping):
            # compressed inputs are decoded natively inside grid_counts so
            # the photon audit keeps the stored neutral tail (the
            # reference's compressed photonstatistics variant)
            return grid_counts(cfg, ndens, xh1, t_av, clumping,
                               compressed=cfg.compressed_xfrac)

        @jax.jit
        def _lossrate(ndens, xh_av1, sc, loss_per_cell):
            # redistribute boundary losses as a per-cell per-atom rate:
            # each cell absorbs its share through its own column (the
            # reference's dormant add_photon_losses block,
            # evolve_point.F90:497-506, with photon_loss =
            # photon_loss_all/N^3 from evolve.F90:525)
            from .ops.sweep import neutral_density
            from .ops.tables import photoion_rates
            ndhi = neutral_density(cfg, ndens, xh_av1)
            coldens_cell = ndhi * sc.dr
            phi = photoion_rates(cfg, tables,
                                 jnp.zeros_like(coldens_cell), coldens_cell,
                                 jnp.ones_like(coldens_cell), loss_per_cell)
            return phi.photo_cell * sc.rate_scale / ndhi

        @jax.jit
        def _sum(x):
            # total ionized fraction (decodes compressed storage)
            return jnp.sum(_dense_x1(x))

        self._sweep = _sweep
        self._sweep_r = _sweep_r
        self._chem = _chem
        self._counts = _counts
        self._sum = _sum
        self._lossrate = _lossrate

    # ------------------------------------------------------------------
    def _radius_ladder(self):
        n = self.cfg.mesh[0]
        d_max = n // 2
        r = max(2, self.cfg.adaptive_min_shell)
        ladder = []
        while r < d_max:
            ladder.append(r)
            r *= 2
        ladder.append(d_max)
        return ladder

    def _initial_radii(self, nflux_np, ndens_mean, dr, dt):
        """Strömgren-style initial radius estimate per source, snapped up
        to the ladder (replaces the first subbox growth passes).

        In the many-source regime the isolated-Strömgren estimate
        over-reaches: bubbles merge, so each source's effective reach is
        bounded by the inter-source spacing.  The initial assignment is
        capped at ~the mean half-separation; genuinely leaky sources are
        promoted by the escaping-photon test within the convergence loop
        (exactly the reference's subbox growth criterion,
        evolve_source.F90:128-136), so the cap costs correctness nothing
        while keeping dense catalogs on cheap windowed sweeps."""
        cfg = self.cfg
        n = cfg.mesh[0]
        ladder = self._radius_ladder()
        s_phys = np.maximum(nflux_np, 1e-300) * cfg.sed.s_star
        r_est = (3.0 * s_phys * dt / (4.0 * np.pi * ndens_mean)) ** (1.0 / 3.0)
        cells = 1.3 * r_est / dr
        num_src = max(1, len(nflux_np))
        spacing_cap = 0.75 * n / num_src ** (1.0 / 3.0)
        capped = np.minimum(cells, max(spacing_cap,
                                       float(cfg.adaptive_min_shell)))
        # top-decile-flux sources are exempt from the spacing cap: in a
        # clustered catalog the cap assumes uniform spread and would start
        # a bright clumped source under-radiused, paying promotion
        # iterations to recover (evolve_source.F90:128-136 grows per
        # source, never capping by neighbor spacing)
        if num_src > 1:
            exempt = nflux_np >= np.quantile(nflux_np, 0.9)
            cells = np.where(exempt, cells, capped)
        else:
            cells = capped
        assign = np.searchsorted(np.asarray(ladder), cells)
        return np.minimum(assign, len(ladder) - 1).astype(np.int64)

    def _adaptive_sweep(self, ndens, xh_av, srcpos_np, nflux_np, srcpos,
                        nflux, sc, lls_grid, assign, nfx_np=None):
        """Sweep sources grouped by their assigned radius; promote leaky
        sources for the next convergence iteration (the TPU analogue of
        the reference's subbox growth loop, evolve_source.F90:128-212).

        Buckets below the full-grid radius run through the windowed sweep
        (ops.sweep.raytrace_windowed) so their cost scales with sum(r^3);
        all host syncs are deferred to after the last bucket dispatch.
        """
        cfg = self.cfg
        dtype = cfg.jnp_dtype
        n = cfg.mesh[0]
        ladder = self._radius_ladder()
        s = len(nflux_np)
        phih = jnp.zeros((n, n, n), dtype)
        heat = (jnp.zeros((n, n, n), dtype) if not cfg.isothermal
                else jnp.zeros((), dtype))
        loss_parts = []
        lls_parts = []
        pending = []   # (idx, device per-source losses) — synced after loop
        per_src = np.zeros(s)
        for b, radius in enumerate(ladder):
            idx = np.where(assign == b)[0]
            if len(idx) == 0:
                continue
            cap = 1 << (len(idx) - 1).bit_length()   # pad to pow2 capacity
            pos_p = np.zeros((cap, 3), np.int32)
            flux_p = np.zeros(cap)
            pos_p[:len(idx)] = srcpos_np[idx]
            flux_p[:len(idx)] = nflux_np[idx]
            if nfx_np is not None:
                fx_p = np.zeros(cap)
                fx_p[:len(idx)] = nfx_np[idx]
                fx_p = jnp.asarray(fx_p, dtype)
            else:
                fx_p = None
            ph, he, lo, ll, ps = self._sweep_r(
                ndens, xh_av, jnp.asarray(pos_p),
                jnp.asarray(flux_p, dtype), sc, lls_grid, fx_p,
                max_shell=radius)
            phih = phih + ph
            if not cfg.isothermal:
                heat = heat + he
            loss_parts.append(lo)
            lls_parts.append(ll)
            pending.append((idx, ps))
        # one sync point after all buckets are dispatched
        loss = float(sum(float(x) for x in loss_parts)) if loss_parts else 0.0
        lls_loss = (float(sum(float(x) for x in lls_parts))
                    if lls_parts else 0.0)
        for idx, ps in pending:
            per_src[idx] = np.asarray(ps)[:len(idx)]
        # promotion: escaping photons above loss_fraction of the source's
        # output (c2ray_parameters.f90:67)
        leaked = per_src > cfg.loss_fraction * np.maximum(nflux_np, 1e-300)
        new_assign = np.where(leaked & (assign < len(ladder) - 1),
                              assign + 1, assign)
        return phih, heat, loss, lls_loss, per_src, new_assign

    # ------------------------------------------------------------------
    def evolve3d(self, state: GridState, ndens_proper: jax.Array,
                 dr_proper: float, srcpos, nflux, dt: float,
                 clumping=1.0, lls_coldens: float = 0.0,
                 rmax_cells: float = 0.0, lls_grid=None,
                 cosmo_cool_coeff: float = 0.0,
                 stats: Optional[PhotonStatistics] = None,
                 dumper=None, iter_restart: Optional[dict] = None,
                 nflux_xray=None, verbose: bool = False):
        """One global timestep (evolve3D, evolve.F90:83-281).

        dumper: optional utils.checkpoint.IterDumper - writes the
        double-buffered 15-minute iteration dumps (evolve.F90:253-266).
        iter_restart: a dict from IterDumper.load to resume mid-iteration
        (start_from_dump, evolve.F90:328-426).
        """
        cfg = self.cfg
        n_cells = cfg.n_cells
        dtype = cfg.jnp_dtype
        vol = float(dr_proper) ** 3

        srcpos_np = np.asarray(srcpos, np.int64)
        nflux_np = np.asarray(nflux, np.float64)
        srcpos = jnp.asarray(srcpos, jnp.int32)
        nflux = jnp.asarray(nflux, dtype)
        num_src = int(srcpos.shape[0])
        use_xray = cfg.sed.use_xray_sed and nflux_xray is not None
        nfx_np = np.asarray(nflux_xray, np.float64) if use_xray else None
        nfx = jnp.asarray(nflux_xray, dtype) if use_xray else None
        radius_assign = None             # adaptive subbox state (per step)
        # auto: adaptive subbox radii for the many-source production regime
        # (evolve_source.F90:128-136; on request VERDICT r1 item 1)
        use_adaptive = (cfg.adaptive_sweep if cfg.adaptive_sweep is not None
                        else num_src >= cfg.adaptive_auto_min_sources)

        sc = SweepScalars(
            dr=jnp.asarray(dr_proper, dtype),
            rate_scale=jnp.asarray(cfg.sed.s_star / vol, dtype),
            lls_coldens=jnp.asarray(lls_coldens, dtype),
            rmax2_cells=jnp.asarray(rmax_cells * rmax_cells, dtype),
        )
        clump = (jnp.asarray(clumping, dtype)
                 if not isinstance(clumping, jax.Array) else clumping)

        # photon statistics: initial state (evolve.F90:136)
        if stats is not None:
            c0 = self._counts(ndens_proper, state.xh1, state.temper_av, clump)
            stats.state_before(c0, vol)

        # initialize iterates to the step-initial state (evolve.F90:140-153),
        # or resume from an iteration dump (:154-158)
        xh1 = state.xh1
        t_cur, t_av, t_int = (state.temper_current, state.temper_av,
                              state.temper_intermed)
        if iter_restart is not None:
            xh_av = jnp.asarray(iter_restart["xh_av"], dtype)
            xh_int = jnp.asarray(iter_restart["xh_intermed"], dtype)
            niter = int(iter_restart["niter"])
            # non-isothermal dumps also carry the mid-convergence
            # temperature iterates (start_from_dump restores the
            # temperature grid too, evolve.F90:328-426)
            if not cfg.isothermal and "temper" in iter_restart:
                t_int = jnp.asarray(iter_restart["temper"], dtype)
            if not cfg.isothermal and "temper_av" in iter_restart:
                t_av = jnp.asarray(iter_restart["temper_av"], dtype)
        else:
            xh_av = xh1
            xh_int = xh1
            niter = 0
        conv_flag = n_cells
        prev_sum1 = 2.0 * n_cells
        prev_sum0 = 2.0 * n_cells

        def _loss_rate(loss):
            # redistributed boundary losses (add_photon_losses,
            # evolve.F90:519-525 + evolve_point.F90:497-506)
            if cfg.add_photon_losses and loss > 0.0:
                return self._lossrate(ndens_proper, xh_av, sc,
                                      jnp.asarray(loss / n_cells, dtype))
            return jnp.zeros((), dtype)

        # conv_criterion (evolve.F90:162-163)
        conv_criterion = min(int(cfg.convergence_fraction * n_cells),
                             (num_src - 1) // 3)

        photon_loss = 0.0
        lls_loss = 0.0
        per_src_loss = np.zeros(num_src)
        converged = False
        last_report = {}
        phih = None
        phiheat = None

        # Pending global pass on resume: the dump is written after the
        # source sweep but *before* the chemistry pass (evolve.F90:253-269),
        # so start_from_dump restores the rate grids and photon loss and
        # runs the restored chemistry directly, with no redundant re-sweep
        # (evolve.F90:154-158 calls global_pass right after the restore).
        if iter_restart is not None and "phih" in iter_restart:
            phih = jnp.asarray(iter_restart["phih"], dtype)
            if not cfg.isothermal and "phiheat" in iter_restart:
                phiheat = jnp.asarray(iter_restart["phiheat"], dtype)
            photon_loss = float(iter_restart["photon_loss"])
            chem = self._chem(jnp.asarray(dt, dtype), ndens_proper, xh1,
                              xh_int, xh_av, phih,
                              phiheat if not cfg.isothermal else None,
                              t_cur, t_av, clump,
                              jnp.asarray(cosmo_cool_coeff, dtype),
                              _loss_rate(photon_loss))
            xh_int, xh_av = chem.xh1_intermed, chem.xh1_av
            if not cfg.isothermal:
                t_int, t_av = chem.temper_intermed, chem.temper_av
            conv_flag = int(chem.conv_flag)
            if stats is not None:
                ca = self._counts(ndens_proper, xh_int, t_av, clump)
                cr = self._counts(ndens_proper, xh_av, t_av, clump)
                stats.calculate(ca, cr, vol, dt)
                last_report = stats.report(dt, photon_loss, lls_loss,
                                           float(np.sum(np.asarray(nflux))))

        while True:
            # convergence tests (evolve.F90:179-233)
            sum1 = float(self._sum(xh_int))
            sum0 = float(n_cells) - sum1
            rel1 = abs(sum1 - prev_sum1) / sum1 if sum1 > 0.0 else 1.0
            rel0 = abs(sum0 - prev_sum0) / sum0 if sum0 > 0.0 else 1.0
            if verbose:
                print(f"  iter {niter}: conv_flag={conv_flag} "
                      f"rel_change=({rel1:.2e},{rel0:.2e}) mean_x={sum1/n_cells:.4e}")
            if conv_flag < conv_criterion or (
                    rel1 < cfg.convergence_fraction
                    and rel0 < cfg.convergence_fraction):
                xh1 = xh_int
                # set_final_temperature_point (temperature_module.F90:173-183)
                if not cfg.isothermal:
                    t_cur = t_int
                converged = True
                break
            if niter > cfg.max_global_iterations:
                # The reference abandons the step here, leaving xh at its
                # step-initial value (evolve.F90:227-233).  We instead commit
                # the best available iterate (flagged converged=False) -
                # strictly safer in the pathological few-source regime.
                xh1 = xh_int
                if not cfg.isothermal:
                    t_cur = t_int
                break

            prev_sum1, prev_sum0 = sum1, sum0
            niter += 1

            # pass over all sources (rates implicitly zeroed by functional
            # accumulation; evolve.F90:243-246)
            if use_adaptive:
                if radius_assign is None:
                    nd_mean = float(jnp.mean(ndens_proper))
                    radius_assign = self._initial_radii(
                        nflux_np, nd_mean, float(dr_proper), dt)
                (phih, phiheat, photon_loss, lls_loss, per_src_loss,
                 radius_assign) = self._adaptive_sweep(
                    ndens_proper, xh_av, srcpos_np, nflux_np, srcpos, nflux,
                    sc, lls_grid, radius_assign, nfx_np=nfx_np)
            else:
                phih, phiheat, ploss, llsl, psrc = self._sweep(
                    ndens_proper, xh_av, srcpos, nflux, sc, lls_grid, nfx)
                photon_loss = float(ploss)
                lls_loss = float(llsl)
                per_src_loss = np.asarray(psrc)

            # wall-clock-driven double-buffered dump: written after the
            # sweep, BEFORE the chemistry pass (evolve.F90:253-266), so a
            # resume re-enters at the pending global pass with these rate
            # grids and pre-chemistry iterates
            if dumper is not None:
                dumper.maybe_dump(niter, photon_loss, phih, xh_av, xh_int,
                                  phiheat if not cfg.isothermal else None,
                                  t_int if not cfg.isothermal else None,
                                  t_av if not cfg.isothermal else None)

            # global chemistry pass (evolve.F90:269, global_pass :499-573)
            chem = self._chem(jnp.asarray(dt, dtype), ndens_proper, xh1,
                              xh_int, xh_av, phih,
                              phiheat if not cfg.isothermal else None,
                              t_cur, t_av, clump,
                              jnp.asarray(cosmo_cool_coeff, dtype),
                              _loss_rate(photon_loss))
            xh_int, xh_av = chem.xh1_intermed, chem.xh1_av
            if not cfg.isothermal:
                t_int, t_av = chem.temper_intermed, chem.temper_av
            conv_flag = int(chem.conv_flag)

            # per-iteration conservation report (global_pass :570-571)
            if stats is not None:
                ca = self._counts(ndens_proper, xh_int, t_av, clump)
                cr = self._counts(ndens_proper, xh_av, t_av, clump)
                stats.calculate(ca, cr, vol, dt)
                last_report = stats.report(dt, photon_loss, lls_loss,
                                           float(np.sum(np.asarray(nflux))))

        # end-of-step statistics (evolve.F90:277-279)
        if stats is not None:
            ca = self._counts(ndens_proper, xh1, t_av, clump)
            cr = self._counts(ndens_proper, xh_av, t_av, clump)
            stats.calculate(ca, cr, vol, dt)
            total_flux = float(np.sum(np.asarray(nflux)))
            last_report = stats.report(dt, photon_loss, lls_loss, total_flux)
            stats.update_grandtotal(dt, total_flux)

        new_state = GridState(xh1=xh1, temper_current=t_cur,
                              temper_av=t_av, temper_intermed=t_int)
        info = EvolveInfo(
            niter=niter, conv_flag=conv_flag, converged=converged,
            mean_xh1=float(self._sum(xh1)) / n_cells,
            photon_loss=photon_loss, lls_loss=lls_loss,
            per_source_loss=per_src_loss, photon_stats=last_report,
            phih=phih, phiheat=phiheat if not cfg.isothermal else None)
        return new_state, info

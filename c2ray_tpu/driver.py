"""Main driver: redshift-slice loop, timestep loop, outputs, restarts.

Re-implementation of the reference main program (/root/reference/C2Ray.F90):
the startup sequence (:108-198), restart handling (:200-253), the
redshift-slice loop (:267-427) with its inner timestep loop (:352-407),
output cadence and the photon-conservation abort (:395-416).

Also provides a reader for the reference's ordered input-file protocol
(stdin answers, C2Ray.F90:115-127 + material.F90:76-112 +
sourceprops.F90:694-755 + time_module.F90:44-54) so the bundled
inputs/input_example* files drive this framework unchanged.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax.numpy as jnp

from . import constants as const
from .config import RunConfig
from .cosmology import CosmoClock
from .models.clumping import ClumpingModel, load_clumping_model  # noqa: F401 (loader re-exported for drivers)
from .models.lls import set_lls
from .models.nbody import NbodyAdapter, test_adapter
from .models.sources import SourceModel, sort_sources_by_flux
from .ops.photonstats import PhotonStatistics
from .ops.tables import build_rad_tables
from .ops.thermal import setup_cool
from .solver import Evolve3D
from .state import GridState, MaterialState, initial_state, uniform_material
from .utils.checkpoint import load_slice_restart
from .utils.clocks import Clocks
from .utils.output import OutputWriter


@dataclass
class DriverConfig:
    """Runtime answers of the reference's stdin protocol."""

    restart: int = 0            # 0 none, 1 slice, 2 mid-slice
    nz0: int = 0                # starting slice (0-based; stdin is 1-based)
    uv_recipe: int = 7          # UV luminosity model (0-7)
    number_timesteps: int = 10  # per slice (time_module.F90:44-48)
    number_outputs: int = 1     # per slice (:51-53)
    redshift_file: str = ""     # cubep3m runs
    uv_file: str = ""           # fixed N_gamma models
    results_dir: str = "./results/"
    dump_dir: str = "./"


def read_input_file(path: str, nbody_type: str = "test") -> DriverConfig:
    """Parse the ordered input protocol (see inputs/input_example_test).

    Lines are answers in a fixed sequence; anything after whitespace is a
    comment.  Sequence (test case): restart y/n, mid-slice y/n, start
    slice, UV recipe, [uv file], timesteps/slice, outputs/slice.  The
    cubep3m case inserts the redshift file after the start slice.
    """
    answers = []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if tok:
                answers.append(tok[0])
    it = iter(answers)
    dc = DriverConfig()
    restart_yn = next(it).lower().startswith("y")
    mid_yn = next(it).lower().startswith("y")
    dc.restart = (2 if mid_yn else 1) if restart_yn else 0
    dc.nz0 = int(next(it)) - 1
    if nbody_type in ("cubep3m", "LG"):
        dc.redshift_file = next(it)
    dc.uv_recipe = int(next(it))
    if dc.uv_recipe in (1, 2):
        dc.uv_file = next(it)
    dc.number_timesteps = int(next(it))
    dc.number_outputs = int(next(it))
    return dc


class C2RayDriver:
    """The full simulation pipeline (program C2Ray equivalent)."""

    def __init__(self, cfg: RunConfig, adapter: Optional[NbodyAdapter] = None,
                 driver_cfg: Optional[DriverConfig] = None,
                 material: Optional[MaterialState] = None,
                 raytracer=None, verbose: bool = True):
        self.cfg = cfg
        self.dc = driver_cfg or DriverConfig()
        self.adapter = adapter or test_adapter(cfg)
        self.verbose = verbose

        # init sequence (C2Ray.F90:108-198): grid, radiation tables,
        # cooling, material, sources, time, cosmology
        self.clocks = Clocks(os.path.join(self.dc.results_dir, "Timings.log"))
        self.tables = build_rad_tables(cfg)
        self.clocks.stamp("Time after radiation tables")
        self.cool = None if cfg.isothermal else setup_cool(cfg)
        self.solver = Evolve3D(cfg, self.tables, cool=self.cool,
                               raytracer=raytracer)
        self.stats = PhotonStatistics(cfg)
        self.output = OutputWriter(cfg, results_dir=self.dc.results_dir)
        self.output.setup()
        self.source_model = SourceModel.from_recipe(
            cfg, self.dc.uv_recipe, m_grid=self.adapter.m_grid,
            n_box=self.adapter.n_box)
        self.clumping_model = ClumpingModel(cfg=cfg)
        self.material = material
        self.clock = CosmoClock.init(cfg.cosmo,
                                     float(self.adapter.zred_array[0]))
        self.history = []

    def _log(self, *msg):
        if self.verbose:
            print(*msg, flush=True)

    # ------------------------------------------------------------------
    def run(self, max_slices: Optional[int] = None) -> GridState:
        cfg = self.cfg
        dc = self.dc
        ad = self.adapter
        zreds = ad.zred_array

        # material initialization (material.F90:44-134)
        if self.material is None:
            if ad.nbody_type == "test":
                self.material = uniform_material(cfg)
            else:
                self.material = MaterialState(
                    ndens_comoving=jnp.zeros(cfg.mesh, cfg.jnp_dtype))

        # restart handling (C2Ray.F90:200-253)
        nz0 = dc.nz0
        if dc.restart in (1, 2):
            state = load_slice_restart(cfg, dc.results_dir, float(zreds[nz0]))
        else:
            state = initial_state(cfg)

        sim_time = self.clock.zred2time(float(zreds[nz0]))
        n_slices = len(zreds) - 1
        if max_slices is not None:
            n_slices = min(n_slices, nz0 + max_slices)

        for nz in range(nz0, n_slices):
            zred = float(zreds[nz])
            zred_next = float(zreds[nz + 1])
            self.clocks.stamp(f"Time before slice z={zred:.3f}")

            # set_timesteps (time_module.F90:72-98)
            end_time = self.clock.zred2time(zred_next)
            dt = (end_time - self.clock.zred2time(zred)) / dc.number_timesteps
            output_dt = (end_time - self.clock.zred2time(zred)) / dc.number_outputs
            next_output_time = sim_time + output_dt

            # per-slice sources (C2Ray.F90:303, sourceprops.F90:103-209)
            rows = ad.read_sources(zred, nz)
            cat = self.source_model.load(rows, np.asarray(state.xh1), nz,
                                         end_time - sim_time, dt_slice=dt)
            cat = sort_sources_by_flux(cat)
            self._log(f"slice z={zred:.3f}: {cat.num_src} sources, "
                      f"total flux {cat.total_flux * cfg.sed.s_star:.3e} /s")

            # per-slice density (C2Ray.F90:308, density_module.F90:48-125)
            if ad.nbody_type not in ("test",):
                nd_prop = ad.read_density(zred, nz)  # proper at zred
                comoving = (nd_prop / (1.0 + zred) ** 3
                            if cfg.cosmological else nd_prop)
                self.material = MaterialState(
                    ndens_comoving=jnp.asarray(comoving),
                    clumping_grid=self.material.clumping_grid,
                    lls_grid=self.material.lls_grid)

            # inner timestep loop (C2Ray.F90:352-407)
            while sim_time < end_time - 1e-6 * abs(dt):
                actual_dt = min(next_output_time - sim_time, dt)
                if cfg.cosmological:
                    self.clock.redshift_evol(sim_time + 0.5 * actual_dt)
                    z_now = self.clock.zred
                else:
                    z_now = zred if cfg.cosmological else 0.0
                zp1 = (1.0 + z_now) if cfg.cosmological else 1.0
                nd_proper = self.material.ndens_comoving * cfg.np_dtype(zp1**3)
                dr_proper = cfg.dr_comoving / zp1

                # per-step clumping + LLS (C2Ray.F90:375-376)
                avg_dens = float(np.mean(np.asarray(
                    self.material.ndens_comoving))) * zp1**3
                clump = self.clumping_model.evaluate(
                    z_now, np.asarray(nd_proper), avg_dens)
                lls = set_lls(cfg, z_now, dr_proper,
                              self.material.lls_grid)
                cosmo_cool_coeff = 0.0
                if cfg.cosmological and not cfg.isothermal:
                    p = cfg.cosmo
                    dzdt = p.H0 * (1 + z_now) * np.sqrt(
                        p.omega0 * (1 + z_now) ** 3 + 1 - p.omega0)
                    cosmo_cool_coeff = 2.0 / (1 + z_now) * dzdt

                state, info = self.solver.evolve3d(
                    state, nd_proper, dr_proper, cat.srcpos,
                    cat.normflux_stellar, actual_dt,
                    clumping=clump, lls_coldens=lls.coldensh_lls,
                    rmax_cells=lls.r_max_cells,
                    lls_grid=(jnp.asarray(lls.grid)
                              if lls.grid is not None else None),
                    cosmo_cool_coeff=cosmo_cool_coeff, stats=self.stats)
                sim_time += actual_dt
                self.history.append(dict(z=z_now, t=sim_time, **info._asdict()))
                self._log(f"  t={sim_time / (1e6 * const.YEAR):8.2f} Myr "
                          f"niter={info.niter} mean_x={info.mean_xh1:.5f} "
                          f"photcons={info.photon_stats.get('photon_cons', 0):.4f}")

                # output cadence (C2Ray.F90:389-403)
                if abs(sim_time - next_output_time) <= 1e-6 * abs(actual_dt):
                    next_output_time += output_dt
                    flag = self._write_outputs(zred_next if abs(
                        sim_time - end_time) < 1e-6 * abs(dt) else
                        self.clock.time2zred(sim_time),
                        sim_time, actual_dt, state, nd_proper,
                        dr_proper, info, cat)
                    if flag and cfg.stop_on_photon_violation:
                        self._log("PhotonConservation violated, stopping")
                        self.output.close_down()
                        return state
                self.clocks.stamp("Time after timestep")

        self.output.close_down()
        self.clocks.report()
        return state

    # ------------------------------------------------------------------
    def _write_outputs(self, zred, sim_time, dt, state, nd_proper,
                       dr_proper, info, cat) -> int:
        cfg = self.cfg
        out = self.output
        vol = float(dr_proper) ** 3
        if out.streams[0]:
            x_coords = (np.arange(cfg.mesh[0]) + 0.5) * float(dr_proper)
            src0 = cat.srcpos[0] if cat.num_src else (0, 0, 0)
            out.write_stream1(zred, x_coords, np.asarray(state.xh1),
                              state.temper_current, np.asarray(nd_proper),
                              src0)
        if out.streams[1]:
            out.write_stream2(zred, state.xh1, state.temper_current)
        if out.streams[2] and info.phih is not None:
            out.write_stream3(zred, info.phih, info.phiheat)
        if out.streams[3]:
            out.write_stream4(zred, np.asarray(state.xh1))
        if out.streams[4]:
            out.write_stream5(zred, np.asarray(nd_proper))
        return out.write_photonstatistics(
            zred, sim_time, dt, self.stats, info.photon_loss, info.lls_loss,
            cat.total_flux, nd_proper, state.xh1, vol)

"""Checkpoint / resume: the reference's three restart mechanisms.

  1. Slice restart: resume at a redshift-slice boundary from the code's
     own xfrac3D_<z>.bin (+Temper3D) outputs (C2Ray.F90:234-237,
     ionfractions_module.F90:56-120, temperature_module.F90:75-130).
  2. Mid-slice restart: same at an intermediate output redshift
     (C2Ray.F90:238-253).
  3. Iteration restart: resume inside evolve3D's convergence loop from
     double-buffered dumps written every 15 wall-clock minutes
     (evolve.F90:253-266,285-426; iterdump{1,2}.bin).

Slice/mid-slice restarts read the byte-exact sm3d outputs (so a run can
also resume from reference-produced cubes); iteration dumps use npz with
the same double-buffer discipline (a crash mid-write leaves one valid
dump).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..config import RunConfig
from ..models.nbody import fortran_f6_3
from ..state import GridState
from .io_fortran import read_sm3d

# dump cadence (evolve.F90:259-266, clocks.f90:35)
DUMP_INTERVAL_S = 15 * 60


def load_slice_restart(cfg: RunConfig, results_dir: str,
                       zred: float) -> GridState:
    """xfrac_restart_init + temperature_restart_init equivalents."""
    import jax.numpy as jnp

    zs = fortran_f6_3(zred)
    xh1 = read_sm3d(os.path.join(results_dir, f"xfrac3D_{zs}.bin"),
                    np.float64, expect_mesh=cfg.mesh)
    if cfg.compressed_xfrac:
        # encode in numpy float64 BEFORE any cast so the x_HI tail
        # survives (jnp.asarray would round the f64 cube to f32 first);
        # saturated cells store +1.0, not -0.0 (see state.compress_xh)
        xh1 = np.where(xh1 <= 0.5, xh1,
                       np.where(xh1 < 1.0, -(1.0 - xh1), 1.0))
    xh1 = jnp.asarray(xh1.astype(cfg.np_dtype))
    if cfg.isothermal:
        return GridState(xh1=xh1)
    t = read_sm3d(os.path.join(results_dir, f"Temper3D_{zs}.bin"),
                  np.float32, expect_mesh=cfg.mesh)
    t = jnp.asarray(t.astype(cfg.np_dtype))
    return GridState(xh1=xh1, temper_current=t, temper_av=t, temper_intermed=t)


@dataclass
class IterDumper:
    """Double-buffered iteration-state dumps (write_iteration_dump /
    start_from_dump, evolve.F90:285-426)."""

    dump_dir: str = "./"
    interval_s: float = DUMP_INTERVAL_S
    # enabled=False on non-I/O processes of a multi-host run: the
    # reference writes the dump on rank 0 only (evolve.F90:258-265
    # inside `if (rank == 0)`)
    enabled: bool = True
    # collective=True for a CROSS-PROCESS sharded grid (halo layout on
    # multiple processes): no single process holds the dump data, so the
    # gathers are collectives every process must join - rank 0's
    # wall-clock decision is broadcast and all ranks call dump(), with
    # the file write still gated on the I/O rank
    collective: bool = False
    _ndump: int = 0
    _last_wall: float = field(default_factory=time.time)

    def maybe_dump(self, niter: int, photon_loss: float, phih, xh_av,
                   xh_intermed, phiheat=None, temper=None,
                   temper_av=None) -> Optional[str]:
        """Dump if >15 wall-clock minutes since the last one."""
        if self.collective:
            from ..parallel import multihost as mh
            now = time.time()
            should = mh.broadcast_obj(
                now - self._last_wall >= self.interval_s
                if mh.is_io_rank() else None)
            if not should:
                return None
            self._last_wall = now
            return self.dump(niter, photon_loss, phih, xh_av, xh_intermed,
                             phiheat, temper, temper_av)
        if not self.enabled:
            return None
        now = time.time()
        if now - self._last_wall < self.interval_s:
            return None
        self._last_wall = now
        return self.dump(niter, photon_loss, phih, xh_av, xh_intermed,
                         phiheat, temper, temper_av)

    def dump(self, niter, photon_loss, phih, xh_av, xh_intermed,
             phiheat=None, temper=None, temper_av=None) -> str:
        from ..parallel.layout import replicate_to_host
        self._ndump += 1
        name = "iterdump2.npz" if self._ndump % 2 == 0 else "iterdump1.npz"
        path = os.path.join(self.dump_dir, name)
        data = dict(niter=niter, photon_loss=photon_loss,
                    phih=replicate_to_host(phih),
                    xh_av=replicate_to_host(xh_av),
                    xh_intermed=replicate_to_host(xh_intermed))
        if phiheat is not None:
            data["phiheat"] = replicate_to_host(phiheat)
        if temper is not None:
            data["temper"] = replicate_to_host(temper)
        if temper_av is not None:
            data["temper_av"] = replicate_to_host(temper_av)
        if self.collective:
            from ..parallel import multihost as mh
            if not mh.is_io_rank():
                return None       # joined the gathers; rank 0 writes
        tmp = path + ".tmp.npz"   # .npz suffix keeps np.savez from renaming
        np.savez(tmp, **data)
        os.replace(tmp, path)
        return path

    @staticmethod
    def load(dump_dir: str, which: int = 1) -> dict:
        """start_from_dump: which selects iterdump1/2 (restart flag 1/2,
        evolve.F90:354-362)."""
        path = os.path.join(dump_dir, f"iterdump{which}.npz")
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

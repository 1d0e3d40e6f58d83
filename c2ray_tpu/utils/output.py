"""Output streams and photon-count metric files.

Byte/column-compatible re-implementation of /root/reference/output.F90:
the 5 togglable streams (default mask 0,1,1,0,0, output.F90:47) plus the
PhotonCounts.out / PhotonCounts2.out conservation audit streams - the
parity-checkable observables of the reference (SURVEY.md 5.5).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..config import RunConfig
from ..models.nbody import fortran_f6_3
from ..ops.photonstats import PhotonStatistics
from .io_fortran import write_unformatted_records


@dataclass
class OutputWriter:
    """Per-run output manager (module output_module equivalent)."""

    cfg: RunConfig
    results_dir: str = "./results/"
    streams: tuple = (0, 1, 1, 0, 0)      # output.F90:47
    # io_enabled=False on non-I/O processes of a multi-host run: every
    # write becomes a no-op (the reference gates each on `rank == 0`,
    # output.F90:179), but derived numbers (the photon-conservation
    # violation flag) are still computed so all processes agree on the
    # abort decision
    io_enabled: bool = True
    _pc1: Optional[object] = None
    _pc2: Optional[object] = None

    def setup(self) -> None:
        """setup_output (output.F90:61-120): open the photon-count files
        and write their headers."""
        if not self.io_enabled:
            return
        os.makedirs(self.results_dir, exist_ok=True)
        self._pc1 = open(os.path.join(self.results_dir, "PhotonCounts.out"),
                         "a")
        self._pc1.write(
            " Columns: redshift, total number of photons used on the grid, "
            "total number of photons produced on the grid, photon "
            "conservation number, fraction new ionization, fraction "
            "recombinations, fraction LLS losses, fraction photon losses, "
            "fraction collisional ionization, grand total photon "
            "conservation number\n")
        self._pc2 = open(os.path.join(self.results_dir, "PhotonCounts2.out"),
                         "a")
        self._pc2.write(
            " Columns: redshift, total number of ions, grand total ionizing "
            "photons, mean ionization fraction (by volume and mass)\n")

    def close_down(self) -> None:
        """output.F90:126-139."""
        for f in (self._pc1, self._pc2):
            if f is not None:
                f.close()
        self._pc1 = self._pc2 = None

    # ------------------------------------------------------------------
    def _path(self, base: str, zred: float, ext: str) -> str:
        return os.path.join(self.results_dir,
                            f"{base}{fortran_f6_3(zred)}{ext}")

    def write_stream1(self, zred, x_coords, x1_line, t_line, nd_line):
        """Axis profile through the first source (output.F90:229-280).

        Takes the 1D lines through the source row (the driver gathers
        them device-side so sharded grids never materialize)."""
        if not self.io_enabled:
            return
        path = self._path("Ifront1_", zred, ".dat")
        with open(path, "w") as f:
            for i in range(self.cfg.mesh[0]):
                x1 = float(x1_line[i])
                t = float(t_line[i]) if t_line is not None else \
                    self.cfg.initial_temperature
                f.write(f"{x_coords[i]:10.3e} {1.0 - x1:10.3e} {x1:10.3e} "
                        f"{t:10.3e} {float(nd_line[i]):10.3e}\n")

    @staticmethod
    def _collective(arr) -> bool:
        """True when gathering `arr` is an SPMD collective every process
        must join (multi-process sharded grid: no process holds it)."""
        import jax
        return (isinstance(arr, jax.Array)
                and not isinstance(arr, np.ndarray)
                and not arr.is_fully_addressable)

    def _write_cube(self, path, arr, dtype):
        """sm3d cube write, streaming z-blocks so axis-0-sharded device
        arrays are fetched one slab-block at a time (never the cube).

        Multi-process discipline: with a cross-process sharded array the
        z-block gathers are collectives, so NON-I/O processes drain the
        same iterator (joining each all-gather) while only the I/O
        process writes — the sharded-grid analogue of the reference's
        rank-0 write of replicated data (output.F90:179)."""
        from ..parallel.layout import z_chunks
        from .io_fortran import write_sm3d_stream
        if self.io_enabled:
            write_sm3d_stream(path, tuple(arr.shape), dtype, z_chunks(arr))
        elif self._collective(arr):
            for _ in z_chunks(arr):
                pass

    def write_stream2(self, zred, xh1, temper=None):
        """Full ionization cube, dp (+ temperature cube, sp)
        (output.F90:285-337)."""
        if not self.io_enabled and not self._collective(xh1):
            return
        self._write_cube(self._path("xfrac3D_", zred, ".bin"), xh1,
                         np.float64)
        if temper is not None and not self.cfg.isothermal:
            self._write_cube(self._path("Temper3D_", zred, ".bin"), temper,
                             np.float32)

    def write_stream3(self, zred, phih, phiheat=None):
        """Ionization (+heating) rate cubes, sp (output.F90:342-390)."""
        if not self.io_enabled and not self._collective(phih):
            return
        self._write_cube(self._path("IonRates3D_", zred, ".bin"), phih,
                         np.float32)
        if phiheat is not None and not self.cfg.isothermal:
            self._write_cube(self._path("HeatRates3D_", zred, ".bin"),
                             phiheat, np.float32)

    def _midplane_cuts(self, arr):
        """Host midplane slices of a (possibly cross-process sharded)
        grid: slice BEFORE materializing; the gather of a sharded slice
        is a collective all processes join (replicate_to_host)."""
        from ..parallel.layout import replicate_to_host
        n1, n2, n3 = self.cfg.mesh
        return [("xy", np.asarray(replicate_to_host(arr[:, :, n3 // 2 - 1]),
                                  np.float32)),
                ("xz", np.asarray(replicate_to_host(arr[:, n2 // 2 - 1, :]),
                                  np.float32)),
                ("yz", np.asarray(replicate_to_host(arr[n1 // 2 - 1, :, :]),
                                  np.float32))]

    def write_stream4(self, zred, xh1):
        """Midplane ionization slices (output.F90:395-454)."""
        if not self.io_enabled and not self._collective(xh1):
            return
        cuts = self._midplane_cuts(xh1)
        if not self.io_enabled:
            return
        for name, plane in cuts:
            path = self._path(f"Ifront2_{name}_", zred, ".bin")
            hdr = np.asarray(plane.shape, np.int32).tobytes()
            write_unformatted_records(path, [hdr, plane.tobytes(order="F")])

    def write_stream5(self, zred, ndens):
        """Midplane density slices (output.F90:459-501)."""
        if not self.io_enabled and not self._collective(ndens):
            return
        cuts = self._midplane_cuts(ndens)
        if not self.io_enabled:
            return
        for name, plane in cuts:
            path = self._path(f"ndens_{name}_", zred, ".bin")
            hdr = np.asarray(plane.shape, np.int32).tobytes()
            write_unformatted_records(path, [hdr, plane.tobytes(order="F")])

    # ------------------------------------------------------------------
    def write_photonstatistics(self, zred: float, time: float, dt: float,
                               stats: PhotonStatistics,
                               photon_loss: float, lls_loss: float,
                               total_flux_s_star: float,
                               ndens, xh1, vol: float) -> int:
        """PhotonCounts/PhotonCounts2 rows + conservation-violation flag.

        Reference: write_photonstatistics, output.F90:506-606.  Returns
        photcons_flag (1 = violation beyond 15% not explained by grid
        loss, :588-598).
        """
        cfg = self.cfg
        s_star = cfg.sed.s_star
        n_cells = cfg.n_cells
        total_photon_loss = photon_loss * s_star * dt  # already a grid total
        total_lls_loss = lls_loss * s_star * dt
        totalsrc = total_flux_s_star * s_star * dt
        # NOTE: the .out file uses the no-LLS variant (output.F90:546-547)
        photcons = ((stats.total_ion - stats.totcollisions) / totalsrc
                    if totalsrc > 0 else 1.0)
        ti = stats.total_ion if stats.total_ion != 0.0 else 1.0
        gr = (stats.grtotal_ion / stats.grtotal_src
              if stats.grtotal_src > 0 else 0.0)
        if self._pc1 is not None and time > 0.0:
            self._pc1.write(
                f"{zred:6.3f}" + "".join(
                    f"{v:10.3E}" for v in (
                        stats.total_ion, totalsrc, photcons,
                        stats.dh0 / ti, stats.totrec / ti,
                        total_lls_loss / totalsrc if totalsrc else 0.0,
                        total_photon_loss / totalsrc if totalsrc else 0.0,
                        stats.totcollisions / ti, gr)) + "\n")
            self._pc1.flush()

        import jax
        if isinstance(xh1, jax.Array) and not isinstance(xh1, np.ndarray):
            # float64 accumulation via per-z-block host partial sums (the
            # grid dtype is f32 in production — a whole-cube f32 sum
            # drifts at ~1e9 cells; z_chunks is SPMD-collective-safe for
            # multi-process sharded grids).  Advisor round-4 finding.
            from ..parallel.layout import z_chunks
            ndx = sx = snd = 0.0
            for nd_b, x_b in zip(z_chunks(ndens), z_chunks(xh1)):
                nd64 = np.asarray(nd_b, np.float64)
                x64 = np.asarray(x_b, np.float64)
                ndx += float((nd64 * x64).sum())
                sx += float(x64.sum())
                snd += float(nd64.sum())
            totions = ndx * vol
            volfrac = sx / n_cells
            massfrac = ndx / snd
        else:
            nd = np.asarray(ndens, np.float64)
            x1 = np.asarray(xh1, np.float64)
            totions = float((nd * x1).sum()) * vol
            volfrac = float(x1.sum()) / n_cells
            massfrac = float((nd * x1).sum()) / float(nd.sum())
        if self._pc2 is not None:
            self._pc2.write(f"{zred:6.3f}" + "".join(
                f"{v:10.3E}" for v in (totions, stats.grtotal_src,
                                       volfrac, massfrac)) + "\n")
            self._pc2.flush()

        flag = 0
        if time > 0.0 and abs(1.0 - photcons) > 0.15:
            if (1.0 - photcons) > 0.15 and \
                    (total_photon_loss / totalsrc if totalsrc else 0.0) \
                    < (1.0 - photcons):
                flag = 1
        return flag

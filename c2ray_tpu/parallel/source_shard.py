"""Source-sharded ray tracing over a device mesh (parallel phase 1).

TPU-native replacement for the reference's MPI source distribution
(/root/reference/master_slave.F90 static round-robin + dynamic
master-slave farm, evolve.F90:577-616 ALLREDUCE of the rate grids):

  * sources are sharded across the 'src' axis of a jax.sharding.Mesh
    (each device sweeps its subset over the replicated grid),
  * the per-device rate grids and loss scalars are summed with lax.psum
    over ICI/DCN - the exact analogue of MPI_ALLREDUCE(MPI_SUM),
  * load balance comes from host-side flux-sorted round-robin dealing
    (models/sources.sort_sources_by_flux) instead of the dynamic task
    farm - deterministic and synchronization-free.

Works identically on a real TPU slice and on the virtual CPU mesh used
in tests (xla_force_host_platform_device_count).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RunConfig
from ..ops.sweep import SweepScalars, raytrace_all_sources
from ..ops.tables import RadTables


def make_device_mesh(n_devices: Optional[int] = None,
                     axis_name: str = "src") -> Mesh:
    """1D device mesh over the source axis (jax.make_mesh equivalent of
    the reference's flat MPI communicator, mpi.F90:153-157)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def pad_sources(srcpos: np.ndarray, nflux: np.ndarray, multiple: int):
    """Pad the source list with zero-flux sources so it shards evenly.

    Zero-flux sources contribute exactly zero rates and losses (all table
    lookups scale with NFlux), mirroring the reference's NormFlux > 0
    guards (radiation_photoionrates.F90:126-137).
    """
    s = len(nflux)
    pad = (-s) % multiple
    if pad:
        srcpos = np.concatenate([srcpos, np.zeros((pad, 3), srcpos.dtype)])
        nflux = np.concatenate([nflux, np.zeros(pad, nflux.dtype)])
    return srcpos, nflux, s


def sharded_raytracer(mesh: Mesh, axis_name: str = "src"):
    """Build a raytracer with the raytrace_all_sources signature that
    shards sources over `mesh` and psums the results.

    Inject into Evolve3D via its `raytracer` argument.
    """

    def raytracer(cfg: RunConfig, tables: RadTables, ndens, xh_av1,
                  srcpos, nflux, sc: SweepScalars, lls_grid=None,
                  max_shell=None, nflux_xray=None):
        ndev = mesh.devices.size
        s = int(srcpos.shape[0])
        have_x = nflux_xray is not None
        if not have_x:
            nflux_xray = jnp.zeros_like(nflux)
        pad = (-s) % ndev
        if pad:
            srcpos = jnp.concatenate(
                [srcpos, jnp.zeros((pad, 3), srcpos.dtype)])
            nflux = jnp.concatenate([nflux, jnp.zeros((pad,), nflux.dtype)])
            nflux_xray = jnp.concatenate(
                [nflux_xray, jnp.zeros((pad,), nflux_xray.dtype)])

        def local(ndens, xh_av1, srcpos, nflux, sc, lls_grid, nfx):
            phih, heat, loss, lls_loss, per_src = raytrace_all_sources(
                cfg, tables, ndens, xh_av1, srcpos, nflux, sc,
                lls_grid=lls_grid, max_shell=max_shell,
                nflux_xray=nfx if have_x else None)
            # MPI_ALLREDUCE(SUM) equivalents (evolve.F90:585-614)
            phih = lax.psum(phih, axis_name)
            heat = lax.psum(heat, axis_name)
            loss = lax.psum(loss, axis_name)
            lls_loss = lax.psum(lls_loss, axis_name)
            # per-source losses come back replicated (all_gather) so the
            # host-side adaptive-radius promotion can read them on every
            # process of a multi-host run
            per_src = lax.all_gather(per_src, axis_name, tiled=True)
            return phih, heat, loss, lls_loss, per_src

        rep = P()                     # replicated
        shard = P(axis_name)          # sharded over sources
        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(rep, rep, shard, shard, rep, rep, shard),
            out_specs=(rep, rep, rep, rep, rep),
            check_vma=False)
        phih, heat, loss, lls_loss, per_src = fn(ndens, xh_av1, srcpos,
                                                 nflux, sc, lls_grid,
                                                 nflux_xray)
        return phih, heat, loss, lls_loss, per_src[:s]

    return raytracer

"""Domain (grid) decomposition — parallel phase 2.

Phase 1 (source_shard.py) replicates the grid and shards sources: the
faithful port of the reference's MPI layout (every rank holds the full
mesh, evolve.F90:599-609).  Phase 2 shards the *grid* itself, which the
reference never achieved (its Cartesian-topology code exists but is
disabled, mpi.F90:69,153-157).

Implemented here now:
  * slab-sharded global chemistry: the chemistry pass is embarrassingly
    parallel per cell, so each device evolves its x-slab of the mesh and
    the updated fractions are all-gathered (chemistry cost / n_devices).

Design for the sharded sweep (future round; SURVEY.md 7.3.3):
  * Shard the grid into x-slabs across the 'dom' mesh axis.  A source's
    wavefront crosses slab boundaries: shell steps whose planes fall in a
    neighbor's slab need that neighbor's coldensh_out boundary planes.
  * With the face-major formulation the exchange is natural: the x+/x-
    face stacks advance strictly along the sharded axis, so each shard
    runs the full shell loop on its slab and ppermute-sends the last
    computed x-face plane (plus the z/y plane *strips* overlapping the
    boundary) to the next shard - a wavefront pipeline with depth equal
    to the number of crossed shards, overlappable with the interior
    shells of other sources (pipeline sources round-robin so every shard
    is busy sweeping a different source's interior while waiting).
  * Rate deposition and chemistry then stay slab-local; only the scalar
    loss tallies need a psum.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RunConfig
from ..ops.chemistry import global_chemistry
from ..ops.thermal import CoolingTable


def sharded_chemistry(mesh: Mesh, axis_name: str = "src",
                      cool: Optional[CoolingTable] = None):
    """Build a global_chemistry drop-in that shards the mesh's first grid
    axis across the devices of `mesh` and all-gathers the results.

    The grid axis must be divisible by the device count.  Scalar/grid
    clumping and the photon-loss term are supported; all inputs arrive
    replicated (as in the phase-1 layout), so the only communication is
    the final all_gather of the slab results.
    """

    ndev = mesh.devices.size

    def chem(cfg: RunConfig, dt, ndens, xh1_old, xh1_intermed, xh1_av,
             phih, phiheat=None, temper_current=None, temper_av=None,
             clumping=1.0, cool_table=None, cosmo_cool_coeff=0.0):
        n = ndens.shape[0]
        if n % ndev != 0:
            return global_chemistry(cfg, dt, ndens, xh1_old, xh1_intermed,
                                    xh1_av, phih, phiheat, temper_current,
                                    temper_av, clumping, cool_table or cool,
                                    cosmo_cool_coeff)

        def local(dt, ndens, xh1_old, xh1_int, xh1_av, phih, phiheat,
                  t_cur, t_av, clumping, ccc):
            res = global_chemistry(cfg, dt, ndens, xh1_old, xh1_int, xh1_av,
                                   phih, phiheat, t_cur, t_av, clumping,
                                   cool_table or cool, ccc)
            conv = lax.psum(res.conv_flag, axis_name)
            nit = lax.pmax(res.n_iterations, axis_name)
            return res._replace(conv_flag=conv, n_iterations=nit)

        shard = P(axis_name)       # slab along grid axis 0
        rep = P()
        grid_or_scalar = shard if hasattr(clumping, "ndim") and \
            getattr(clumping, "ndim", 0) == 3 else rep
        from ..ops.chemistry import ChemistryResult

        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(rep, shard, shard, shard, shard, shard,
                      shard if phiheat is not None else rep,
                      shard if temper_current is not None else rep,
                      shard if temper_av is not None else rep,
                      grid_or_scalar, rep),
            out_specs=ChemistryResult(shard, shard, shard, shard, rep, rep),
            check_vma=False)
        return fn(dt, ndens, xh1_old, xh1_intermed, xh1_av, phih,
                  phiheat, temper_current, temper_av, clumping,
                  cosmo_cool_coeff)

    return chem

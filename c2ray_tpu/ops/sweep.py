"""Causal wavefront ray-sweep engine — the heart of the framework.

TPU-native reformulation of the reference's per-source short-characteristics
ray trace (/root/reference/evolve_source.F90 + evolve_point.F90:83-299 +
column_density.f90:29-293).  The reference visits cells serially, marching
outward from the source (6 axes / 12 planes / 8 octants under OpenMP).
Here the same causal order becomes a *Chebyshev-shell wavefront*:

  * Work in a source-centered frame: all per-source fields are rolled so
    the source sits at index c = N//2.  Offsets o = idx - c span
    [-N//2, N-1-N//2], exactly the reference's periodic trace bounds
    (evolve_source.F90:100-102).
  * Cells at Chebyshev distance d = max(|ox|,|oy|,|oz|) depend only on
    cells at distance < d: every interpolation corner of the
    short-characteristics scheme either lies in shell d-1 or receives an
    exactly-zero geometric weight (the dx=(d-|t|)/d factors vanish on the
    shell diagonal).  So shell d is one fully parallel step.
  * A shell's surface is processed as 6 faces (dominant axis +/-, with the
    reference's z>=y>=x tie-breaking, column_density.f90:108,173,226).
    On a face, the 4 upstream corners are *shifted copies of the previous
    dominant plane*, so the entire interpolation is rolls + selects +
    elementwise math on 2D planes - no gathers - and the geometric weights
    reduce to closed forms evaluated from iota coordinates:
        dx = (d - |ta|)/d,  path = sqrt((ta^2+tb^2)/d^2 + 1).
  * The dynamic subbox growth (evolve_source.F90:128-212) becomes a static
    `max_shell` radius; escaping photons are tallied exactly as the
    reference's boundary-face loss (evolve_point.F90:290-295) so a host
    driver can re-sweep under-radiused sources.

Units policy (float32-safe): photon rates in units of S_star photons/s
(tables pre-normalized), geometry in cell units; the single combined scale
rate_scale = S_star/dr^3 converts to physical per-atom rates.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .. import constants as const
from ..config import RunConfig
from .tables import RadTables, photoion_rates

SQRT2 = float(np.sqrt(2.0))
SQRT3 = float(np.sqrt(3.0))
FOURPI = 4.0 * np.pi

# The 6 shell faces: (dominant axis, sign, bound_sub_a, bound_sub_b).
# bound_sub encodes the tie-breaking partition (z beats y beats x, matching
# the elif-chain in column_density.f90:108-267): transverse offsets satisfy
# |t| <= d - bound_sub.
_FACES = (
    (2, +1, 0, 0), (2, -1, 0, 0),   # z faces: |ox|<=d, |oy|<=d
    (1, +1, 0, 1), (1, -1, 0, 1),   # y faces: |ox|<=d, |oz|<=d-1
    (0, +1, 1, 1), (0, -1, 1, 1),   # x faces: |oy|<=d-1, |oz|<=d-1
)


class SweepScalars(NamedTuple):
    """Traced per-step scalars (all float32-safe magnitudes)."""

    dr: jax.Array           # proper cell size [cm]
    rate_scale: jax.Array   # S_star / dr^3  [photons / s / cm^3 per table unit]
    lls_coldens: jax.Array  # LLS column density per cell [cm^-2] (type 1)
    rmax2_cells: jax.Array  # squared LLS type-3 barrier radius [cell units]


class SweepResult(NamedTuple):
    phih: jax.Array         # per-neutral-atom photoionization rate [1/s]
    phiheat: jax.Array      # photo-heating rate [erg/s/cm^3]
    photon_loss: jax.Array  # photons/s escaping the traced region [S_star units]
    lls_loss: jax.Array     # photons/s absorbed by LLS fog [S_star units]
    coldensh_out: jax.Array  # outgoing column densities (diagnostics/tests)


def _take_plane(vol: jax.Array, axis: int, idx, lo: int, p: int) -> jax.Array:
    """Extract the (p,p) plane at (possibly traced) index along `axis`,
    with static transverse window [lo, lo+p)."""
    starts: List = [lo, lo, lo]
    sizes = [p, p, p]
    starts[axis] = idx
    sizes[axis] = 1
    return lax.dynamic_slice(vol, starts, sizes).squeeze(axis)


def _put_plane(vol: jax.Array, plane: jax.Array, axis: int, idx, lo: int) -> jax.Array:
    starts: List = [lo, lo, lo]
    starts[axis] = idx
    return lax.dynamic_update_slice(vol, jnp.expand_dims(plane, axis), starts)


def roll3(a: jax.Array, shifts) -> jax.Array:
    """Periodic roll of a 3D field by (possibly traced) per-axis shifts."""
    return jnp.roll(a, (shifts[0], shifts[1], shifts[2]), axis=(0, 1, 2))


def plan_buckets(cfg: RunConfig, max_shell: int) -> List[Tuple[int, int, int, int]]:
    """Split shells 1..max_shell into buckets of static patch size.

    Returns (d_lo, d_hi, patch, lo) tuples; within a bucket a fori_loop
    runs with patch-size-static shapes.  This is the TPU analogue of the
    reference's growing subboxes (evolve_source.F90:128-136): small shells
    touch only small windows of the grid.
    """
    n = cfg.mesh[0]
    c = n // 2
    w = cfg.shell_bucket_size
    if w <= 0:
        ranges = [(1, max_shell)]
    else:
        ranges = []
        d = 1
        while d <= max_shell:
            hi = min(d + w - 1, max_shell)
            ranges.append((d, hi))
            d = hi + 1
    out = []
    for d_lo, d_hi in ranges:
        p = min(n, 2 * d_hi + 1)
        lo = max(0, min(c - d_hi, n - p))
        out.append((d_lo, d_hi, p, lo))
    return out


def _shell_step(d, carry, *, cfg: RunConfig, tables: RadTables,
                nd_c, xa_c, nflux, sc: SweepScalars, lls_c,
                patch: int, lo: int, max_shell: int):
    """Process all 6 faces of Chebyshev shell d (one wavefront step).

    Equivalent of one pass of evolve2D/evolve1D_axis/evolve2D_plane/
    evolve3D_quadrant over the shell's cells, with the per-cell work of
    evolve0D (evolve_point.F90:83-299) fully vectorized.
    """
    cdo, phih, heat, loss, lls_loss = carry
    n = cfg.mesh[0]
    c = n // 2
    pos_max = n - 1 - c
    dtype = cdo.dtype
    sigma = const.SIGMA_HI_AT_ION_FREQ
    eps = cfg.epsilon

    df = d.astype(dtype) if hasattr(d, "astype") else jnp.asarray(d, dtype)
    inv_d = 1.0 / df

    ar = np.arange(patch) + (lo - c)            # transverse offsets (static)
    ita = jnp.asarray(ar[:, None], jnp.int32)
    itb = jnp.asarray(ar[None, :], jnp.int32)
    ta = jnp.asarray(ar[:, None], dtype)
    tb = jnp.asarray(ar[None, :], dtype)
    abs_ta = jnp.abs(ta)
    abs_tb = jnp.abs(tb)

    # --- gather the 6 previous dominant planes and current field planes ---
    prev = jnp.stack([_take_plane(cdo, ax, c + s * (d - 1), lo, patch)
                      for (ax, s, _, _) in _FACES])
    ndp = jnp.stack([_take_plane(nd_c, ax, c + s * d, lo, patch)
                     for (ax, s, _, _) in _FACES])
    xap = jnp.stack([_take_plane(xa_c, ax, c + s * d, lo, patch)
                     for (ax, s, _, _) in _FACES])
    if lls_c is not None:
        lcol = jnp.stack([_take_plane(lls_c, ax, c + s * d, lo, patch)
                          for (ax, s, _, _) in _FACES])
    else:
        lcol = sc.lls_coldens

    # --- short-characteristics corners: shifted copies of prev plane ------
    # Corner offset along a transverse axis t is t - sign(t), with the
    # Fortran convention sign(0) = +1 (column_density.f90:88-96).
    pos_a = (ita >= 0)[None, :, :]
    pos_b = (itb >= 0)[None, :, :]

    def shift_toward_source(x, plane_axis, pos_mask):
        up = jnp.roll(x, 1, axis=plane_axis)    # x[p-1]
        dn = jnp.roll(x, -1, axis=plane_axis)   # x[p+1]
        return jnp.where(pos_mask, up, dn)

    c4 = prev                                    # (i , j ) corner
    c3 = shift_toward_source(prev, 1, pos_a)     # (im, j )
    c2 = shift_toward_source(prev, 2, pos_b)     # (i , jm)
    c1 = shift_toward_source(c3, 2, pos_b)       # (im, jm)

    # --- geometric interpolation weights (column_density.f90:112-142) -----
    # dx = 2|xc - (im + 0.5 sgn)| reduces to (d - |t|)/d in the shell frame.
    f_a = jnp.clip((df - abs_ta) * inv_d, 0.0, 1.0)
    f_b = jnp.clip((df - abs_tb) * inv_d, 0.0, 1.0)
    s1 = (1.0 - f_a) * (1.0 - f_b)
    s2 = f_a * (1.0 - f_b)
    s3 = (1.0 - f_a) * f_b
    s4 = f_a * f_b

    def wf(cd):
        """weightf = 1/max(0.6, cd*sigma). column_density.f90:276-293."""
        return 1.0 / jnp.maximum(0.6, cd * sigma)

    w1 = s1 * wf(c1)
    w2 = s2 * wf(c2)
    w3 = s3 * wf(c3)
    w4 = s4 * wf(c4)
    cdensi = (c1 * w1 + c2 * w2 + c3 * w3 + c4 * w4) / (w1 + w2 + w3 + w4)

    # diagonal corrections, active only on shell 1 (column_density.f90:152-158)
    a1 = jnp.abs(ita) == 1
    b1 = jnp.abs(itb) == 1
    diag = jnp.where(a1 & b1, SQRT3, jnp.where(a1 | b1, SQRT2, 1.0)).astype(dtype)
    cdensi = jnp.where(d == 1, cdensi * diag, cdensi)

    # --- path length and shell volume (cell units) ------------------------
    t2 = ta * ta + tb * tb
    path = jnp.sqrt(t2 * (inv_d * inv_d) + 1.0)        # column_density.f90:168
    dist2_c = t2 + df * df
    vol_ph = FOURPI * dist2_c * path                   # evolve_point.F90:177

    # --- LLS opacity added to the incoming column (evolve_point.F90:186-196)
    coldensh_in = cdensi
    if cfg.use_lls and cfg.type_of_lls in (1, 2):
        coldensh_in = coldensh_in + lcol * path

    stop = coldensh_in > cfg.max_coldensh              # evolve_point.F90:201
    if cfg.use_lls and cfg.type_of_lls == 3:
        stop = stop | (dist2_c > sc.rmax2_cells)       # evolve_point.F90:191

    # --- cell column + photon-conserving rates (evolve_point.F90:247-286) -
    xa1 = jnp.maximum(xap, eps)
    xa0 = jnp.maximum(1.0 - xa1, eps)
    cdo_new = coldensh_in + xa0 * ndp * (path * sc.dr)
    phi = photoion_rates(cfg, tables, coldensh_in, cdo_new, vol_ph, nflux)
    gamma = phi.photo_cell * sc.rate_scale / (xa0 * ndp)
    gamma = jnp.where(stop, 0.0, gamma)
    phi_out = jnp.where(stop, 0.0, phi.photo_out)
    if not cfg.isothermal:
        heat_v = jnp.where(stop, 0.0, phi.heat) * sc.rate_scale

    # --- masks, losses, commits ------------------------------------------
    p_lim = min(max_shell, pos_max)
    q_lim = min(max_shell, c)
    loss_add = jnp.zeros((), dtype)
    lls_add = jnp.zeros((), dtype)
    if cfg.use_lls and cfg.type_of_lls in (1, 2):
        # Photons absorbed by the LLS fog in this cell.  NOTE: physically
        # correct accounting with phi.photo_in; the reference passes its
        # never-assigned photo_in_HI field here (evolve_point.F90:269,
        # radiation_photoionrates.F90:438-452), making its tally always 0.
        tau_lls = sigma * lcol * path
        lls_cell = phi.photo_in / vol_ph * (-jnp.expm1(-tau_lls))
    for f, (ax, s, sub_a, sub_b) in enumerate(_FACES):
        mask = (jnp.abs(ita) <= d - sub_a) & (jnp.abs(itb) <= d - sub_b)
        if s > 0:
            mask = mask & (d <= pos_max)
        # boundary-of-trace loss tally (evolve_point.F90:290-295)
        bnd = ((ita == p_lim) | (ita == -q_lim) |
               (itb == p_lim) | (itb == -q_lim) |
               (d == (p_lim if s > 0 else q_lim)))
        loss_add = loss_add + jnp.sum(
            jnp.where(mask & bnd, phi_out[f] / vol_ph, 0.0))
        if cfg.use_lls and cfg.type_of_lls in (1, 2):
            lls_add = lls_add + jnp.sum(
                jnp.where(mask & ~stop[f], lls_cell[f], 0.0))
        zi = c + s * d
        old = _take_plane(cdo, ax, zi, lo, patch)
        cdo = _put_plane(cdo, jnp.where(mask, cdo_new[f], old), ax, zi, lo)
        oldp = _take_plane(phih, ax, zi, lo, patch)
        phih = _put_plane(phih, oldp + jnp.where(mask, gamma[f], 0.0), ax, zi, lo)
        if not cfg.isothermal:
            oldh = _take_plane(heat, ax, zi, lo, patch)
            heat = _put_plane(heat, oldh + jnp.where(mask, heat_v[f], 0.0),
                              ax, zi, lo)

    return (cdo, phih, heat, loss + loss_add, lls_loss + lls_add)


def sweep_single_source(cfg: RunConfig, tables: RadTables,
                        nd_c: jax.Array, xa_c: jax.Array,
                        nflux, sc: SweepScalars,
                        lls_c: Optional[jax.Array] = None,
                        max_shell: Optional[int] = None) -> SweepResult:
    """Ray-trace one source over its (source-centered) grid.

    Equivalent of do_source (evolve_source.F90:58-221): resets the
    per-source column-density grid, processes the source cell, then walks
    the Chebyshev shells outward to max_shell, accumulating the per-atom
    photoionization rate, heating rate, boundary photon loss and LLS loss.
    """
    n = cfg.mesh[0]
    assert cfg.mesh[0] == cfg.mesh[1] == cfg.mesh[2], "sweep assumes cubic mesh"
    c = n // 2
    d_max = c
    if max_shell is None:
        max_shell = cfg.max_shell if cfg.max_shell is not None else d_max
    max_shell = min(max_shell, min(d_max, cfg.max_subbox))
    dtype = nd_c.dtype
    eps = cfg.epsilon

    cdo = jnp.zeros((n, n, n), dtype)     # coldensh_out (evolve_source.F90:91)
    phih = jnp.zeros((n, n, n), dtype)
    heat = jnp.zeros((n, n, n), dtype) if not cfg.isothermal else None
    loss = jnp.zeros((), dtype)
    lls_loss = jnp.zeros((), dtype)

    # --- source cell (evolve_point.F90:151-160): path = dr/2, vol_ph = cell
    nd0 = nd_c[c, c, c]
    xa1 = jnp.maximum(xa_c[c, c, c], eps)
    xa0 = jnp.maximum(1.0 - xa1, eps)
    cdo0 = xa0 * nd0 * (0.5 * sc.dr)
    phi0 = photoion_rates(cfg, tables, jnp.zeros((), dtype), cdo0,
                          jnp.ones((), dtype), nflux)
    gamma0 = phi0.photo_cell * sc.rate_scale / (xa0 * nd0)
    cdo = cdo.at[c, c, c].set(cdo0)
    phih = phih.at[c, c, c].set(gamma0)
    if heat is not None:
        heat = heat.at[c, c, c].set(phi0.heat * sc.rate_scale)
    if cfg.use_lls and cfg.type_of_lls in (1, 2):
        lcol0 = lls_c[c, c, c] if lls_c is not None else sc.lls_coldens
        tau0 = const.SIGMA_HI_AT_ION_FREQ * lcol0 * 0.5
        lls_loss = lls_loss + phi0.photo_in * (-jnp.expm1(-tau0))

    carry = (cdo, phih, heat, loss, lls_loss)
    for d_lo, d_hi, patch, lo in plan_buckets(cfg, max_shell):
        def body(d, carry, patch=patch, lo=lo):
            return _shell_step(d, carry, cfg=cfg, tables=tables, nd_c=nd_c,
                               xa_c=xa_c, nflux=nflux, sc=sc, lls_c=lls_c,
                               patch=patch, lo=lo, max_shell=max_shell)
        carry = lax.fori_loop(d_lo, d_hi + 1, body, carry)

    cdo, phih, heat, loss, lls_loss = carry
    if heat is None:
        heat = jnp.zeros((), dtype)
    return SweepResult(phih, heat, loss, lls_loss, cdo)


def raytrace_all_sources(cfg: RunConfig, tables: RadTables,
                         ndens: jax.Array, xh_av1: jax.Array,
                         srcpos: jax.Array, nflux: jax.Array,
                         sc: SweepScalars,
                         lls_grid: Optional[jax.Array] = None,
                         max_shell: Optional[int] = None):
    """Sweep every source and accumulate the global rate grids.

    Equivalent of pass_all_sources/do_grid (evolve.F90:444-495,
    master_slave.F90:53-96) for the sources local to this device; the
    distributed version psums the returned grids (parallel/source_shard.py).

    Sources are processed in vmapped batches of cfg.source_batch: the
    shell wavefront loop is shared across the batch (one set of ops per
    shell, batched planes), which is what keeps the TPU busy - single
    sources at small meshes are per-op-overhead-bound.  This is the
    within-device analogue of the reference's OpenMP sector parallelism
    (evolve_source.F90:141-187), but batching whole sources instead of
    octants.

    Args:
      srcpos: (S, 3) int32 0-based source cell positions.
      nflux:  (S,) source luminosities in S_star units.
    Returns:
      (phih_grid, phiheat_grid, photon_loss, lls_loss, per_source_loss)
    """
    n = cfg.mesh[0]
    c = n // 2
    dtype = ndens.dtype
    s = srcpos.shape[0]
    b = max(1, min(cfg.source_batch, s))
    nbatch = -(-s // b)
    pad = nbatch * b - s
    if pad:
        # zero-flux padding sources contribute exactly zero everywhere
        srcpos = jnp.concatenate([srcpos, jnp.zeros((pad, 3), srcpos.dtype)])
        nflux = jnp.concatenate([nflux, jnp.zeros((pad,), nflux.dtype)])
    srcpos_b = srcpos.reshape(nbatch, b, 3)
    nflux_b = nflux.reshape(nbatch, b)

    def sweep_one(pos, nf):
        shifts = c - pos
        nd_c = roll3(ndens, shifts)
        xa_c = roll3(xh_av1, shifts)
        lls_c = roll3(lls_grid, shifts) if lls_grid is not None else None
        res = sweep_single_source(cfg, tables, nd_c, xa_c, nf, sc,
                                  lls_c=lls_c, max_shell=max_shell)
        phih_g = roll3(res.phih, pos - c)
        heat_g = (roll3(res.phiheat, pos - c) if not cfg.isothermal
                  else res.phiheat)
        return phih_g, heat_g, res.photon_loss, res.lls_loss

    vsweep = jax.vmap(sweep_one)

    def one_batch(carry, inp):
        phih_g, heat_g, loss_t, lls_t = carry
        pos, nf = inp
        ph, he, lo, ll = vsweep(pos, nf)
        phih_g = phih_g + jnp.sum(ph, axis=0)
        if not cfg.isothermal:
            heat_g = heat_g + jnp.sum(he, axis=0)
        return (phih_g, heat_g, loss_t + jnp.sum(lo),
                lls_t + jnp.sum(ll)), lo

    zero3 = jnp.zeros((n, n, n), dtype)
    heat0 = zero3 if not cfg.isothermal else jnp.zeros((), dtype)
    carry0 = (zero3, heat0, jnp.zeros((), dtype), jnp.zeros((), dtype))
    (phih, heat, loss, lls_loss), per_src_loss = lax.scan(
        one_batch, carry0, (srcpos_b, nflux_b))
    return phih, heat, loss, lls_loss, per_src_loss.reshape(-1)[:s]

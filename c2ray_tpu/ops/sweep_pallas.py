"""Pallas whole-sweep column kernel.

The XLA wavefront loop pays a fixed per-HLO-op cost every shell (the
dominant cost on TPU for plane-sized work); this kernel runs the ENTIRE
shell march as one Pallas program: grid = (batch, shells), the previous
shell's 6 face planes live in VMEM scratch across grid steps, and each
step is a single fused kernel invocation (plane update + wedge fixups)
with pipelined HBM block I/O.

Shares the exact plane-update math with the XLA backend
(ops.sweep._wavefront_plane_update), so results are identical by
construction; a CPU-interpret-mode test asserts it.

I/O layout (round 3): the kernel reads its per-shell face planes
DIRECTLY from the source-centered cube (x faces) and from two
transposed copies of it (y/z faces) via per-face BlockSpec index maps -
the negative faces read descending rows and the out-of-range + shells
clamp to the edge plane, which reproduces the old face-major staging's
flip/edge-pad semantics with ZERO staging work for x and one cube
transpose each for y/z (the old path materialized a flipped+stacked
(nd,6,p,p) face-major array, ~3x the cube, before every march).
Outputs are six per-face (nd,p,p) arrays; negative faces are written
through REVERSED index maps so the unstage step is pure forward
slices + dynamic_update_slice (the old single (nd,6,p,p) output forced
XLA to re-lay-out the whole array twice - 2x3.2 GB copies at 256^3x16 -
before the y/z-face moveaxis).  All block DMAs stay contiguous
(1,1,p,p), so the kernel's pipeline behavior is unchanged.

Handles both scalar LLS models and the type-2 LLS grid (staged the same
way as the density).  Mesh cap: the validated 600^3 envelope
(pallas_sweep_available) - the reference's production mesh options run
to 600^3 on one chip (sizes.f90:30-71).

STATUS: production on TPU (bench.py --backend auto selects it).  The
round-1 miscompare was root-caused to XLA:TPU host-side bugs, not the
kernel: reversed-stride slice updates under vmap with batch >= 4
corrupt staged outputs, and concat+DUS fusions of the kernel output
miscompile at batch >= 4 - both are moot in the round-3 I/O design
(no reversed slices, no concat on the output path).  Validated bitwise
against single-source sweeps at the full bench configuration on
hardware (scripts/validate_tpu.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RunConfig
from .sweep import SweepScalars, _wavefront_plane_update


def _kernel(params_ref, seed_ref, *rest, cfg: RunConfig, n: int,
            d_lo: int, has_lls: bool, mask_outputs: bool = False):
    # rest = 6 ndhi face refs [+ 6 lls face refs] + 6 out refs + prev scratch
    nd_refs = rest[0:6]
    if has_lls:
        lls_refs = rest[6:12]
        out_refs = rest[12:18]
        prev_ref = rest[18]
    else:
        lls_refs = None
        out_refs = rest[6:12]
        prev_ref = rest[12]
    bi = pl.program_id(0)
    d_idx = pl.program_id(1)

    @pl.when(d_idx == 0)
    def _():
        # bucket-entry state: the source cell's half-cell column for the
        # first bucket (evolve_point.F90:151-160), the previous bucket's
        # final planes (center-padded to this patch) otherwise
        prev_ref[...] = seed_ref[0]

    dr = params_ref[bi, 0]
    d = d_idx + d_lo                   # shell number
    ndhi_p = jnp.stack([r[0, 0] for r in nd_refs])
    # grid LLS (type 2): the per-shell LLS column planes, read exactly as
    # the density planes (LLS.F90:199-210)
    lcol = (jnp.stack([r[0, 0] for r in lls_refs]) if has_lls
            else params_ref[bi, 1])
    # rowfix: inside the fused kernel the wedge fixups extract only
    # the consumed |t|=d vectors (10 one-hot matvecs, ~10 p^2 MACs)
    # instead of full-plane mirror contractions (~9 p^3 MACs at
    # HIGHEST) - bitwise-identical planes, ~400x less MXU work
    new = _wavefront_plane_update(prev_ref[...], ndhi_p, lcol,
                                  d, cfg, dr, n, rowfix=True)
    if mask_outputs:
        # pre-apply the cell-ownership partition (face_ownership_masks
        # in plane coordinates) so the unstage step becomes pure ADDs of
        # disjoint-support slabs - no mask constant reads, no select
        # chains.  The UNMASKED planes still seed the next shell via the
        # scratch, so the march chain is unchanged; only valid only for
        # single-bucket ladders (multi-bucket seeds reuse output planes).
        c = n // 2
        ita = lax.broadcasted_iota(jnp.int32, (n, 1), 0) - c
        itb = lax.broadcasted_iota(jnp.int32, (1, n), 1) - c
        aa, ab = jnp.abs(ita), jnp.abs(itb)
        own = [(aa <= d) & (ab <= d), (aa <= d) & (ab <= d),
               (aa <= d) & (ab < d), (aa <= d) & (ab < d),
               (aa < d) & (ab < d), (aa < d) & (ab < d)]
        for f in range(6):
            out_refs[f][0, 0] = jnp.where(own[f], new[f], 0.0)
    else:
        for f in range(6):
            out_refs[f][0, 0] = new[f]
    prev_ref[...] = new


def _march_ladder(max_shell: int, n: int):
    """Shell buckets (d_lo, d_hi, patch).

    One bucket on the tightest patch that holds every shell: per-step
    cost on this stack is fixed-latency-dominated, so splitting the march
    into smaller-patch buckets does NOT pay (measured 135 vs 105 ms at
    256^3) - but clipping the single bucket's patch to (2*max_shell+1)
    still saves staging for radius-capped sweeps.  Multi-bucket ladders
    remain supported by the machinery below (and stay bitwise-identical:
    cells outside a shell's patch are never consumed downstream).
    """
    return [(1, max_shell, min(2 * max_shell + 1, n))]


def _face_specs(p: int, nd: int, d_lo: int, cc: int):
    """Input BlockSpecs reading the 6 per-shell face planes directly from
    the patch cube (x faces) and its y/z transposes: at grid step di
    (shell d = d_lo + di) face +ax reads plane row cc+d of the ax-major
    cube, face -ax reads row cc-d.  Out-of-range + rows (d > n-1-c at
    full radius) clamp to the edge plane - exactly the old staging's
    edge-pad semantics (the clamped planes' outputs are never consumed:
    unstage stops at pos_max for + faces)."""
    hi = p - 1

    def pos(bi, di):
        return (bi, jnp.minimum(cc + d_lo + di, hi), 0, 0)

    def neg(bi, di):
        return (bi, jnp.maximum(cc - d_lo - di, 0), 0, 0)

    blk = (1, 1, p, p)
    # face order = _FACES = [z+, z-, y+, y-, x+, x-]; the ax-major cubes
    # are passed per-face below (z faces read zT, y faces yT, x the patch)
    return [pl.BlockSpec(blk, m, memory_space=pltpu.VMEM)
            for m in (pos, neg, pos, neg, pos, neg)]


def _march_bucket(cfg: RunConfig, params, seed, faces6, lls6,
                  d_lo: int, p: int, nd: int, mask_outputs: bool = False):
    """One pallas_call over (batch, shells of this bucket).

    faces6 / lls6: per-face cube views in face-normal-major axis order
    (zT, zT, yT, yT, patch, patch) - three distinct arrays, each passed
    twice (one BlockSpec per sign).
    Returns 6 per-face plane arrays (b, nd, p, p); NEGATIVE faces are
    written through reversed index maps (array row i = shell d_lo+nd-1-i)
    so downstream unstaging slices forward in cube-row order.
    """
    b = params.shape[0]
    dtype = faces6[0].dtype
    has_lls = lls6 is not None
    cc = p // 2

    in_specs = [
        # whole params array resident in SMEM; indexed by program id
        pl.BlockSpec((b, 4), lambda bi, di: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 6, p, p), lambda bi, di: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + _face_specs(p, nd, d_lo, cc)
    inputs = [params, seed] + list(faces6)
    if has_lls:
        in_specs += _face_specs(p, nd, d_lo, cc)
        inputs += list(lls6)

    def out_pos(bi, di):
        return (bi, di, 0, 0)

    def out_neg(bi, di):
        return (bi, nd - 1 - di, 0, 0)

    out_specs = [pl.BlockSpec((1, 1, p, p), m, memory_space=pltpu.VMEM)
                 for m in (out_pos, out_neg, out_pos, out_neg,
                           out_pos, out_neg)]
    out_shapes = [jax.ShapeDtypeStruct((b, nd, p, p), dtype)] * 6
    return pl.pallas_call(
        partial(_kernel, cfg=cfg, n=p, d_lo=d_lo, has_lls=has_lls,
                mask_outputs=mask_outputs),
        grid=(b, nd),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((6, p, p), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the exact (precision=HIGHEST) one-hot mirror contractions in
            # the wedge fixups need more kernel stack than the default
            # 16 MiB scoped-vmem budget at N=256 (measured 19.8 MiB);
            # 512^3 plane stacks (6.3 MiB each, ~5 live) need most of the
            # 128 MiB v5e VMEM
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*inputs)


# cell-ownership partition shared with the XLA backend (sweep.py
# face_ownership_masks): both backends must keep an identical partition
from .sweep import face_ownership_masks as _own_masks  # noqa: E402


def _unstage_six_sum(out: jax.Array, faces, n: int, d_lo: int,
                     lo: int, p: int) -> jax.Array:
    """Merge KERNEL-PRE-MASKED per-face plane arrays by pure addition:
    the ownership partition is disjoint and already applied in-kernel
    (mask_outputs=True), so each cell receives exactly one nonzero
    contribution - no mask constants, no select chains.  Bitwise-equal
    to _unstage_six on masked inputs (adding exact zeros)."""
    c = n // 2
    pos_max = n - 1 - c
    nd = faces[0].shape[0]
    d_hi = d_lo + nd - 1
    geom = [(0, 2, 1), (1, 2, -1), (2, 1, 1), (3, 1, -1),
            (4, 0, 1), (5, 0, -1)]
    for f, ax, s in geom:
        hi = min(d_hi, pos_max if s > 0 else c)
        if hi < d_lo:
            continue
        cnt = hi - d_lo + 1
        slab = faces[f][0:cnt] if s > 0 else faces[f][nd - cnt:nd]
        slab = jnp.moveaxis(slab, 0, ax)
        region = [slice(lo, lo + p)] * 3
        region[ax] = (slice(c + d_lo, c + hi + 1) if s > 0
                      else slice(c - hi, c - d_lo + 1))
        out = out.at[tuple(region)].add(slab)
    return out


def _unstage_six(out: jax.Array, faces, n: int, d_lo: int,
                 lo: int, p: int) -> jax.Array:
    """Merge one bucket's six per-face plane arrays (nd, p, p) into the
    grid-layout cube by cell ownership (same partition as _unstage_patch).

    Per-source (vmapped by the caller).  Negative-face arrays arrive in
    cube-row (= shell-descending) order, so every face is a FORWARD
    slice; only the y/z faces need a (small, per-face) transpose into
    cube orientation.
    """
    c = n // 2
    pos_max = n - 1 - c
    nd = faces[0].shape[0]
    d_hi = d_lo + nd - 1
    own = _own_masks(n, c)
    # (face index, cube axis, sign) in _FACES order
    geom = [(0, 2, 1), (1, 2, -1), (2, 1, 1), (3, 1, -1),
            (4, 0, 1), (5, 0, -1)]
    for f, ax, s in geom:
        hi = min(d_hi, pos_max if s > 0 else c)
        if hi < d_lo:
            continue
        cnt = hi - d_lo + 1
        if s > 0:
            slab = faces[f][0:cnt]
        else:
            # reversed-map array: row i = shell d_lo + nd-1-i; cube rows
            # c-hi..c-d_lo ascending = shells hi..d_lo descending
            slab = faces[f][nd - cnt:nd]
        slab = jnp.moveaxis(slab, 0, ax)
        region = [slice(lo, lo + p)] * 3
        region[ax] = (slice(c + d_lo, c + hi + 1) if s > 0
                      else slice(c - hi, c - d_lo + 1))
        region = tuple(region)
        m = jnp.asarray(own[f][region])
        out = out.at[region].set(jnp.where(m, slab, out[region]))
    return out


def compute_columns_pallas(cfg: RunConfig, ndhi_cb: jax.Array,
                           sc: SweepScalars, max_shell: int,
                           lls_cb: Optional[jax.Array] = None) -> jax.Array:
    """Batched column march: (B,N,N,N) source-centered neutral densities ->
    (B,N,N,N) coldensh_out fields.

    The march runs as a ladder of pallas_calls over shell buckets with
    growing patch extents (_march_ladder); the previous bucket's final
    planes seed the next (center-padded - cells beyond the previous
    bucket's shell extent carry zero s-weights, so padding is exact).

    lls_cb: optional (B,N,N,N) source-centered LLS column-density grids
    (type-2 LLS, LLS.F90:214-316); face views are built alongside the
    density's and streamed into the kernel as six more VMEM inputs.
    """
    b, n = ndhi_cb.shape[0], ndhi_cb.shape[1]
    c = n // 2
    dtype = ndhi_cb.dtype
    has_lls = lls_cb is not None

    cdo0 = ndhi_cb[:, c, c, c] * (0.5 * sc.dr)
    params = jnp.stack([
        jnp.broadcast_to(sc.dr, (b,)).astype(dtype),
        jnp.broadcast_to(sc.lls_coldens, (b,)).astype(dtype),
        cdo0.astype(dtype),
        jnp.zeros((b,), dtype),
    ], axis=1)                                       # (B, 4)

    def face_views(cube, lo, p):
        """(zT, zT, yT, yT, patch, patch): the patch cube in z-major,
        y-major and native (x-major) axis order.  Transverse plane dims
        match the old face-major staging: z planes (x,y), y planes (x,z),
        x planes (y,z)."""
        patch = cube[:, lo:lo + p, lo:lo + p, lo:lo + p]
        y_t = jnp.moveaxis(patch, 2, 1)              # (b, y, x, z)
        z_t = jnp.moveaxis(patch, 3, 1)              # (b, z, x, y)
        return (z_t, z_t, y_t, y_t, patch, patch)

    ladder = _march_ladder(max_shell, n)
    # single-bucket ladders (the production default) pre-mask ownership
    # in-kernel so the unstage is pure adds; multi-bucket ladders reuse
    # output planes as next-bucket seeds and need them unmasked
    masked = len(ladder) == 1
    out_cube = jnp.zeros((b, n, n, n), dtype)
    prev = None                      # (B, 6, p_prev, p_prev) final planes
    p_prev = 0
    for (d_lo, d_hi, p) in ladder:
        lo = c - (p // 2)
        nd = d_hi - d_lo + 1
        faces6 = face_views(ndhi_cb, lo, p)
        lls6 = face_views(lls_cb, lo, p) if has_lls else None
        if prev is None:
            # shell-0 state: zeros + the source cell's half-cell column
            seed = jnp.zeros((b, 6, p, p), dtype)
            seed = seed.at[:, :, p // 2, p // 2].set(cdo0[:, None])
        else:
            off = p // 2 - p_prev // 2
            seed = jnp.pad(prev, ((0, 0), (0, 0),
                                  (off, p - p_prev - off),
                                  (off, p - p_prev - off)))
        planes6 = _march_bucket(cfg, params, seed, faces6, lls6,
                                d_lo, p, nd, mask_outputs=masked)
        # final-shell planes seed the next bucket (negative faces are
        # shell-reversed: their last shell is array row 0)
        prev = jnp.stack([planes6[f][:, -1 if f % 2 == 0 else 0]
                          for f in range(6)], axis=1)
        p_prev = p
        merge = _unstage_six_sum if masked else _unstage_six
        out_cube = jax.vmap(
            lambda o, *pls: merge(o, pls, n, d_lo, lo, p))(
            out_cube, *planes6)
    ar = jnp.arange(b)
    return out_cube.at[ar, c, c, c].set(cdo0)


# ---------------------------------------------------------------------------
# Grid-frame march (round 5, VERDICT r4 item 3)
#
# The per-source staging around the march kernel - the centered-cube
# dynamic_slice (phase profile: 9.4 ms at 256^3 x8) and the TWO
# transposed copies of every centered cube (16.1 ms) - scales with the
# batch, while the march kernel itself is ~16 ms.  This variant marches
# directly on SHARED grid-frame views of the neutral-density cube (the
# cube + one y-major + one z-major transpose, built ONCE per pass): the
# per-shell face planes are read at rows (s_axis +- d) mod n via
# scalar-prefetched source positions (periodic wrap = the centered
# path's roll, so the plane contents are identical), then re-centered
# in-VMEM with two nonnegative dynamic rotates.  Everything downstream
# (plane-update math, ownership masks, per-face outputs, unstage) is
# unchanged, so results are bitwise-equal to compute_columns_pallas
# wherever both run (asserted in interpret mode; hardware gate in
# validate_tpu.py).
#
# Valid when the march patch covers the whole cube (p == n, the
# full-radius production rung; radius-capped full-cube sweeps keep the
# centered path - their patches are element-offset windows BlockSpecs
# cannot express).
# ---------------------------------------------------------------------------

def _kernel_grid(sref, params_ref, seed_ref, *rest, cfg: RunConfig, n: int,
                 d_lo: int, has_lls: bool, mask_outputs: bool = False):
    # rest = 6 ndhi view refs [+ 6 lls view refs] + 6 out refs + prev
    nd_refs = rest[0:6]
    if has_lls:
        lls_refs = rest[6:12]
        out_refs = rest[12:18]
        prev_ref = rest[18]
    else:
        lls_refs = None
        out_refs = rest[6:12]
        prev_ref = rest[12]
    bi = pl.program_id(0)
    d_idx = pl.program_id(1)
    c = n // 2
    sx = sref[bi, 0]
    sy = sref[bi, 1]
    sz = sref[bi, 2]
    # grid->centered transverse rotates (NONNEGATIVE shifts only:
    # tpu.dynamic_rotate corrupts negative dynamic shifts, round 4)
    rx = (c - sx) % n
    ry = (c - sy) % n
    rz = (c - sz) % n
    # face order _FACES = [z+, z-, y+, y-, x+, x-]; transverse plane
    # dims: z faces (x,y), y faces (x,z), x faces (y,z)
    shifts = ((rx, ry), (rx, ry), (rx, rz), (rx, rz), (ry, rz), (ry, rz))

    @pl.when(d_idx == 0)
    def _():
        prev_ref[...] = seed_ref[0]

    dr = params_ref[bi, 0]
    d = d_idx + d_lo

    def centered(refs):
        return jnp.stack([
            pltpu.roll(pltpu.roll(refs[f][0], shifts[f][0], 0),
                       shifts[f][1], 1)
            for f in range(6)])

    ndhi_p = centered(nd_refs)
    lcol = centered(lls_refs) if has_lls else params_ref[bi, 1]
    new = _wavefront_plane_update(prev_ref[...], ndhi_p, lcol,
                                  d, cfg, dr, n, rowfix=True)
    if mask_outputs:
        c2 = n // 2
        ita = lax.broadcasted_iota(jnp.int32, (n, 1), 0) - c2
        itb = lax.broadcasted_iota(jnp.int32, (1, n), 1) - c2
        aa, ab = jnp.abs(ita), jnp.abs(itb)
        own = [(aa <= d) & (ab <= d), (aa <= d) & (ab <= d),
               (aa <= d) & (ab < d), (aa <= d) & (ab < d),
               (aa < d) & (ab < d), (aa < d) & (ab < d)]
        for f in range(6):
            out_refs[f][0, 0] = jnp.where(own[f], new[f], 0.0)
    else:
        for f in range(6):
            out_refs[f][0, 0] = new[f]
    prev_ref[...] = new


def _grid_face_specs(n: int, d_lo: int):
    """Six face-plane BlockSpecs over the three SHARED grid-frame cube
    views (z-major, z-major, y-major, y-major, native, native): at grid
    step di (shell d = d_lo + di), face +ax reads row (s_ax + d) mod n,
    face -ax row (s_ax - d) mod n — the periodic wrap IS the centered
    path's roll, so contents match the centered patch rows exactly (the
    one wrapped +face plane at d = n/2 is never consumed downstream,
    like the centered path's clamped edge plane)."""
    def pos(ax):
        def m(bi, di, sref):
            return ((sref[bi, ax] + d_lo + di) % n, 0, 0)
        return m

    def neg(ax):
        def m(bi, di, sref):
            return ((sref[bi, ax] - d_lo - di) % n, 0, 0)
        return m

    blk = (1, n, n)
    maps = (pos(2), neg(2), pos(1), neg(1), pos(0), neg(0))
    return [pl.BlockSpec(blk, m, memory_space=pltpu.VMEM) for m in maps]


def grid_march_available(cfg: RunConfig, max_shell: int, lls_c) -> bool:
    """Gate: full-radius patch (p == n), pallas envelope, rotate-safe
    lane-aligned mesh (same alignment family as the consume kernel)."""
    n = cfg.mesh[0]
    return (pallas_sweep_available(cfg, lls_c)
            and 2 * max_shell + 1 >= n and n % 256 == 0)


def compute_columns_pallas_grid(cfg: RunConfig, ndhi: jax.Array,
                                srcpos_b: jax.Array, sc: SweepScalars,
                                max_shell: int,
                                lls: Optional[jax.Array] = None,
                                interpret: bool = False) -> jax.Array:
    """Batched column march from the SHARED grid-frame neutral-density
    cube: (N,N,N) + (B,3) source positions -> (B,N,N,N) source-centered
    coldensh_out fields (identical output layout to
    compute_columns_pallas, so the consume kernel and unstage are
    untouched).  No per-source centering or per-source transposes."""
    b = srcpos_b.shape[0]
    n = ndhi.shape[0]
    c = n // 2
    dtype = ndhi.dtype
    has_lls = lls is not None
    sref = jnp.asarray(srcpos_b, jnp.int32)

    cdo0 = jax.vmap(lambda p: ndhi[p[0], p[1], p[2]])(sref) * (0.5 * sc.dr)
    cdo0 = cdo0.astype(dtype)
    params = jnp.stack([
        jnp.broadcast_to(sc.dr, (b,)).astype(dtype),
        jnp.broadcast_to(sc.lls_coldens, (b,)).astype(dtype),
        cdo0,
        jnp.zeros((b,), dtype),
    ], axis=1)

    def views(cube):
        # (zT, zT, yT, yT, cube, cube) — ONE transpose each, shared by
        # the whole batch (the centered path transposes per source)
        y_t = jnp.moveaxis(cube, 1, 0)               # (y, x, z)
        z_t = jnp.moveaxis(cube, 2, 0)               # (z, x, y)
        return (z_t, z_t, y_t, y_t, cube, cube)

    d_lo, d_hi = 1, min(max_shell, c)
    nd = d_hi - d_lo + 1
    seed = jnp.zeros((b, 6, n, n), dtype)
    seed = seed.at[:, :, c, c].set(cdo0[:, None])

    in_specs = [
        pl.BlockSpec((b, 4), lambda bi, di, sref: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 6, n, n), lambda bi, di, sref: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + _grid_face_specs(n, d_lo)
    inputs = [params, seed] + list(views(ndhi))
    if has_lls:
        in_specs += _grid_face_specs(n, d_lo)
        inputs += list(views(lls))

    def out_pos(bi, di, sref):
        return (bi, di, 0, 0)

    def out_neg(bi, di, sref):
        return (bi, nd - 1 - di, 0, 0)

    out_specs = [pl.BlockSpec((1, 1, n, n), m, memory_space=pltpu.VMEM)
                 for m in (out_pos, out_neg, out_pos, out_neg,
                           out_pos, out_neg)]
    out_shapes = [jax.ShapeDtypeStruct((b, nd, n, n), dtype)] * 6
    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b, nd),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((6, n, n), dtype)])
    planes6 = pl.pallas_call(
        partial(_kernel_grid, cfg=cfg, n=n, d_lo=d_lo, has_lls=has_lls,
                mask_outputs=True),
        grid_spec=gspec, out_shape=out_shapes, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024),
    )(sref, *inputs)

    out_cube = jnp.zeros((b, n, n, n), dtype)
    out_cube = jax.vmap(
        lambda o, *pls: _unstage_six_sum(o, pls, n, d_lo, 0, n))(
        out_cube, *planes6)
    ar = jnp.arange(b)
    return out_cube.at[ar, c, c, c].set(cdo0)


# ---------------------------------------------------------------------------
# Fused rate-deposition "consume" kernel (round 4)
#
# The sweep pass's non-march phases - the N^3 rate pass, the per-source
# grid-frame roll3 and the batch accumulation - were ~60% of the pass
# (BENCH_HISTORY round-4 phase profile: rate 17.6 + rolls/sum 24.0 of
# 102 ms at 256^3 x8).  This kernel runs all three as ONE program over
# grid (n rows, b sources): for output grid row i and source bi it reads
# the source's centered coldensh_out plane via a scalar-prefetch index
# map (the axis-0 roll becomes free block indexing), rotates it in-VMEM
# to grid frame (tpu.dynamic_rotate), evaluates the exponential-mixture
# rate physics of evolve0D (evolve_point.F90:151-295) with iota-derived
# offset coordinates, and accumulates into a single grid-frame phih cube
# resident in VMEM across the inner source loop.  Per-source boundary /
# LLS loss tallies accumulate in SMEM scratch.
#
# Exact-math contract: every expression replicates _rate_pass +
# _photoion_expsum_impl (ops/sweep.py, ops/tables.py) term for term, so
# per-source rates are bitwise-identical to the XLA rate pass; only the
# batch-sum order can differ (sequential fold here).
# ---------------------------------------------------------------------------

def _mixture_consts(cfg: RunConfig, tables):
    """Python-float mixture terms baked into the kernel as constants.

    Returns None when the tables are traced (abstract) - callers fall
    back to the unfused path."""
    import numpy as np
    try:
        def tup(x):
            return tuple(float(v) for v in np.asarray(x))
        a, w, hw = tup(tables.exp_a), tup(tables.exp_w), \
            tup(tables.heat_exp_w)
        if cfg.sed.use_xray_sed:
            xa, xw, xhw = (tup(tables.xray_exp_a), tup(tables.xray_exp_w),
                           tup(tables.xray_heat_exp_w))
        else:
            xa = xw = xhw = ()
        return (a, w, hw, xa, xw, xhw)
    except Exception:          # traced tables (abstract values)
        return None


def _expm1_neg(x):
    """expm1 for x <= 0, kernel-safe (Mosaic has no expm1 lowering).

    6-term Taylor for small |x| (cancellation-free; truncation rel err
    ~ x^6/5040 < 3e-9 at the 0.17 cutoff), exp(x)-1 beyond (subtraction
    rel err <= eps/|expm1(-0.17)| ~ 7.6e-7).  Within ~1e-6 relative of
    XLA's expm1 everywhere on [-80, 0] - the one deviation of the fused
    consume path from the XLA rate pass (rtol 1e-5 validation gates)."""
    t = x * (1.0 + x * (0.5 + x * (1.0 / 6.0 + x * (
        1.0 / 24.0 + x * (1.0 / 120.0 + x * (1.0 / 720.0))))))
    return jnp.where(x > -0.17, t, jnp.exp(x) - 1.0)


def _mix_terms(tau_in, dtau, a, w, hw, tau_pre, dtau_pre, want_heat):
    """One mixture evaluation, expression-for-expression the unrolled
    loop of _photoion_expsum_impl (ops/tables.py), with expm1 replaced
    by the kernel-safe _expm1_neg."""
    phi_in = jnp.zeros_like(tau_in)
    phi_cell = jnp.zeros_like(tau_in)
    heat_acc = jnp.zeros_like(tau_in) if want_heat else None
    lls_acc = jnp.zeros_like(tau_in) if dtau_pre is not None else None
    for i in range(len(a)):
        att = jnp.exp(-jnp.minimum(a[i] * tau_in, 80.0))
        absorb = att * -_expm1_neg(-jnp.minimum(a[i] * dtau, 80.0))
        phi_in = phi_in + w[i] * att
        phi_cell = phi_cell + w[i] * absorb
        if heat_acc is not None:
            heat_acc = heat_acc + hw[i] * absorb
        if lls_acc is not None:
            att_pre = jnp.exp(-jnp.minimum(a[i] * tau_pre, 80.0))
            lls_acc = lls_acc + (w[i] * att_pre) * -_expm1_neg(
                -jnp.minimum(a[i] * dtau_pre, 80.0))
    return phi_in, phi_cell, heat_acc, lls_acc


def _kernel_consume(sref, params_ref, *rest, cfg: RunConfig, n: int, b: int,
                    mix, max_shell: int, has_lls: bool, has_heat: bool,
                    use_xray: bool):
    from .. import constants as const
    from .sweep import FOURPI
    c = n // 2
    pos_max = n - 1 - c
    sigma = const.SIGMA_HI_AT_ION_FREQ
    a_t, w_t, hw_t, xa_t, xw_t, xhw_t = mix

    k = 0
    cdo_ref = rest[k]; k += 1
    nd_ref = rest[k]; k += 1
    lls_ref = rest[k] if has_lls else None
    k += 1 if has_lls else 0
    out_ref = rest[k]; k += 1
    heat_ref = rest[k] if has_heat else None
    k += 1 if has_heat else 0
    loss_ref = rest[k]; k += 1
    scratch = rest[k]

    i = pl.program_id(0)
    bi = pl.program_id(1)
    sx = sref[bi, 0]
    sy = sref[bi, 1]
    sz = sref[bi, 2]
    nf = params_ref[bi, 0]
    nfx = params_ref[bi, 1]
    dr = params_ref[bi, 2]
    rate_scale = params_ref[bi, 3]
    lls_scalar = params_ref[bi, 4]
    rmax2 = params_ref[bi, 5]
    dtype = out_ref.dtype

    # centered plane of this source at the row matching grid row i,
    # rotated in-VMEM to grid frame (the roll3 of _to_grid, done once
    # per (row, source) on a resident block).  Shifts kept NONNEGATIVE:
    # tpu.dynamic_rotate corrupts data for negative dynamic shifts on
    # some shapes (window_pallas.py gather, caught round 4)
    cdo = pltpu.roll(pltpu.roll(cdo_ref[0, 0], (sy - c) % n, 0),
                     (sz - c) % n, 1)
    ndhi = nd_ref[0]
    lcol = lls_ref[0] if has_lls else lls_scalar

    # centered offsets of grid row i / columns j,k (evolve_point.F90
    # periodic wrap, :121-124)
    oi = (i - sx + c) % n - c                              # scalar int
    oj = (lax.broadcasted_iota(jnp.int32, (n, 1), 0) - sy + c) % n - c
    ok = (lax.broadcasted_iota(jnp.int32, (1, n), 1) - sz + c) % n - c
    aoi = jnp.abs(oi)
    cheb = jnp.maximum(jnp.maximum(aoi, jnp.abs(oj)), jnp.abs(ok))
    is_src = cheb == 0

    # --- geometry, exactly _rate_pass (ops/sweep.py) ---
    dom = cheb.astype(dtype)
    safe_d = jnp.maximum(dom, 1.0)
    fi = jnp.full((1, 1), oi, dtype)
    fj = oj.astype(dtype)
    fk = ok.astype(dtype)
    dist2 = fi * fi + fj * fj + fk * fk
    t2 = dist2 - dom * dom
    path = jnp.sqrt(t2 / (safe_d * safe_d) + 1.0)
    path = jnp.where(is_src, 0.5, path)
    vol_ph = FOURPI * dist2 * path
    vol_ph = jnp.where(is_src, 1.0, vol_ph)

    colcell = ndhi * (path * dr)
    coldensh_in = jnp.maximum(cdo - colcell, 0.0)

    active = cheb <= max_shell
    stop = coldensh_in > cfg.max_coldensh
    if cfg.use_lls and cfg.type_of_lls == 3:
        stop = stop | (dist2 > rmax2)

    want_lls = cfg.use_lls and cfg.type_of_lls in (1, 2)
    if want_lls:
        cold_pre = jnp.maximum(coldensh_in - lcol * path, 0.0)
        tau_pre = cold_pre * sigma
        dtau_pre = (coldensh_in - cold_pre) * sigma
    else:
        tau_pre = dtau_pre = None
    tau_in = coldensh_in * sigma
    dtau = (cdo - coldensh_in) * sigma

    phi_in, phi_cell, heat_acc, lls_acc = _mix_terms(
        tau_in, dtau, a_t, w_t, hw_t, tau_pre, dtau_pre, has_heat)
    phi_in = nf * phi_in
    phi_cell = nf * phi_cell
    # ONE VPU divide per cell (divides were ~15% of the kernel, round-5
    # ablations): 1/(vol*ndhi) serves the gamma normalization directly
    # and recovers 1/vol with a multiply (ndhi is epsilon-floored by
    # neutral_density, so the product never divides by zero)
    inv_volnd = 1.0 / (vol_ph * ndhi)
    inv_vol = inv_volnd * ndhi
    if has_heat:
        heat_v = nf * heat_acc * inv_vol
    lls_cell = (nf * lls_acc * inv_vol) if want_lls else None
    if use_xray:
        xpi, xpc, xha, xla_ = _mix_terms(
            tau_in, dtau, xa_t, xw_t, xhw_t, tau_pre, dtau_pre, has_heat)
        phi_in = phi_in + nfx * xpi
        phi_cell = phi_cell + nfx * xpc
        if has_heat:
            heat_v = heat_v + nfx * xha * inv_vol
        if want_lls:
            lls_cell = lls_cell + nfx * xla_ * inv_vol
    phi_out = phi_in - phi_cell

    live = active & ~stop
    gamma = jnp.where(live, phi_cell * rate_scale * inv_volnd, 0.0)

    @pl.when(bi == 0)
    def _():
        out_ref[0] = gamma

    @pl.when(bi != 0)
    def _():
        out_ref[0] += gamma

    if has_heat:
        heat_dep = jnp.where(live, heat_v, 0.0) * rate_scale

        @pl.when(bi == 0)
        def _():
            heat_ref[0] = heat_dep

        @pl.when(bi != 0)
        def _():
            heat_ref[0] += heat_dep

    # boundary-of-trace photon loss (evolve_point.F90:290-295)
    p_lim = min(max_shell, pos_max)
    q_lim = min(max_shell, c)
    bnd = ((oi == p_lim) | (oi == -q_lim) | (oj == p_lim) | (oj == -q_lim)
           | (ok == p_lim) | (ok == -q_lim))

    # plain VPU reduces: an MXU ones-dot contraction was tried and
    # REVERTED — the TPU decomposes f32 matmuls into bf16 passes, which
    # put the LLS tally 2e-4 off the XLA reference (validate_tpu gates
    # at 1e-5) for no measured speedup
    loss_i = jnp.sum(jnp.where(live & bnd, phi_out * inv_vol, 0.0))
    lls_i = (jnp.sum(jnp.where(live, lls_cell, 0.0)) if want_lls
             else jnp.zeros((), dtype))

    @pl.when(i == 0)
    def _():
        scratch[bi, 0] = loss_i
        scratch[bi, 1] = lls_i

    @pl.when(i != 0)
    def _():
        scratch[bi, 0] += loss_i
        scratch[bi, 1] += lls_i

    @pl.when((i == n - 1) & (bi == b - 1))
    def _():
        for q in range(b):
            loss_ref[q, 0] = scratch[q, 0]
            loss_ref[q, 1] = scratch[q, 1]


def consume_available(cfg: RunConfig, tables, nflux_xray) -> bool:
    """Gate for the fused consume kernel: pallas backend, expsum-mode
    rates (f32), lane-aligned mesh for tpu.dynamic_rotate, concrete
    mixture tables."""
    n = cfg.mesh[0]
    f32 = cfg.jnp_dtype == jnp.float32
    expsum = cfg.rate_eval == "expsum" or (cfg.rate_eval == "auto" and f32)
    # has_heat (round 5): the round-4 "heat variant crashes at 256^3"
    # was root-caused by the round-5 bisect matrix to the non-iso TAIL
    # (thermal program), independent of the deposition path
    # (scripts/repro_noniso_256_crash.py) - the fused heat deposition
    # itself validates on hardware (validate_thermal_tpu), so the gate
    # is per-path no longer
    return (cfg.sweep_backend == "pallas" and expsum
            and n % 256 == 0 and n <= 600
            and _mixture_consts(cfg, tables) is not None)


def consume_rates_pallas(cfg: RunConfig, tables, cdo_b: jax.Array,
                         ndhi: jax.Array, lls_grid, srcpos_b: jax.Array,
                         nflux_b: jax.Array, nfx_b, sc: SweepScalars,
                         max_shell: int, interpret: bool = False):
    """Fused rate deposition: centered column cubes -> ONE grid-frame
    phih (+phiheat) cube summed over the batch, plus per-source loss
    tallies.  Replaces [vmap(_rate_pass) -> vmap(roll3) -> sum(axis=0)].

    cdo_b: (b, n, n, n) source-centered coldensh_out cubes.
    ndhi / lls_grid: SHARED grid-frame fields (no per-source copies).
    Returns (phih, phiheat, loss_b, lls_loss_b).
    """
    b, n = cdo_b.shape[0], cdo_b.shape[1]
    c = n // 2
    dtype = cdo_b.dtype
    mix = _mixture_consts(cfg, tables)
    has_lls = (lls_grid is not None and cfg.use_lls
               and cfg.type_of_lls in (1, 2))
    has_heat = not cfg.isothermal
    use_xray = cfg.sed.use_xray_sed and nfx_b is not None
    if nfx_b is None:
        nfx_b = jnp.zeros_like(nflux_b)

    params = jnp.stack([
        nflux_b.astype(dtype), nfx_b.astype(dtype),
        jnp.broadcast_to(sc.dr, (b,)).astype(dtype),
        jnp.broadcast_to(sc.rate_scale, (b,)).astype(dtype),
        jnp.broadcast_to(sc.lls_coldens, (b,)).astype(dtype),
        jnp.broadcast_to(sc.rmax2_cells, (b,)).astype(dtype),
    ], axis=1)

    in_specs = [
        pl.BlockSpec((b, 6), lambda i, bi, sref: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n, n),
                     lambda i, bi, sref: (bi, (i - sref[bi, 0] + n // 2) % n,
                                          0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, n), lambda i, bi, sref: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [params, cdo_b, ndhi]
    if has_lls:
        in_specs.append(pl.BlockSpec((1, n, n),
                                     lambda i, bi, sref: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(lls_grid)

    out_specs = [pl.BlockSpec((1, n, n), lambda i, bi, sref: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((n, n, n), dtype)]
    if has_heat:
        out_specs.append(pl.BlockSpec((1, n, n),
                                      lambda i, bi, sref: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((n, n, n), dtype))
    out_specs.append(pl.BlockSpec((b, 2), lambda i, bi, sref: (0, 0),
                                  memory_space=pltpu.SMEM))
    out_shapes.append(jax.ShapeDtypeStruct((b, 2), dtype))

    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n, b),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((b, 2), dtype)])
    outs = pl.pallas_call(
        partial(_kernel_consume, cfg=cfg, n=n, b=b, mix=mix,
                max_shell=max_shell, has_lls=has_lls, has_heat=has_heat,
                use_xray=use_xray),
        grid_spec=gspec, out_shape=out_shapes, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024),
    )(jnp.asarray(srcpos_b, jnp.int32), *inputs)
    phih = outs[0]
    heat = outs[1] if has_heat else jnp.zeros((), dtype)
    loss2 = outs[-1]
    return phih, heat, loss2[:, 0], loss2[:, 1]


def pallas_sweep_available(cfg: RunConfig, lls_c) -> bool:
    n = cfg.mesh[0]
    plane_stack = 6 * n * n * 4        # one (6,N,N) f32 face stack
    # resident stacks: prev scratch + ~2x in + ~2x out pipeline buffers,
    # plus ~2x in for the LLS face planes when a type-2 grid is swept
    stacks = 5 + (2 if lls_c is not None else 0)
    # v5e VMEM is 128 MiB (vmem_limit_bytes 120 MiB); plane stacks +
    # fixup intermediates need ~31 MiB at 512^3 / ~43 MiB at 600^3
    # without LLS (hardware-validated bitwise round 2, incl. grid LLS
    # at 512^3); cap the mesh at the validated 600^3 envelope
    return (cfg.sweep_backend == "pallas"
            and plane_stack * stacks < 62 * 1024 * 1024
            and n <= 600)

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RunConfig
from .sweep import SweepScalars, _wavefront_plane_update


def _kernel(params_ref, seed_ref, *rest, cfg: RunConfig, n: int,
            d_lo: int, has_lls: bool):
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
                  d_lo: int, p: int, nd: int):
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
        partial(_kernel, cfg=cfg, n=p, d_lo=d_lo, has_lls=has_lls),
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
                                d_lo, p, nd)
        # final-shell planes seed the next bucket (negative faces are
        # shell-reversed: their last shell is array row 0)
        prev = jnp.stack([planes6[f][:, -1 if f % 2 == 0 else 0]
                          for f in range(6)], axis=1)
        p_prev = p
        out_cube = jax.vmap(
            lambda o, *pls: _unstage_six(o, pls, n, d_lo, lo, p))(
            out_cube, *planes6)
    ar = jnp.arange(b)
    return out_cube.at[ar, c, c, c].set(cdo0)


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

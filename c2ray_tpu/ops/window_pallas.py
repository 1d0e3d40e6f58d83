"""Pallas aligned-block DMA window gather / scatter-add (round 4,
VERDICT item 3).

The windowed many-source path (ops/sweep.py raytrace_windowed — the TPU
form of the reference's subboxes, evolve_source.F90:128-212) was
index-throughput-bound: the vmapped dynamic_slice window gather lowers
to an XLA gather and the mod-N `.at[idx].add` scatter-add runs at the
platform's ~60-135M elem/s index engine (BENCH_HISTORY round-2 study:
gather 15.1 ms + scatter 22.0 ms of a ~60 ms 256-window batch).

Both are really *block copies*, but Mosaic's HBM memrefs are
(8,128)-tiled: a (p,p,p) slice at arbitrary offsets is not DMA-able
(p=17 breaks tile alignment — observed `tpu.memref_slice` reject).
The kernels therefore move TILE-ALIGNED blocks that COVER the window —
shape (p, ceil8(p+7), ceil128(p+127)) at offsets rounded down to tile
boundaries (axis 0 is untiled, so its offset stays exact) — and handle
the sub-tile residuals in VMEM with dynamic rotates:

  * gather: DMA the covering block, rotate by (-q1%8, -q2%128), take
    the static (p,p,p) corner.
  * scatter: zero-pad the rates to the block shape, rotate by
    (+q1%8, +q2%128), then block-DMA read-modify-write.  The TPU grid
    is sequential, so overlapping windows are ordered.

The covering block moves ~4x the window's bytes — still ~100x less
work than the per-element index engine.

Wraparound is handled OUTSIDE the kernels: rates accumulate into a
PADDED (n+2r)-extent grid (windows never wrap in padded coordinates;
both tiled axes carry an extra tile margin so covering blocks stay in
bounds for ANY n, r) and the pad ring is folded back mod-N once per
sweep pass (fold_padded_acc).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _block_dims(p: int) -> Tuple[int, int]:
    """Covering-block extents for the two tiled axes: from any in-tile
    residual (0-7 sublanes, 0-127 lanes) the p window rows/lanes fit."""
    return _ceil_to(p + 7, 8), _ceil_to(p + 127, 128)


def lane_extent(n: int, r: int) -> int:
    """Logical lane-axis (last dim) extent the padded field/accumulator
    needs so every covering block stays in bounds: aligned start for the
    largest corner (n-1) plus the lane block."""
    p = 2 * r + 1
    _, lb = _block_dims(p)
    return max(n + 2 * r, 128 * ((n - 1) // 128) + lb)


def sublane_extent(n: int, r: int) -> int:
    """Sublane-axis (axis 1) extent so every covering block stays in
    bounds: the aligned start for the largest corner (n-1) plus the
    sublane block.  Equals n+2r only when n%8==0 and r%4==0 — for any
    other mesh/radius the covering block would run past the (n+2r)
    padded extent (advisor round-4 high finding: OOB DMA at e.g. r=6)."""
    p = 2 * r + 1
    sb, _ = _block_dims(p)
    return max(n + 2 * r, 8 * ((n - 1) // 8) + sb)


def with_lane_margin(field_pad: Array, n: int, r: int) -> Array:
    """Zero-extend the (n+2r)^3 padded field's tiled axes to
    sublane_extent/lane_extent (margin rows/lanes are never consumed —
    gathers only read the (p,p,p) corner, scatters add zeros there)."""
    m1 = sublane_extent(n, r) - field_pad.shape[1]
    m2 = lane_extent(n, r) - field_pad.shape[-1]
    if m1 <= 0 and m2 <= 0:
        return field_pad
    return jnp.pad(field_pad,
                   ((0, 0), (0, max(m1, 0)), (0, max(m2, 0))))


def _gather_kernel(sref, field_ref, out_ref, scratch, sem, *, p, sb, lb):
    bi = pl.program_id(0)
    q0 = sref[bi, 0]
    q1 = sref[bi, 1]
    q2 = sref[bi, 2]
    a1 = (q1 // 8) * 8
    a2 = (q2 // 128) * 128
    cp = pltpu.make_async_copy(
        field_ref.at[pl.ds(q0, p), pl.ds(a1, sb), pl.ds(a2, lb)],
        scratch, sem)
    cp.start()
    cp.wait()
    # backward roll expressed with NONNEGATIVE shifts: tpu.dynamic_rotate
    # silently corrupts data for negative dynamic shift values on
    # hardware (caught by the validate_tpu windowed gate, round 4 - the
    # interpret-mode emulation handles negatives, so only the on-chip
    # gate sees it)
    blk = pltpu.roll(scratch[...], (sb - (q1 - a1)) % sb, 1)
    blk = pltpu.roll(blk, (lb - (q2 - a2)) % lb, 2)
    out_ref[0] = blk[:, 0:p, 0:p]


def window_gather(field_pad: Array, pos: Array, radius: int,
                  interpret: bool = False) -> Array:
    """(b, p, p, p) windows of the (lane-margined) padded field, one
    covering-block DMA + two VMEM rotates per window.  pos is in grid
    coords (window corner = pos in padded coords)."""
    b = pos.shape[0]
    p = 2 * radius + 1
    sb, lb = _block_dims(p)
    dtype = field_pad.dtype
    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, p, p, p), lambda bi, sref: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((p, sb, lb), dtype),
                        pltpu.SemaphoreType.DMA])
    return pl.pallas_call(
        partial(_gather_kernel, p=p, sb=sb, lb=lb),
        grid_spec=gspec, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((b, p, p, p), dtype),
    )(jnp.asarray(pos, jnp.int32), field_pad)


def _scatter_kernel(sref, rates_ref, acc_any, out_any, scratch, sem_in,
                    sem_out, *, p, sb, lb):
    bi = pl.program_id(0)
    q0 = sref[bi, 0]
    q1 = sref[bi, 1]
    q2 = sref[bi, 2]
    a1 = (q1 // 8) * 8
    a2 = (q2 // 128) * 128
    dst = out_any.at[pl.ds(q0, p), pl.ds(a1, sb), pl.ds(a2, lb)]
    cp_in = pltpu.make_async_copy(dst, scratch, sem_in)
    cp_in.start()
    cp_in.wait()
    # place the (p,p,p) rates at the window's in-block residual: zero
    # pad to the block shape, then rotate into position (margins stay
    # exactly zero, so the read-modify-write adds nothing outside the
    # window)
    blk = jnp.pad(rates_ref[0], ((0, 0), (0, sb - p), (0, lb - p)))
    blk = pltpu.roll(blk, q1 - a1, 1)
    blk = pltpu.roll(blk, q2 - a2, 2)
    scratch[...] += blk
    cp_out = pltpu.make_async_copy(scratch, dst, sem_out)
    cp_out.start()
    cp_out.wait()


def window_scatter_add(acc_pad: Array, rates: Array, pos: Array,
                       interpret: bool = False) -> Array:
    """acc_pad[pos_i : pos_i+p, ...] += rates_i for every window, as
    sequential covering-block DMA read-modify-writes (duplicates and
    overlaps sum correctly because the TPU grid is sequential).
    acc_pad must carry the lane margin (see lane_extent) and is donated.
    """
    b, p = rates.shape[0], rates.shape[1]
    sb, lb = _block_dims(p)
    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b,),
        in_specs=[pl.BlockSpec((1, p, p, p), lambda bi, sref: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((p, sb, lb), rates.dtype),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA])
    return pl.pallas_call(
        partial(_scatter_kernel, p=p, sb=sb, lb=lb),
        grid_spec=gspec, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct(acc_pad.shape, acc_pad.dtype),
        # operand indices count the scalar-prefetch arg: 0=pos, 1=rates,
        # 2=acc_pad (donated into the output)
        input_output_aliases={2: 0},
    )(jnp.asarray(pos, jnp.int32), rates, acc_pad)


def padded_acc_shape(n: int, r: int) -> Tuple[int, int, int]:
    """Accumulator allocation for the DMA scatter path (both tiled axes
    carry the covering-block margin)."""
    return (n + 2 * r, sublane_extent(n, r), lane_extent(n, r))


def fold_padded_acc(acc_pad: Array, n: int, radius: int,
                    axes: Tuple[int, ...] = (0, 1, 2)) -> Array:
    """Fold the r-wide pad ring of a padded accumulator back into the
    (n,n,n) grid with periodic wrapping — the once-per-pass companion of
    window_scatter_add (replaces the per-batch mod-N scatter indices).
    Lane margins beyond n+2r (always zero) are dropped first.

    `axes` selects which axes fold locally: the halo-sharded windowed
    sweep folds axes (1, 2) only, its axis-0 slab overflow strips ride a
    ring ppermute instead (parallel/domain.py)."""
    r = radius
    if r == 0:
        return acc_pad
    sl0 = [slice(None)] * 3
    for ax in axes:
        sl0[ax] = slice(0, n + 2 * r)
    a = acc_pad[tuple(sl0)]
    # fold axis by axis: low pad adds to the high end, high pad to the low
    for ax in axes:
        sl = [slice(None)] * 3

        def take(lo, hi):
            s = list(sl)
            s[ax] = slice(lo, hi)
            return a[tuple(s)]

        core = take(r, a.shape[ax] - r)
        lo_pad = take(0, r)
        hi_pad = take(a.shape[ax] - r, a.shape[ax])
        m = core.shape[ax]
        idx_hi = [slice(None)] * 3
        idx_hi[ax] = slice(m - r, m)
        idx_lo = [slice(None)] * 3
        idx_lo[ax] = slice(0, r)
        core = core.at[tuple(idx_hi)].add(lo_pad)
        core = core.at[tuple(idx_lo)].add(hi_pad)
        a = core
    return a


def window_dma_available(cfg, radius: int) -> bool:
    """Gate: TPU pallas backend only (the XLA gather/scatter path stays
    the CPU/test reference)."""
    return cfg.sweep_backend == "pallas" and cfg.window_sweep

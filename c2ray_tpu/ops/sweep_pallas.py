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

Handles both scalar LLS models and the type-2 LLS grid (staged face-major
and streamed as a second VMEM input).  Mesh cap: the validated 600^3
envelope (pallas_sweep_available) - the reference's production mesh
options run to 600^3 on one chip (sizes.f90:30-71).

STATUS: production on TPU (bench.py --backend auto selects it).  The
round-1 miscompare was root-caused to XLA:TPU host-side bugs, not the
kernel: (a) reversed-stride slice updates under vmap with batch >= 4
corrupt _unstage_faces/_stage_faces outputs (fixed: standalone flips +
forward-stride regions), and (b) concatenating a zero shell-0 plane onto
the kernel's custom-call output triggers a concat+DUS fusion miscompile
at batch >= 4 (fixed: _unstage_faces consumes d>=1 planes directly).
Validated bitwise against single-source sweeps at the full bench
configuration (N=256, batch 16, scalar LLS) on hardware
(scripts/validate_tpu.py); 1.08e9 cell-source updates/s per v5e chip.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RunConfig
from .sweep import SweepScalars, _stage_faces_patch, _unstage_patch, \
    _wavefront_plane_update


def _kernel(params_ref, seed_ref, ndhi_ref, *rest, cfg: RunConfig, n: int,
            d_lo: int, k: int, has_lls: bool):
    if has_lls:
        lls_ref, out_ref, prev_ref = rest
    else:
        out_ref, prev_ref = rest
    bi = pl.program_id(0)
    d_idx = pl.program_id(1)

    @pl.when(d_idx == 0)
    def _():
        # bucket-entry state: the source cell's half-cell column for the
        # first bucket (evolve_point.F90:151-160), the previous bucket's
        # final planes (center-padded to this patch) otherwise
        prev_ref[...] = seed_ref[0]

    dr = params_ref[bi, 0]
    # k shells per grid step (see MARCH_K_CAP: measured neutral on this
    # stack - the march is DMA/VPU work-bound - but kept for stacks
    # where per-step latency dominates)
    prev = prev_ref[...]
    for j in range(k):
        d = d_idx * k + j + d_lo       # shell number
        # grid LLS (type 2): the staged (6,p,p) LLS column planes at
        # shell d, exactly as the XLA backends (LLS.F90:199-210)
        lcol = lls_ref[0, j] if has_lls else params_ref[bi, 1]
        # rowfix: inside the fused kernel the wedge fixups extract only
        # the consumed |t|=d vectors (10 one-hot matvecs, ~10 p^2 MACs)
        # instead of full-plane mirror contractions (~9 p^3 MACs at
        # HIGHEST) - bitwise-identical planes, ~400x less MXU work
        prev = _wavefront_plane_update(prev, ndhi_ref[0, j], lcol,
                                       d, cfg, dr, n, rowfix=True)
        out_ref[0, j] = prev
    prev_ref[...] = prev


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


# Shells per grid step.  Measured at 256^3 x16 sources: k=8 gives the
# same march time as k=1 (109 vs 105 ms) - the march is DMA/VPU
# work-bound, not invocation-latency-bound - while quadrupling compile
# time (63 s vs 16 s, the kernel body unrolls k plane updates).  Default
# 1; the k machinery stays (tested) for stacks where latency dominates.
MARCH_K_CAP = 1


def _march_k(p: int, nd: int, has_lls: bool) -> int:
    """Shells per grid step, bounded by the revolving-buffer VMEM
    footprint ((2 in + 2 out [+2 lls]) x k x 6p^2 f32 within ~48 MiB)."""
    stacks = 6 if has_lls else 4
    k_vmem = (48 * 1024 * 1024) // (stacks * 6 * p * p * 4)
    return max(1, min(MARCH_K_CAP, k_vmem, nd))


def _march_bucket(cfg: RunConfig, params, seed, ndhi_f, lls_f,
                  d_lo: int, p: int):
    """One pallas_call over (batch, shell blocks of this bucket)."""
    b, nd = ndhi_f.shape[0], ndhi_f.shape[1]
    dtype = ndhi_f.dtype
    has_lls = lls_f is not None
    k = _march_k(p, nd, has_lls)
    nblk = -(-nd // k)
    pad = nblk * k - nd
    if pad:
        # edge-pad the shell axis; the padded steps compute garbage planes
        # that are sliced off below (prev carry ends at the last real
        # shell only if padding is at the END - it is, and the final
        # bucket's carry consumer (the next bucket) is sliced the same)
        widths = ((0, 0), (0, pad)) + ((0, 0),) * 3
        ndhi_f = jnp.pad(ndhi_f, widths, mode="edge")
        if has_lls:
            lls_f = jnp.pad(lls_f, widths, mode="edge")
    face_spec = pl.BlockSpec((1, k, 6, p, p),
                             lambda bi, di: (bi, di, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        # whole params array resident in SMEM; indexed by program id
        pl.BlockSpec((b, 4), lambda bi, di: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 6, p, p), lambda bi, di: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        face_spec,
    ]
    inputs = [params, seed, ndhi_f]
    if has_lls:
        in_specs.append(face_spec)
        inputs.append(lls_f)
    out = pl.pallas_call(
        partial(_kernel, cfg=cfg, n=p, d_lo=d_lo, k=k, has_lls=has_lls),
        grid=(b, nblk),
        in_specs=in_specs,
        out_specs=face_spec,
        out_shape=jax.ShapeDtypeStruct((b, nblk * k, 6, p, p), dtype),
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
    return out[:, :nd] if pad else out


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
    (type-2 LLS, LLS.F90:214-316); staged face-major alongside ndhi and
    streamed into the kernel as a second VMEM input.
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

    ladder = _march_ladder(max_shell, n)
    out_cube = jnp.zeros((b, n, n, n), dtype)
    prev = None                      # (B, 6, p_prev, p_prev) final planes
    p_prev = 0
    for (d_lo, d_hi, p) in ladder:
        lo = c - (p // 2)
        ndhi_f = jax.vmap(
            lambda x: _stage_faces_patch(x, d_lo, d_hi, lo, p))(ndhi_cb)
        lls_f = (jax.vmap(
            lambda x: _stage_faces_patch(x, d_lo, d_hi, lo, p))(lls_cb)
            if has_lls else None)
        if prev is None:
            # shell-0 state: zeros + the source cell's half-cell column
            seed = jnp.zeros((b, 6, p, p), dtype)
            seed = seed.at[:, :, p // 2, p // 2].set(cdo0[:, None])
        else:
            off = p // 2 - p_prev // 2
            seed = jnp.pad(prev, ((0, 0), (0, 0),
                                  (off, p - p_prev - off),
                                  (off, p - p_prev - off)))
        planes = _march_bucket(cfg, params, seed, ndhi_f, lls_f, d_lo, p)
        prev = planes[:, -1]
        p_prev = p
        out_cube = jax.vmap(
            lambda o, pb: _unstage_patch(o, pb, n, d_lo, lo, p))(
            out_cube, planes)
    ar = jnp.arange(b)
    return out_cube.at[ar, c, c, c].set(cdo0)


def pallas_sweep_available(cfg: RunConfig, lls_c) -> bool:
    n = cfg.mesh[0]
    plane_stack = 6 * n * n * 4        # one (6,N,N) f32 face stack
    # resident stacks: prev scratch + ~2x in + ~2x out pipeline buffers,
    # plus ~2x in for the staged LLS faces when a type-2 grid is swept
    stacks = 5 + (2 if lls_c is not None else 0)
    # v5e VMEM is 128 MiB (vmem_limit_bytes 120 MiB); plane stacks +
    # fixup intermediates need ~31 MiB at 512^3 / ~43 MiB at 600^3
    # without LLS (hardware-validated bitwise round 2, incl. grid LLS
    # at 512^3); cap the mesh at the validated 600^3 envelope
    return (cfg.sweep_backend == "pallas"
            and plane_stack * stacks < 62 * 1024 * 1024
            and n <= 600)

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
and streamed as a second VMEM input).  Mesh cap: the validated 512^3
envelope (pallas_sweep_available).

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
from .sweep import SweepScalars, _stage_faces, _unstage_faces, \
    _wavefront_plane_update


def _kernel(params_ref, ndhi_ref, *rest, cfg: RunConfig, n: int,
            has_lls: bool):
    if has_lls:
        lls_ref, out_ref, prev_ref = rest
    else:
        out_ref, prev_ref = rest
    bi = pl.program_id(0)
    d_idx = pl.program_id(1)
    d = d_idx + 1                      # shell number
    c = n // 2

    @pl.when(d_idx == 0)
    def _():
        # shell-0 state: zeros + the source cell's half-cell column
        # (evolve_point.F90:151-160)
        prev_ref[...] = jnp.zeros_like(prev_ref)
        prev_ref[:, c, c] = jnp.full((6,), params_ref[bi, 2],
                                     prev_ref.dtype)

    dr = params_ref[bi, 0]
    # grid LLS (type 2): the staged (6,N,N) LLS column planes at shell d,
    # added per-cell exactly as the XLA backends do (LLS.F90:199-210)
    lcol = lls_ref[0, 0] if has_lls else params_ref[bi, 1]
    # rowfix: inside the fused kernel the wedge fixups extract only the
    # consumed |t|=d vectors (10 one-hot matvecs, ~10 N^2 MACs) instead
    # of full-plane mirror contractions (~9 N^3 MACs at HIGHEST) -
    # bitwise-identical planes, ~400x less MXU work per shell
    newp = _wavefront_plane_update(prev_ref[...], ndhi_ref[0, 0], lcol,
                                   d, cfg, dr, n, rowfix=True)
    out_ref[0, 0] = newp
    prev_ref[...] = newp


def compute_columns_pallas(cfg: RunConfig, ndhi_cb: jax.Array,
                           sc: SweepScalars, max_shell: int,
                           lls_cb: Optional[jax.Array] = None) -> jax.Array:
    """Batched column march: (B,N,N,N) source-centered neutral densities ->
    (B,N,N,N) coldensh_out fields.

    lls_cb: optional (B,N,N,N) source-centered LLS column-density grids
    (type-2 LLS, LLS.F90:214-316); staged face-major alongside ndhi and
    streamed into the kernel as a second VMEM input.
    """
    b, n = ndhi_cb.shape[0], ndhi_cb.shape[1]
    c = n // 2
    dtype = ndhi_cb.dtype
    has_lls = lls_cb is not None

    ndhi_faces = jax.vmap(lambda x: _stage_faces(x, max_shell))(ndhi_cb)
    cdo0 = ndhi_cb[:, c, c, c] * (0.5 * sc.dr)
    params = jnp.stack([
        jnp.broadcast_to(sc.dr, (b,)).astype(dtype),
        jnp.broadcast_to(sc.lls_coldens, (b,)).astype(dtype),
        cdo0.astype(dtype),
        jnp.zeros((b,), dtype),
    ], axis=1)                                       # (B, 4)

    face_spec = pl.BlockSpec((1, 1, 6, n, n),
                             lambda bi, di: (bi, di + 1, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        # whole params array resident in SMEM; indexed by program id
        pl.BlockSpec((b, 4), lambda bi, di: (0, 0),
                     memory_space=pltpu.SMEM),
        face_spec,
    ]
    inputs = [params, ndhi_faces]
    if has_lls:
        in_specs.append(face_spec)
        inputs.append(jax.vmap(lambda x: _stage_faces(x, max_shell))(lls_cb))

    grid = (b, max_shell)
    out = pl.pallas_call(
        partial(_kernel, cfg=cfg, n=n, has_lls=has_lls),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 6, n, n),
                               lambda bi, di: (bi, di, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, max_shell, 6, n, n), dtype),
        scratch_shapes=[pltpu.VMEM((6, n, n), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the exact (precision=HIGHEST) one-hot mirror contractions in
            # the wedge fixups need more kernel stack than the default
            # 16 MiB scoped-vmem budget at N=256 (measured 19.8 MiB);
            # 512^3 plane stacks (6.3 MiB each, ~5 live) need most of the
            # 128 MiB v5e VMEM
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*inputs)

    # out holds planes for shells d = 1..max_shell; _unstage_faces consumes
    # them directly (concatenating a zero shell-0 plane in front triggers
    # an XLA:TPU concat+DUS fusion miscompile on custom-call outputs at
    # batch >= 4 - the shell-0 plane is pure padding anyway)
    return jax.vmap(_unstage_faces, in_axes=(0, None, 0))(out, n, cdo0)


def pallas_sweep_available(cfg: RunConfig, lls_c) -> bool:
    n = cfg.mesh[0]
    plane_stack = 6 * n * n * 4        # one (6,N,N) f32 face stack
    # resident stacks: prev scratch + ~2x in + ~2x out pipeline buffers,
    # plus ~2x in for the staged LLS faces when a type-2 grid is swept
    stacks = 5 + (2 if lls_c is not None else 0)
    # v5e VMEM is 128 MiB (vmem_limit_bytes 120 MiB); the 512^3 mesh needs
    # ~31 MiB of plane stacks + fixup intermediates without LLS, ~44 MiB
    # with (both validated on hardware round 2); cap the mesh at the
    # validated 512^3 envelope
    return (cfg.sweep_backend == "pallas"
            and plane_stack * stacks < 62 * 1024 * 1024
            and n <= 560)

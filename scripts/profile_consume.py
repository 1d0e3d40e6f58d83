"""Ablation profile of the fused consume kernel on hardware.

BENCH_HISTORY round-5 puts consume at ~3.9 ms/source at 256^3 vs an
estimated ~2 ms/source exponential-mixture VPU floor.  This script times
ablated variants of _kernel_consume (same grid/BlockSpec structure, one
piece of in-kernel work removed per variant) to attribute the gap:

  full        the production kernel (consume_rates_pallas)
  no_rolls    skip the two in-VMEM tpu rolls (wrong frame, same flops)
  no_loss     skip the boundary/LLS scalar reductions
  no_mix      mixture replaced by one multiply (isolates transcendentals)
  mix_only    mixture on raw planes, no geometry recompute
  one_term    1 mixture term instead of the full set

Usage: python scripts/profile_consume.py [--mesh 256] [--sources 16]
"""

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=256)
    ap.add_argument("--sources", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from c2ray_tpu.config import test_problem_config
    from c2ray_tpu.ops.sweep import SweepScalars, FOURPI
    from c2ray_tpu.ops import sweep_pallas as sp
    from c2ray_tpu.ops.tables import build_rad_tables
    from c2ray_tpu import constants as const

    n = args.mesh
    b = args.sources
    c = n // 2
    cfg = test_problem_config(mesh=n, dtype="float32", use_lls=False,
                              cosmological=False,
                              sweep_backend="pallas", source_batch=b)
    tables = build_rad_tables(cfg)
    mix = sp._mixture_consts(cfg, tables)
    print(f"mixture terms: {len(mix[0])}")
    rng = np.random.default_rng(0)
    srcpos = jnp.asarray(rng.integers(0, n, (b, 3)).astype(np.int32))
    nflux = jnp.asarray((10.0 ** rng.uniform(6, 9, b)).astype(np.float32))
    sc = SweepScalars(dr=jnp.float32(2.9e24 / (n / 64)),
                      rate_scale=jnp.float32(cfg.sed.s_star),
                      lls_coldens=jnp.float32(0.0),
                      rmax2_cells=jnp.float32(0.0))
    cdo_b = jnp.asarray(
        rng.uniform(1e17, 1e19, (b, n, n, n)).astype(np.float32))
    ndhi = jnp.full((n, n, n), np.float32(1.98e-4))
    max_shell = c
    sigma = const.SIGMA_HI_AT_ION_FREQ
    a_t, w_t, hw_t = mix[0], mix[1], mix[2]

    # ---- ablated kernel (structure copied from sp._kernel_consume,
    # isothermal / no-LLS / no-xray specialization) ----
    def kern(sref, params_ref, cdo_ref, nd_ref, out_ref, loss_ref, scratch,
             *, do_rolls, do_loss, mix_mode, do_geom):
        i = pl.program_id(0)
        bi = pl.program_id(1)
        sx = sref[bi, 0]
        sy = sref[bi, 1]
        sz = sref[bi, 2]
        nf = params_ref[bi, 0]
        dr = params_ref[bi, 2]
        rate_scale = params_ref[bi, 3]
        dtype = out_ref.dtype

        if do_rolls:
            cdo = pltpu.roll(pltpu.roll(cdo_ref[0, 0], (sy - c) % n, 0),
                             (sz - c) % n, 1)
        else:
            cdo = cdo_ref[0, 0]
        nd_p = nd_ref[0]

        if do_geom:
            oi = (i - sx + c) % n - c
            oj = (lax.broadcasted_iota(jnp.int32, (n, 1), 0) - sy + c) % n - c
            ok = (lax.broadcasted_iota(jnp.int32, (1, n), 1) - sz + c) % n - c
            aoi = jnp.abs(oi)
            cheb = jnp.maximum(jnp.maximum(aoi, jnp.abs(oj)), jnp.abs(ok))
            is_src = cheb == 0
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
            live = (cheb <= max_shell) & ~(cdo > cfg.max_coldensh)
            bnd_lim_p = min(max_shell, n - 1 - c)
            bnd_lim_q = min(max_shell, c)
            bnd = ((oi == bnd_lim_p) | (oi == -bnd_lim_q)
                   | (oj == bnd_lim_p) | (oj == -bnd_lim_q)
                   | (ok == bnd_lim_p) | (ok == -bnd_lim_q))
        else:
            path = jnp.ones((n, n), dtype)
            vol_ph = jnp.full((n, n), FOURPI, dtype)
            live = jnp.ones((n, n), bool)
            bnd = jnp.zeros((n, n), bool)

        colcell = nd_p * (path * dr)
        coldensh_in = jnp.maximum(cdo - colcell, 0.0)
        tau_in = coldensh_in * sigma
        dtau = (cdo - coldensh_in) * sigma

        if mix_mode == "full":
            terms = range(len(a_t))
        elif mix_mode == "one":
            terms = range(1)
        else:
            terms = ()
        phi_in = jnp.zeros_like(tau_in)
        phi_cell = jnp.zeros_like(tau_in)
        for t in terms:
            att = jnp.exp(-jnp.minimum(a_t[t] * tau_in, 80.0))
            absorb = att * -sp._expm1_neg(-jnp.minimum(a_t[t] * dtau, 80.0))
            phi_in = phi_in + w_t[t] * att
            phi_cell = phi_cell + w_t[t] * absorb
        if mix_mode == "none":
            phi_in = tau_in
            phi_cell = dtau * 1e-3
        phi_in = nf * phi_in
        phi_cell = nf * phi_cell
        phi_out = phi_in - phi_cell
        photo_cell = phi_cell / vol_ph
        gamma = jnp.where(live, photo_cell * rate_scale / nd_p, 0.0)

        @pl.when(bi == 0)
        def _():
            out_ref[0] = gamma

        @pl.when(bi != 0)
        def _():
            out_ref[0] += gamma

        if do_loss:
            loss_i = jnp.sum(jnp.where(live & bnd, phi_out / vol_ph, 0.0))

            @pl.when(i == 0)
            def _():
                scratch[bi, 0] = loss_i
                scratch[bi, 1] = jnp.zeros((), dtype)

            @pl.when(i != 0)
            def _():
                scratch[bi, 0] += loss_i

            @pl.when((i == n - 1) & (bi == b - 1))
            def _():
                for q in range(b):
                    loss_ref[q, 0] = scratch[q, 0]
                    loss_ref[q, 1] = scratch[q, 1]
        else:
            @pl.when((i == n - 1) & (bi == b - 1))
            def _():
                for q in range(b):
                    loss_ref[q, 0] = jnp.zeros((), dtype)
                    loss_ref[q, 1] = jnp.zeros((), dtype)

    def build(**flags):
        params = jnp.stack([
            nflux.astype(jnp.float32), jnp.zeros((b,), jnp.float32),
            jnp.broadcast_to(sc.dr, (b,)).astype(jnp.float32),
            jnp.broadcast_to(sc.rate_scale, (b,)).astype(jnp.float32),
            jnp.broadcast_to(sc.lls_coldens, (b,)).astype(jnp.float32),
            jnp.broadcast_to(sc.rmax2_cells, (b,)).astype(jnp.float32),
        ], axis=1)
        in_specs = [
            pl.BlockSpec((b, 6), lambda i, bi, sref: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n, n),
                         lambda i, bi, sref: (bi, (i - sref[bi, 0] + c) % n,
                                              0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i, bi, sref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, n, n), lambda i, bi, sref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 2), lambda i, bi, sref: (0, 0),
                         memory_space=pltpu.SMEM)]
        out_shapes = [jax.ShapeDtypeStruct((n, n, n), jnp.float32),
                      jax.ShapeDtypeStruct((b, 2), jnp.float32)]
        gspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n, b),
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[pltpu.SMEM((b, 2), jnp.float32)])

        @jax.jit
        def run(cdo_b, ndhi):
            return pl.pallas_call(
                partial(kern, **flags),
                grid_spec=gspec, out_shape=out_shapes,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(srcpos, params, cdo_b, ndhi)
        return run

    from c2ray_tpu.ops.sweep_pallas import consume_rates_pallas

    @jax.jit
    def prod(cdo_b, ndhi):
        return consume_rates_pallas(cfg, tables, cdo_b, ndhi, None,
                                    srcpos, nflux, None, sc, max_shell)

    def timed(name, fn):
        r = fn(cdo_b, ndhi)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(args.iters):
            r = fn(cdo_b, ndhi)
        jax.block_until_ready(r)
        ms = (time.time() - t0) / args.iters * 1e3
        print(f"  {name:28s} {ms:8.2f} ms  ({ms / b:.3f} ms/src)")
        return ms

    print(f"consume ablations  mesh={n}^3  b={b}  "
          f"platform={jax.devices()[0].platform}")
    timed("production kernel", prod)
    base = dict(do_rolls=True, do_loss=True, mix_mode="full", do_geom=True)
    timed("full (ablation copy)", build(**base))
    timed("no_rolls", build(**{**base, "do_rolls": False}))
    timed("no_loss", build(**{**base, "do_loss": False}))
    timed("no_mix", build(**{**base, "mix_mode": "none"}))
    timed("one_term", build(**{**base, "mix_mode": "one"}))
    timed("no_geom", build(**{**base, "do_geom": False}))
    timed("no_rolls+no_mix", build(**{**base, "do_rolls": False,
                                      "mix_mode": "none"}))


if __name__ == "__main__":
    main()

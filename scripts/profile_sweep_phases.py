"""Per-phase timing of the full-radius pallas sweep pass on hardware.

Splits raytrace_all_sources' pallas path (ops/sweep.py:1037-1066) into
its pipeline phases and times each as a separate jitted program (warm),
so the ~78 ms of non-march time in the 182.7 ms sweep pass
(BENCH_HISTORY round-3 fusion entry) can be attributed:

  1. neutral density + wrap-pad + per-source centering slices
  2. face-major staging (_stage_faces_patch)
  3. the pallas shell march (compute_columns_pallas)
  4. rate pass (_rate_pass: columns -> photoionization rates)
  5. grid-frame rolls + batch-sum accumulation (_to_grid)

Phase sums exceed the fused pass (each boundary materializes to HBM),
but the relative weights say where optimization pays.

Usage: python scripts/profile_sweep_phases.py [--mesh 256] [--sources 16]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=256)
    ap.add_argument("--sources", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grid-only", action="store_true",
                    help="skip the old centered-path phases (whose "
                         "materialized phase boundaries OOM at b=16)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from c2ray_tpu.config import test_problem_config
    from c2ray_tpu.ops import sweep as sw
    from c2ray_tpu.ops.sweep import SweepScalars, _rate_pass, \
        neutral_density, roll3
    from c2ray_tpu.ops.sweep_pallas import (_march_bucket, _march_ladder,
                                            _unstage_six)
    from c2ray_tpu.ops.tables import build_rad_tables

    n = args.mesh
    b = args.sources
    c = n // 2
    cfg = test_problem_config(mesh=n, dtype="float32", use_lls=True,
                              type_of_lls=1, cosmological=False,
                              sweep_backend="pallas", source_batch=b)
    tables = build_rad_tables(cfg)
    rng = np.random.default_rng(0)
    srcpos = jnp.asarray(rng.integers(0, n, (b, 3)).astype(np.int32))
    nflux = jnp.asarray((10.0 ** rng.uniform(6, 9, b)).astype(np.float32))
    ndens = jnp.full(cfg.mesh, np.float32(1.98e-4))
    xh = jnp.asarray(rng.uniform(0.3, 0.9, cfg.mesh).astype(np.float32))
    sc = SweepScalars(dr=jnp.float32(2.9e24 / (n / 64)),
                      rate_scale=jnp.float32(cfg.sed.s_star),
                      lls_coldens=jnp.float32(0.0),
                      rmax2_cells=jnp.float32(0.0))
    d_sweep = c
    (d_lo, d_hi, p) = _march_ladder(d_sweep, n)[0]
    lo = c - (p // 2)

    # --- phase programs --------------------------------------------------
    @jax.jit
    def ph_center(ndens, xh, pos_b):
        ndhi = neutral_density(cfg, ndens, xh)
        ext = jnp.pad(ndhi, ((0, n - 1),) * 3, mode="wrap")

        def _center(pos):
            start = (pos - c) % n
            return lax.dynamic_slice(ext, (start[0], start[1], start[2]),
                                     (n, n, n))
        return jax.vmap(_center)(pos_b)

    nd = d_hi - d_lo + 1

    @jax.jit
    def ph_views(ndhi_cb):
        """The per-face cube views (round-3 I/O design): two whole-batch
        transposes; x faces read the patch cube directly."""
        patch = ndhi_cb[:, lo:lo + p, lo:lo + p, lo:lo + p]
        y_t = jnp.moveaxis(patch, 2, 1)
        z_t = jnp.moveaxis(patch, 3, 1)
        return (z_t, z_t, y_t, y_t, patch, patch)

    def ph_march(faces6, cdo0):
        params = jnp.stack([
            jnp.broadcast_to(sc.dr, (b,)).astype(jnp.float32),
            jnp.broadcast_to(sc.lls_coldens, (b,)).astype(jnp.float32),
            cdo0, jnp.zeros((b,), jnp.float32)], axis=1)
        seed = jnp.zeros((b, 6, p, p), jnp.float32)
        seed = seed.at[:, :, p // 2, p // 2].set(cdo0[:, None])
        return _march_bucket(cfg, params, seed, faces6, None, d_lo, p, nd)

    ph_march = jax.jit(ph_march)

    @jax.jit
    def ph_unstage(planes6, cdo0):
        out = jnp.zeros((b, n, n, n), jnp.float32)
        out = jax.vmap(
            lambda o, *pls: _unstage_six(o, pls, n, d_lo, lo, p))(
            out, *planes6)
        ar = jnp.arange(b)
        return out.at[ar, c, c, c].set(cdo0)

    @jax.jit
    def ph_rate(cdo_b, ndhi_cb, nflux):
        return jax.vmap(lambda cdo, x, f: _rate_pass(
            cfg, tables, cdo, x, f, sc, jnp.float32(0.0), d_sweep))(
            cdo_b, ndhi_cb, nflux)

    @jax.jit
    def ph_roll(phih_b, pos_b):
        ph = jax.vmap(lambda f, pos: roll3(f, pos - c))(phih_b, pos_b)
        return jnp.sum(ph, axis=0)

    # --- run -------------------------------------------------------------
    if args.grid_only:
        _grid_section(args, cfg, tables, sc, ndens, xh, srcpos, nflux,
                      d_sweep)
        return
    ndhi_cb = ph_center(ndens, xh, srcpos)
    cdo0 = ndhi_cb[:, c, c, c] * (0.5 * sc.dr)
    faces6 = ph_views(ndhi_cb)
    planes = ph_march(faces6, cdo0)
    cdo_b = ph_unstage(planes, cdo0)
    res = ph_rate(cdo_b, ndhi_cb, nflux)
    acc = ph_roll(res.phih, srcpos)
    jax.block_until_ready(acc)

    def timed(name, fn, *xs):
        jax.block_until_ready(fn(*xs))
        t0 = time.time()
        for _ in range(args.iters):
            r = fn(*xs)
        jax.block_until_ready(r)
        ms = (time.time() - t0) / args.iters * 1e3
        print(f"  {name:34s} {ms:8.1f} ms")
        return ms

    print(f"sweep phases  mesh={n}^3  sources={b}  "
          f"platform={jax.devices()[0].platform}")
    tot = 0.0
    tot += timed("center (ndhi+pad+slices)", ph_center, ndens, xh, srcpos)
    tot += timed("face views (2 transposes)", ph_views, ndhi_cb)
    tot += timed("pallas march", ph_march, faces6, cdo0)
    tot += timed("unstage six", ph_unstage, planes, cdo0)
    tot += timed("rate pass", ph_rate, cdo_b, ndhi_cb, nflux)
    tot += timed("grid rolls + batch sum", ph_roll, res.phih, srcpos)
    print(f"  {'SUM (separate programs)':34f} ms"
          if False else f"  {'SUM (separate programs)':34s} {tot:8.1f} ms")

    # --- round-5 grid-frame path ----------------------------------------
    _grid_section(args, cfg, tables, sc, ndens, xh, srcpos, nflux, d_sweep)


def _grid_section(args, cfg, tables, sc, ndens, xh, srcpos, nflux, d_sweep):
    import jax
    import time
    from c2ray_tpu.ops.sweep import neutral_density
    from c2ray_tpu.ops.sweep_pallas import (compute_columns_pallas_grid,
                                            consume_rates_pallas)

    @jax.jit
    def ph_ndhi(ndens, xh):
        return neutral_density(cfg, ndens, xh)

    @jax.jit
    def ph_grid_march(ndhi, pos_b):
        return compute_columns_pallas_grid(cfg, ndhi, pos_b, sc, d_sweep)

    @jax.jit
    def ph_consume(cdo_b, ndhi, pos_b, nflux):
        return consume_rates_pallas(cfg, tables, cdo_b, ndhi, None,
                                    pos_b, nflux, None, sc, d_sweep)

    def timed(name, fn, *xs):
        jax.block_until_ready(fn(*xs))
        t0 = time.time()
        for _ in range(args.iters):
            r = fn(*xs)
        jax.block_until_ready(r)
        ms = (time.time() - t0) / args.iters * 1e3
        print(f"  {name:34s} {ms:8.1f} ms")
        return ms

    ndhi1 = ph_ndhi(ndens, xh)
    cdo_g = ph_grid_march(ndhi1, srcpos)
    out = ph_consume(cdo_g, ndhi1, srcpos, nflux)
    jax.block_until_ready(out)
    print("grid-frame path (round 5):")
    tg = 0.0
    tg += timed("neutral density", ph_ndhi, ndens, xh)
    tg += timed("grid march (views+kernel+unstage)", ph_grid_march,
                ndhi1, srcpos)
    tg += timed("consume (rates+rolls+sum)", ph_consume, cdo_g, ndhi1,
                srcpos, nflux)
    print(f"  {'SUM grid-frame':34s} {tg:8.1f} ms")


if __name__ == "__main__":
    main()

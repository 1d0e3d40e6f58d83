"""Phase-level timing of one Evolve3D convergence iteration on hardware.

Replays the exact device calls evolve3d makes per iteration, each timed
with block_until_ready, to attribute the full-step wall time
(bench.py --full-step) to sweep / chemistry / counts / host syncs.
"""

import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from c2ray_tpu.config import test_problem_config
from c2ray_tpu.ops.photonstats import PhotonStatistics
from c2ray_tpu.ops.sweep import SweepScalars
from c2ray_tpu.ops.tables import build_rad_tables
from c2ray_tpu.solver import Evolve3D
from c2ray_tpu.state import initial_state


def t(fn, label, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1e3
    print(f"  {label:34s} {dt:8.1f} ms")
    return out


def main(n=256, sources=16):
    cfg = test_problem_config(mesh=n, dtype="float32", use_lls=True,
                              type_of_lls=1, cosmological=False,
                              sweep_backend="pallas",
                              source_batch=min(sources, 256))
    tables = build_rad_tables(cfg)
    rng = np.random.default_rng(0)
    srcpos = jnp.asarray(rng.integers(0, n, (sources, 3)), jnp.int32)
    nflux = jnp.asarray(10.0 ** rng.uniform(6, 9, sources), jnp.float32)
    nh = 1.98e-4
    ndens = jnp.full(cfg.mesh, np.float32(nh))
    xh = jnp.asarray(rng.uniform(0.3, 0.9, cfg.mesh).astype(np.float32))
    dr = 2.9e24 / (n / 64)
    dt_step = 3.0e13
    vol = dr ** 3

    solver = Evolve3D(cfg, tables)
    sc = SweepScalars(dr=jnp.float32(dr),
                      rate_scale=jnp.float32(cfg.sed.s_star / vol),
                      lls_coldens=jnp.float32(1e17),
                      rmax2_cells=jnp.float32(0.0))
    clump = jnp.float32(1.0)
    state = initial_state(cfg)._replace(xh1=xh)
    t_cur = state.temper_current
    t_av = state.temper_av

    print(f"mesh={n}^3 sources={sources} "
          f"platform={jax.devices()[0].platform}")

    # --- phases in evolve3d per-iteration order ---
    s = t(lambda: solver._sum(xh), "_sum(xh_int)")
    _ = t(lambda: float(solver._sum(xh)), "_sum + float sync")

    sweep_out = t(lambda: solver._sweep(ndens, xh, srcpos, nflux, sc,
                                        None, None),
                  "sweep (full radius, jitted)")
    phih = sweep_out[0]

    def sweep_sync():
        ph, he, lo, ll, ps = solver._sweep(ndens, xh, srcpos, nflux, sc,
                                           None, None)
        return float(lo), float(ll), np.asarray(ps)
    _ = t(sweep_sync, "sweep + loss/per-src syncs")

    chem = t(lambda: solver._chem(jnp.float32(dt_step), ndens, xh, xh, xh,
                                  phih, None, t_cur, t_av, clump,
                                  jnp.float32(0.0),
                                  jnp.zeros((), jnp.float32)),
             "chemistry pass")
    _ = t(lambda: int(chem.conv_flag), "conv_flag sync")

    c1 = t(lambda: solver._counts(ndens, xh, t_av, clump), "counts (one)")

    def stats_block():
        stats = PhotonStatistics(cfg)
        ca = solver._counts(ndens, chem.xh1_intermed, t_av, clump)
        cr = solver._counts(ndens, chem.xh1_av, t_av, clump)
        stats.calculate(ca, cr, vol, dt_step)
        return stats.report(dt_step, 0.1, 0.0,
                            float(np.sum(np.asarray(nflux))))
    _ = t(stats_block, "stats block (2 counts + floats)")

    # full iteration as evolve3d strings it together
    def full_iter():
        s1 = float(solver._sum(xh))
        ph, he, lo, ll, ps = solver._sweep(ndens, xh, srcpos, nflux, sc,
                                           None, None)
        lo = float(lo); ll = float(ll); ps = np.asarray(ps)
        ch = solver._chem(jnp.float32(dt_step), ndens, xh, xh, xh, ph,
                          None, t_cur, t_av, clump, jnp.float32(0.0),
                          jnp.zeros((), jnp.float32))
        cf = int(ch.conv_flag)
        stats = PhotonStatistics(cfg)
        ca = solver._counts(ndens, ch.xh1_intermed, t_av, clump)
        cr = solver._counts(ndens, ch.xh1_av, t_av, clump)
        stats.calculate(ca, cr, vol, dt_step)
        stats.report(dt_step, lo, ll, float(np.sum(np.asarray(nflux))))
        return cf
    t(full_iter, "FULL ITERATION (manual replay)")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=256)
    ap.add_argument("--sources", type=int, default=16)
    args = ap.parse_args()
    main(args.mesh, args.sources)

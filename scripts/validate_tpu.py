"""On-hardware validation of the batched sweep paths.

The CPU test suite cannot catch TPU-specific code generation bugs: round 1
found XLA:TPU silently miscompiling reversed-stride slice updates under
vmap (batch >= 4) and the MXU's default bf16 operand rounding inside
one-hot permutation matmuls - both invisible at the small CPU test sizes
and both corrupting production-size results.  This script is the
regression gate for those classes of failure: it compares every batched
backend against single-source sweeps (validated independently against the
grid-layout backend) at the full bench configuration on the real chip.

Usage:  python scripts/validate_tpu.py [facemajor] [pallas]
Takes ~5-10 min of compiles on a cold cache; do not run concurrently
with other TPU processes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from c2ray_tpu.config import test_problem_config
from c2ray_tpu.ops.sweep import SweepScalars, raytrace_all_sources
from c2ray_tpu.ops.tables import build_rad_tables

N = 256
S = 16


def main():
    rng = np.random.default_rng(0)
    srcpos = jnp.asarray(rng.integers(0, N, (S, 3)), jnp.int32)
    nflux = jnp.asarray(10.0 ** rng.uniform(6, 9, S), jnp.float32)
    ndens = jnp.full((N, N, N), np.float32(1.98e-4))
    xh_av = jnp.asarray(rng.uniform(0.3, 0.9, (N, N, N)).astype(np.float32))
    dr = 2.9e24 / (N / 64)

    lls_grid = jnp.asarray(
        (rng.uniform(0.0, 1.0, (N, N, N)) * 3e16).astype(np.float32))

    def run(backend, batch, max_shell=None, window=False, gridlls=False):
        cfg = test_problem_config(mesh=N, dtype="float32", use_lls=True,
                                  type_of_lls=2 if gridlls else 1,
                                  cosmological=False, window_sweep=window,
                                  sweep_backend=backend, source_batch=batch)
        tables = build_rad_tables(cfg)
        sc = SweepScalars(dr=jnp.float32(dr),
                          rate_scale=jnp.float32(cfg.sed.s_star / dr**3),
                          lls_coldens=jnp.float32(0 if gridlls else 1e17),
                          rmax2_cells=jnp.float32(0.0))
        lg = lls_grid if gridlls else None
        f = jax.jit(lambda nd, xa, sp, nf: raytrace_all_sources(
            cfg, tables, nd, xa, sp, nf, sc, lls_grid=lg,
            max_shell=max_shell))
        t0 = time.time()
        out = f(ndens, xh_av, srcpos, nflux)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        t0 = time.time()
        out = f(ndens, xh_av, srcpos, nflux)
        jax.block_until_ready(out)
        run_s = time.time() - t0
        phih, heat, loss, lls_loss, per_src = out
        return (np.asarray(phih, np.float64), float(loss), float(lls_loss),
                compile_s, run_s)

    def compare(tag, got, ref, cells_per_src=N**3):
        phih, loss, lls, cs, rs = got
        ref_phih, ref_loss, ref_lls = ref
        rel = np.abs(phih - ref_phih) / np.maximum(np.abs(ref_phih), 1e-30)
        mask = ref_phih > ref_phih.max() * 1e-12
        worst = rel[mask].max()
        lrel = abs(loss - ref_loss) / max(abs(ref_loss), 1e-30)
        llrel = abs(lls - ref_lls) / max(abs(ref_lls), 1e-30)
        ok = bool(worst < 1e-5 and llrel < 1e-4)
        print(f"{tag}: max rel(phih)={worst:.2e} "
              f"loss rel={lrel:.2e} lls rel={llrel:.2e} "
              f"compile={cs:.0f}s run={rs*1e3:.0f}ms "
              f"({S*cells_per_src/rs/1e6:.0f}M upd/s) "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        return ok

    which = sys.argv[1:] or ("facemajor", "pallas", "windowed", "gridlls")
    failures = 0

    # full-sweep gate: every batched backend vs single-source facemajor
    ref_full = run("facemajor", 1)
    print(f"ref (facemajor b=1): loss={ref_full[1]:.6e} "
          f"lls={ref_full[2]:.6e}", flush=True)
    for backend in [w for w in which if w in ("facemajor", "pallas")]:
        failures += not compare(f"{backend} b={S}", run(backend, S),
                                ref_full[:3])

    # windowed gate (round 2): radius-capped windows vs the capped
    # full-cube path, both pallas
    if "windowed" in which:
        r = 8
        ref_cap = run("pallas", S, max_shell=r, window=False)
        got = run("pallas", S, max_shell=r, window=True)
        failures += not compare(f"windowed r={r} b={S}", got, ref_cap[:3],
                                cells_per_src=(2 * r + 1) ** 3)

    # grid-LLS gate (round 2): the type-2 LLS VMEM stream vs facemajor
    if "gridlls" in which:
        ref_g = run("facemajor", 1, gridlls=True)
        failures += not compare(f"grid-LLS pallas b={S}",
                                run("pallas", S, gridlls=True), ref_g[:3])

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

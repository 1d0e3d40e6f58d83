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

import sys
import time

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

    def run(backend, batch):
        cfg = test_problem_config(mesh=N, dtype="float32", use_lls=True,
                                  type_of_lls=1, cosmological=False,
                                  sweep_backend=backend, source_batch=batch)
        tables = build_rad_tables(cfg)
        sc = SweepScalars(dr=jnp.float32(dr),
                          rate_scale=jnp.float32(cfg.sed.s_star / dr**3),
                          lls_coldens=jnp.float32(1e17),
                          rmax2_cells=jnp.float32(0.0))
        f = jax.jit(lambda nd, xa, sp, nf: raytrace_all_sources(
            cfg, tables, nd, xa, sp, nf, sc))
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

    ref_phih, ref_loss, ref_lls, _, _ = run("facemajor", 1)
    print(f"ref (facemajor b=1): loss={ref_loss:.6e} lls={ref_lls:.6e}",
          flush=True)

    failures = 0
    for backend in sys.argv[1:] or ("facemajor", "pallas"):
        phih, loss, lls, cs, rs = run(backend, S)
        rel = np.abs(phih - ref_phih) / np.maximum(np.abs(ref_phih), 1e-30)
        mask = ref_phih > ref_phih.max() * 1e-12
        worst = rel[mask].max()
        lrel = abs(loss - ref_loss) / max(abs(ref_loss), 1e-30)
        llrel = abs(lls - ref_lls) / max(abs(ref_lls), 1e-30)
        ok = worst < 1e-5 and llrel < 1e-4
        failures += not ok
        print(f"{backend} b={S}: max rel(phih)={worst:.2e} "
              f"loss rel={lrel:.2e} lls rel={llrel:.2e} "
              f"compile={cs:.0f}s run={rs*1e3:.0f}ms "
              f"({S*N**3/rs/1e6:.0f}M upd/s) "
              f"{'OK' if ok else 'FAIL'}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

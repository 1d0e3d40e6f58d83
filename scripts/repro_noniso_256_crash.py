"""Minimal repro: 256^3 NON-ISOTHERMAL full steps from an evolved
half-ionized state kernel-fault the axon TPU worker on call 1.

Round-5 bisect matrix (each cell = separate process, axon v5e):

  factor varied                        call 0   call 1
  ---------------------------------------------------------------
  as-is (below)                        OK       WORKER CRASH
  isothermal=True (same state/fluxes)  OK       OK (x3)
  march backend pallas -> facemajor    OK       CRASH (not Pallas)
  thermal_chunk 64 -> 32               OK       CRASH
  thermal_compact on/off               OK       CRASH
  use_lls off, stats off               OK       CRASH
  on-device loop -> host loop          OK       CRASH (not the loop)
  dimmer fluxes 10^7.2-8.2 (seed 42)   OK       OK (x3)

Conclusion: XLA:TPU fault in the non-isothermal chemistry/thermal tail
(nested while_loop program) triggered by bright-flux evolved states;
independent of the march backend, deposition path, thermal slabbing,
compaction, LLS, statistics, and host/device loop choice.  The
validation configuration (scripts/validate_thermal_tpu.py --mesh 256)
passes, so the mesh size alone is not the trigger.

Run:  python scripts/repro_noniso_256_crash.py   (expect the crash on
call 1; the worker auto-restarts afterwards)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from c2ray_tpu.config import test_problem_config
from c2ray_tpu.ops.photonstats import PhotonStatistics
from c2ray_tpu.ops.tables import build_rad_tables
from c2ray_tpu.ops.thermal import setup_cool
from c2ray_tpu.solver import Evolve3D
from c2ray_tpu.state import initial_state

n = 256
use_stats = "nostats" not in sys.argv
use_lls = "nolls" not in sys.argv
cfg = test_problem_config(mesh=n, dtype="float32", use_lls=use_lls,
                          type_of_lls=1, cosmological=False,
                          sweep_backend="pallas", source_batch=16,
                          isothermal="iso" in sys.argv,
                          thermal_compact="nocompact" not in sys.argv,
                          thermal_chunk=(32 if "chunk32" in sys.argv else 0))
tables = build_rad_tables(cfg)
rng = np.random.default_rng(0)
srcpos = rng.integers(0, n, (16, 3)).astype(np.int32)
nflux = (10.0 ** rng.uniform(6, 9, 16)).astype(np.float64)
ndens = jnp.full(cfg.mesh, np.float32(1.98e-4))
dr = 2.9e24 / (n / 64)
dt = 3.0e13
solver = Evolve3D(cfg, tables, cool=None if cfg.isothermal else setup_cool(cfg))
state = initial_state(cfg)
state = state._replace(xh1=jnp.asarray(
    rng.uniform(0.3, 0.9, cfg.mesh).astype(np.float32)))
stats = PhotonStatistics(cfg) if use_stats else None
t0 = time.time()
for ci in range(3):
    state, info = solver.evolve3d(state, ndens, dr, srcpos, nflux, dt,
                                  lls_coldens=1e17 if use_lls else 0.0,
                                  stats=stats)
    print(f"call {ci}: OK niter={info.niter} mean_x={info.mean_xh1:.4f} "
          f"{time.time()-t0:.0f}s", flush=True)

"""Generate the checked-in golden regression cubes (tests/fixtures/).

Frozen f64/table-exact runs of the bundled reference fixtures
(inputs/test_sources_onesrc.dat, test_sources_standard.dat) at their
NATIVE 100^3 geometry, plus a small non-isothermal+LLS problem.  Every
backend/dtype/sharding mode is asserted against these in
tests/test_golden.py: any semantic drift in the sweep, tables, chemistry
or convergence structure turns the suite red.

No Fortran toolchain exists on this image (no gfortran/ifort), so true
reference-generated cubes are not producible here; these goldens pin
THIS framework's semantics instead (VERDICT round-1 item 2), and the
physics are independently validated against the analytic Stromgren
solution (test_solver.py) and photon conservation.

Run: python scripts/make_goldens.py   (rewrites tests/fixtures/golden_*.npz)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from c2ray_tpu import constants as const
from c2ray_tpu.config import test_problem_config as make_config
from c2ray_tpu.models.sources import SourceModel, read_source_file
from c2ray_tpu.ops.tables import build_rad_tables
from c2ray_tpu.solver import Evolve3D
from c2ray_tpu.state import initial_state

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

# the frozen problem definition — changing ANY of these invalidates the
# goldens (regenerate + review the diff)
NH = 1.98e-4                     # mean baryon density at z=9 [cm^-3]
ZRED = 9.0
DT = 1e7 * const.YEAR            # one reference slice interval


def golden_config(n, **kw):
    base = dict(mesh=n, dtype="float64", use_lls=False, cosmological=False,
                rate_eval="table", sweep_backend="facemajor")
    base.update(kw)
    return make_config(**base)


def run_fixture(cfg, src_file, steps=1, **evolve_kw):
    from c2ray_tpu.ops.thermal import setup_cool
    tabs = build_rad_tables(cfg)
    cool = None if cfg.isothermal else setup_cool(cfg)
    solver = Evolve3D(cfg, tabs, cool=cool)
    rows = read_source_file(os.path.join(FIXDIR, src_file))
    model = SourceModel.from_recipe(cfg, 7)   # "Test" = raw photon rates
    state = initial_state(cfg)
    cat = model.load(rows, np.asarray(state.xh1), 0, cfg.lifetime)
    n = cfg.mesh[0]
    ndens = jnp.full((n, n, n), NH)
    dr = cfg.dr_comoving / (1.0 + ZRED)
    infos = []
    for _ in range(steps):
        state, info = solver.evolve3d(state, ndens, dr, cat.srcpos,
                                      cat.normflux_stellar, DT, **evolve_kw)
        infos.append(info)
    return state, infos, cat


def save(name, state, infos):
    path = os.path.join(FIXDIR, name)
    np.savez_compressed(
        path,
        xh1=np.asarray(state.xh1),
        niters=np.asarray([i.niter for i in infos]),
        mean_xh1=np.asarray([i.mean_xh1 for i in infos]),
        photon_loss=np.asarray([i.photon_loss for i in infos]),
        temper=(np.asarray(state.temper_current)
                if hasattr(state.temper_current, "shape")
                and getattr(state.temper_current, "ndim", 0) == 3
                else np.zeros(0)),
    )
    print(f"wrote {path}: mean_x={infos[-1].mean_xh1:.8e} "
          f"niters={[i.niter for i in infos]}")


def main():
    # 1. onesrc at the native 100^3 geometry (1e57 ph/s at 1-based 50,50,50)
    cfg = golden_config(100)
    state, infos, _ = run_fixture(cfg, "test_sources_onesrc.dat", steps=1)
    save("golden_onesrc_100.npz", state, infos)

    # 2. the 10-source standard fixture at native 100^3 (overlapping
    #    I-fronts + isolated strong/weak sources)
    cfg = golden_config(100)
    state, infos, cat = run_fixture(cfg, "test_sources_standard.dat",
                                    steps=1)
    assert cat.num_src == 10
    save("golden_standard_100.npz", state, infos)

    # 3. non-isothermal + LLS type 1 at 32^3: pins thermal/cooling/LLS
    #    semantics cheaply (2 steps so T feedback engages)
    cfg = golden_config(32, isothermal=False, use_lls=True, type_of_lls=1,
                        lls_model=5, initial_temperature=100.0)
    state, infos, _ = run_fixture(
        cfg, "test_sources_onesrc_32.dat", steps=2,
        lls_coldens=_lls_coldens(cfg))
    save("golden_thermal_32.npz", state, infos)


def _lls_coldens(cfg):
    from c2ray_tpu.models.lls import set_lls
    dr = cfg.dr_comoving / (1.0 + ZRED)
    return set_lls(cfg, ZRED, dr).coldensh_lls


if __name__ == "__main__":
    main()

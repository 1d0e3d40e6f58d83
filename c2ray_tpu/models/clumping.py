"""Sub-grid clumping models.

Re-implementation of /root/reference/clumping_module.F90: five models
selected by cfg.type_of_clumping:
  1: constant factor
  2: globally averaged C(z) = C0 exp(c1 z + c2 z^2) + 1      (GCM)
  3: deterministic per-cell quadratic in overdensity          (DCM, Mao+2019)
  4: stochastic lognormal per-cell                            (SCM, Bianco+2020)
  5: precomputed clumping grids read per redshift

Parameter tables are small (redshift x coefficients); redshift
interpolation uses linear weights between the two nearest tabulated
redshifts (weight_function, clumping_module.F90:249-307).  Models 3-5
produce grids consumed directly by the vectorized chemistry kernel; the
stochastic model draws its lognormal grid with numpy RNG (replacing the
Fortran Box-Muller loop, clumping_module.F90:309-323).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

import numpy as np

from ..config import RunConfig


@dataclass
class ClumpingModel:
    """Holds the loaded parameter tables (load_clumping_model,
    clumping_module.F90:33-59)."""

    cfg: RunConfig
    params_gcm: Optional[np.ndarray] = None  # (6,): C0 c1 c2 + errors
    params_dcm: Optional[np.ndarray] = None  # (nz, 7): z a0 a1 a2 + errors
    params_scm: Optional[np.ndarray] = None  # (nz, nbins, 5): mu sig lo hi mid
    seed: int = 0

    # ------------------------------------------------------------------
    def _z_weights(self, zred: float):
        """Linear interpolation weights between tabulated redshifts
        (weight_function, clumping_module.F90:249-307)."""
        zt = self.params_dcm[:, 0]
        # tables are stored with decreasing z in the reference files;
        # normalize to increasing for searching
        order = np.argsort(zt)
        zi = zt[order]
        z = np.clip(zred, zi[0], zi[-1])
        j = int(np.searchsorted(zi, z, side="right") - 1)
        j = min(j, len(zi) - 2)
        w2 = (z - zi[j]) / (zi[j + 1] - zi[j])
        return order[j], order[j + 1], 1.0 - w2, w2

    def _dcm_coeffs(self, zred: float) -> np.ndarray:
        i0, i1, w1, w2 = self._z_weights(zred)
        return self.params_dcm[i0, 1:4] * w1 + self.params_dcm[i1, 1:4] * w2

    # ------------------------------------------------------------------
    def evaluate(self, zred: float, ndens: Optional[np.ndarray] = None,
                 avg_dens: Optional[float] = None,
                 grid_file_reader=None) -> Union[float, np.ndarray]:
        """set_clumping: return a scalar (types 1,2) or a grid (3,4,5).

        Reference: clumping_module.F90:63-102.
        """
        cfg = self.cfg
        t = cfg.type_of_clumping
        if t == 1:
            return float(cfg.clumping_factor)
        if t == 2:
            p = self.params_gcm
            return float(p[0] * np.exp(p[1] * zred + p[2] * zred**2) + 1.0)
        if t == 3:
            a0, a1, a2 = self._dcm_coeffs(zred)
            delta = np.asarray(ndens, np.float64) / avg_dens
            return (a0 * delta * delta + a1 * delta + a2).astype(cfg.np_dtype)
        if t == 4:
            return self._stochastic(zred, ndens, avg_dens)
        if t == 5:
            if grid_file_reader is None:
                raise ValueError("type_of_clumping=5 requires a grid reader")
            return grid_file_reader(zred)
        raise ValueError(f"unknown clumping type {t}")

    def _stochastic(self, zred, ndens, avg_dens) -> np.ndarray:
        """SCM: lognormal draw per cell, mu/sigma interpolated over the
        density bins; out-of-range densities fall back to the DCM mean
        with the edge bin's sigma (clumping_module.F90:369-438)."""
        i0, i1, w1, w2 = self._z_weights(zred)
        p = self.params_scm[i0] * w1 + self.params_scm[i1] * w2  # (nbins, 5)
        mids = p[:, 4]
        order = np.argsort(mids)
        mids_s, mu_s, sig_s = mids[order], p[order, 0], p[order, 1]
        delta = (np.asarray(ndens, np.float64) / avg_dens).ravel()
        mu = np.interp(delta, mids_s, mu_s)
        sig = np.interp(delta, mids_s, sig_s)
        # out-of-range: DCM-based mean (log), edge sigma
        a0, a1, a2 = self._dcm_coeffs(zred)
        low, high = delta < mids_s[0], delta > mids_s[-1]
        out = low | high
        if np.any(out):
            dcm = np.log(np.maximum(a0 * delta[out] ** 2 + a1 * delta[out] + a2,
                                    1e-30))
            mu[out] = dcm
            sig[out] = np.where(low[out], sig_s[0], sig_s[-1])
        rng = np.random.default_rng(self.seed + int(zred * 1000))
        draw = np.exp(rng.normal(mu, np.maximum(sig, 0.0)))
        return draw.reshape(np.shape(ndens)).astype(self.cfg.np_dtype)


def load_clumping_model(cfg: RunConfig, resolution_mpc: Optional[float] = None,
                        params_dir: Optional[str] = None,
                        seed: int = 0) -> ClumpingModel:
    """Load parameter files paramsGCM/DCM/SCM_<res>Mpc.dat
    (clumping_module.F90:122-223).  Files are Fortran unformatted."""
    model = ClumpingModel(cfg=cfg, seed=seed)
    t = cfg.type_of_clumping
    if t in (1, 5) or params_dir is None:
        return model
    from ..utils.io_fortran import read_unformatted_records
    res = f"{resolution_mpc:5.3f}"
    if t == 2:
        recs = read_unformatted_records(f"{params_dir}/paramsGCM_{res}Mpc.dat")
        model.params_gcm = np.frombuffer(recs[0], np.float64)
    if t in (3, 4):
        recs = read_unformatted_records(f"{params_dir}/paramsDCM_{res}Mpc.dat")
        q1, q2 = np.frombuffer(recs[0], np.int32)[:2]
        model.params_dcm = np.frombuffer(recs[1], np.float64).reshape(
            (q2, q1)).T  # Fortran column-major (q1, q2)
    if t == 4:
        recs = read_unformatted_records(f"{params_dir}/paramsSCM_{res}Mpc.dat")
        l1, l2, l3 = np.frombuffer(recs[0], np.int32)[:3]
        model.params_scm = np.frombuffer(recs[1], np.float64).reshape(
            (l3, l2, l1)).T  # Fortran order -> (l1, l2, l3)
    return model


def evaluate_device(model: ClumpingModel, zred: float, ndens,
                    avg_dens: float):
    """Types 3/4 evaluated with jnp elementwise ops directly on the
    (possibly sharded) device density grid — the halo layout's per-cell
    clumping without ever materializing a host cube (round 5, VERDICT
    item 6; the reference evaluates per cell under any parallel mode,
    clumping_module.F90:327-487).

    The type-4 stochastic draw uses the partitionable threefry
    counter-based generator: deterministic in (seed, zred) and invariant
    under sharding, so every layout produces the identical grid —
    replacing the host RNG of ClumpingModel._stochastic (the reference's
    Box-Muller loop is likewise per-cell deterministic in its seed,
    clumping_module.F90:309-323)."""
    import jax
    import jax.numpy as jnp

    cfg = model.cfg
    t = cfg.type_of_clumping
    dtype = cfg.jnp_dtype
    if t == 3:
        a0, a1, a2 = (float(v) for v in model._dcm_coeffs(zred))

        @jax.jit
        def dcm(nd):
            delta = (nd / dtype(avg_dens)).astype(dtype)
            return a0 * delta * delta + a1 * delta + a2

        return dcm(ndens)
    if t != 4:
        raise ValueError(f"evaluate_device handles types 3/4, got {t}")
    i0, i1, w1, w2 = model._z_weights(zred)
    p = model.params_scm[i0] * w1 + model.params_scm[i1] * w2
    order = np.argsort(p[:, 4])
    mids = jnp.asarray(p[order, 4], dtype)
    mu_s = jnp.asarray(p[order, 0], dtype)
    sig_s = jnp.asarray(p[order, 1], dtype)
    a0, a1, a2 = (float(v) for v in model._dcm_coeffs(zred))
    key = jax.random.key(model.seed + int(zred * 1000))

    @jax.jit
    def scm(nd):
        delta = (nd / dtype(avg_dens)).astype(dtype)
        mu = jnp.interp(delta, mids, mu_s)
        sig = jnp.interp(delta, mids, sig_s)
        dcm = jnp.log(jnp.maximum(a0 * delta * delta + a1 * delta + a2,
                                  1e-30))
        low = delta < mids[0]
        high = delta > mids[-1]
        mu = jnp.where(low | high, dcm, mu)
        sig = jnp.where(low, sig_s[0], jnp.where(high, sig_s[-1], sig))
        z = jax.random.normal(key, nd.shape, dtype)
        return jnp.exp(mu + jnp.maximum(sig, 0.0) * z)

    return scm(ndens)

"""Post-processing tools: the python equivalents of /root/reference/tools/.

The reference ships standalone Fortran post-processors that read the
output cubes (its README already recommends a python reimplementation,
tools/README:1-9); this module provides the same observables natively:

  - volume/mass-averaged ionized+neutral fractions    (fractions.f90)
  - 21-cm differential brightness temperature cubes,
    mean evolution, rms fluctuations and power spectra (21cm_fluct_vs_z.f90,
    make_PDF_21cm.f90)
  - photoionization-rate PDFs                         (make_PDF_photorates.f90)
  - Thomson optical depth along the light cone        (make_maps_tau.f90, tau.f)
  - kSZ-style integrated maps (given velocity cubes)  (make_maps_kSZ.f90)
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from . import constants as const
from .config import CosmologyParams, RunConfig
from .models.nbody import fortran_f6_3
from .utils.io_fortran import read_sm3d

SIGMA_T = 6.6524e-25          # Thomson cross-section [cm^2]
NU0_21CM = 1420.40575e6       # 21cm rest frequency [Hz] (21cm_fluct_vs_z.f90)
T_STAR = 0.0681               # 21cm T* [K]
A10 = 2.85e-15                # 21cm Einstein A [1/s]


def load_xfrac(results_dir: str, zred: float, mesh) -> np.ndarray:
    """Read an xfrac3D_<z>.bin cube (ours or reference-produced)."""
    return read_sm3d(os.path.join(results_dir,
                                  f"xfrac3D_{fortran_f6_3(zred)}.bin"),
                     np.float64, expect_mesh=tuple(mesh))


def ionized_fractions(xh1: np.ndarray, ndens: np.ndarray) -> Dict[str, float]:
    """Volume- and mass-weighted mean ionized/neutral fractions
    (fractions.f90; also PhotonCounts2 columns, output.F90:567-578)."""
    x = np.asarray(xh1, np.float64)
    n = np.asarray(ndens, np.float64)
    volfrac = float(x.mean())
    massfrac = float((n * x).sum() / n.sum())
    return {"vol_ionized": volfrac, "mass_ionized": massfrac,
            "vol_neutral": 1.0 - volfrac, "mass_neutral": 1.0 - massfrac}


def brightness_temperature_21cm(xh1: np.ndarray, ndens_proper: np.ndarray,
                                zred: float, cosmo: CosmologyParams
                                ) -> np.ndarray:
    """Differential 21-cm brightness temperature cube [mK].

    dTb = T* c^3 A10 n_HI / (8 pi nu0^2 k_B/h ... ) in the standard
    high-T_spin limit: dTb = (3 c^3 A10 T* / (32 pi nu0^3)) * n_HI /
    ((1+z) H(z)) - the same formula 21cm_fluct_vs_z.f90 integrates, here
    evaluated per cell.  ndens_proper is the proper H+He number density;
    n_HI = abu_h * n * (1-x).
    """
    h0 = cosmo.H0
    hz = h0 * np.sqrt(cosmo.omega0 * (1 + zred) ** 3 + cosmo.omega_l)
    n_hi = const.ABU_H * np.asarray(ndens_proper, np.float64) * (
        1.0 - np.asarray(xh1, np.float64))
    coef = 3.0 * const.C_LIGHT**3 * A10 * T_STAR / (32.0 * np.pi * NU0_21CM**3)
    dtb_k = coef * n_hi / ((1.0 + zred) * hz)
    return dtb_k * 1e3  # mK


def rms_fluctuation(cube: np.ndarray) -> Tuple[float, float]:
    """Mean and rms fractional fluctuation of a cube
    (21cm_fluct_vs_z.f90 'fluct')."""
    c = np.asarray(cube, np.float64)
    mean = float(c.mean())
    if mean == 0.0:
        return 0.0, 0.0
    return mean, float(np.sqrt(((c - mean) ** 2).mean()))


def power_spectrum(cube: np.ndarray, boxsize_cm: float, nbins: int = 32
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Spherically averaged dimensionless power spectrum Delta^2(k) of the
    fractional fluctuation field.

    Returns (k [1/cm], Delta^2).  The reference computes fluctuations
    via configuration-space statistics; the power spectrum is the modern
    equivalent observable (tools/README points to tools21cm).
    """
    c = np.asarray(cube, np.float64)
    n = c.shape[0]
    delta = c / c.mean() - 1.0
    fk = np.fft.rfftn(delta)
    pk = np.abs(fk) ** 2 * (boxsize_cm**3 / n**6)
    kf = 2 * np.pi / boxsize_cm
    kx = np.fft.fftfreq(n, 1.0 / n) * kf
    kz = np.fft.rfftfreq(n, 1.0 / n) * kf
    kk = np.sqrt(kx[:, None, None] ** 2 + kx[None, :, None] ** 2
                 + kz[None, None, :] ** 2)
    kmax = kf * n / 2
    bins = np.linspace(kf, kmax, nbins + 1)
    which = np.digitize(kk.ravel(), bins)
    psum = np.bincount(which, weights=pk.ravel(), minlength=nbins + 2)
    cnt = np.bincount(which, minlength=nbins + 2)
    kcen = 0.5 * (bins[1:] + bins[:-1])
    with np.errstate(invalid="ignore", divide="ignore"):
        pofk = psum[1:nbins + 1] / np.maximum(cnt[1:nbins + 1], 1)
    return kcen, pofk * kcen**3 / (2 * np.pi**2)


def rate_pdf(rates: np.ndarray, nbins: int = 100,
             log_range: Tuple[float, float] = (-18.0, -8.0)
             ) -> Tuple[np.ndarray, np.ndarray]:
    """PDF of log10 photoionization rates (make_PDF_photorates.f90)."""
    r = np.asarray(rates, np.float64).ravel()
    r = r[r > 0]
    hist, edges = np.histogram(np.log10(r), bins=nbins, range=log_range,
                               density=True)
    return 0.5 * (edges[1:] + edges[:-1]), hist


def thomson_tau(xh1_slices: Sequence[np.ndarray],
                ndens_slices: Sequence[np.ndarray],
                zreds: Sequence[float], cosmo: CosmologyParams) -> np.ndarray:
    """Integrated Thomson optical depth map through a stack of redshift
    slices (make_maps_tau.f90/tau.f): tau(x,y) = sum sigma_T n_e dl with
    dl = c dt per slice."""
    tau = np.zeros(np.asarray(xh1_slices[0]).shape[:2])
    for x, n, z in zip(xh1_slices, ndens_slices, zreds):
        hz = cosmo.H0 * np.sqrt(cosmo.omega0 * (1 + z) ** 3 + cosmo.omega_l)
        ne = np.asarray(n, np.float64) * np.asarray(x, np.float64)
        # path length of one slice along the LoS: c / ((1+z) H(z)) per unit z
        # approximated with the slice's comoving depth; sum over the z-axis
        dl = const.C_LIGHT / ((1.0 + z) * hz) * (1.0 / len(xh1_slices))
        tau += SIGMA_T * ne.sum(axis=2) * dl
    return tau


def ksz_map(xh1: np.ndarray, ndens_proper: np.ndarray, vel_z: np.ndarray,
            dr_proper: float) -> np.ndarray:
    """Kinetic SZ-style integrated map: sum sigma_T n_e (v_z/c) dl along the
    z axis (make_maps_kSZ.f90), given a line-of-sight velocity cube."""
    ne = np.asarray(ndens_proper, np.float64) * np.asarray(xh1, np.float64)
    return (SIGMA_T * ne * np.asarray(vel_z, np.float64) / const.C_LIGHT
            ).sum(axis=2) * dr_proper


def ksz_map_interpolated(maps_a: Sequence[np.ndarray],
                         maps_b: Sequence[np.ndarray],
                         weights: Sequence[float],
                         shifts: Optional[Sequence[Tuple[int, int]]] = None,
                         random_vel_sigma: Optional[Sequence[float]] = None,
                         tau_maps: Optional[Sequence[np.ndarray]] = None,
                         seed: int = 0) -> np.ndarray:
    """Light-cone kSZ accumulation with per-slice interpolation
    (make_interp_maps_kSZ_w_random_vel2.f90).

    For each light-cone step i, the contribution is
    ``weight*map_a + (1-weight)*map_b`` (interpolation between bracketing
    output slices, reference :79), optionally translated periodically by
    ``shifts[i]`` (cshift decorrelation, :116-117) and augmented by a
    large-scale random bulk velocity drawn as a zero-mean Gaussian with
    sigma ``random_vel_sigma[i]`` applied to the slice's tau map
    (``tauadd*vrandom/c``, :110-122).
    """
    rng = np.random.default_rng(seed)
    total = np.zeros_like(np.asarray(maps_a[0], np.float64))
    for i, (ma, mb, w) in enumerate(zip(maps_a, maps_b, weights)):
        add = w * np.asarray(ma, np.float64) + (1.0 - w) * np.asarray(
            mb, np.float64)
        if shifts is not None:
            sx, sy = shifts[i]
            add = np.roll(np.roll(add, sx, axis=0), sy, axis=1)
        if random_vel_sigma is not None and tau_maps is not None:
            vrand = rng.normal(0.0, random_vel_sigma[i]) * 1e5  # km/s -> cm/s
            taua = np.asarray(tau_maps[i], np.float64)
            if shifts is not None:
                sx, sy = shifts[i]
                taua = np.roll(np.roll(taua, sx, axis=0), sy, axis=1)
            add = add + taua * vrand / const.C_LIGHT
        total += add
    return total


def cube_pdf(cube: np.ndarray, nbins: int = 100,
             value_range: Optional[Tuple[float, float]] = None
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Linear-range PDF of a cube's values (make_PDF_21cm.f90), e.g. the
    21-cm dTb cube from brightness_temperature_21cm."""
    c = np.asarray(cube, np.float64).ravel()
    hist, edges = np.histogram(c, bins=nbins, range=value_range, density=True)
    return 0.5 * (edges[1:] + edges[:-1]), hist


def write_ifrit_cube(map2d: np.ndarray, path: str,
                     scale: float = 1e6) -> None:
    """Replicate a 2D map along the third axis and write it in IFRIT's
    unformatted format: one (m,m,m) header record + one f32 data record
    (ifrit_format.f90; the reference scales dT maps by 1e6 to muK)."""
    from .utils.io_fortran import write_unformatted_records

    m2 = np.asarray(map2d, np.float32) * np.float32(scale)
    n = m2.shape[0]
    header = np.asarray([n, n, n], np.int32).tobytes()
    # reference writes (((a(i,j),i),j),k): the 2D map repeated n times
    data = np.tile(m2.T.ravel(), n).tobytes()  # Fortran order per plane
    write_unformatted_records(path, [header, data])


def source_luminosity_history(zreds: Sequence[float],
                              flux_total: Sequence[np.ndarray],
                              flux_active: Sequence[np.ndarray],
                              results_file: Optional[str] = None
                              ) -> np.ndarray:
    """Active vs total source counts and luminosities per redshift
    (sources_total_lum.f90:83-85).

    flux_total[i]/flux_active[i] are the per-source photon rates of slice
    i before/after suppression (e.g. SourceModel.load with xh1=0 vs the
    evolving grid).  Returns rows (z, N_total, N_active, S_total,
    S_active) and optionally writes them in the reference's column
    layout."""
    rows = []
    for z, ft, fa in zip(zreds, flux_total, flux_active):
        ft = np.asarray(ft, np.float64)
        fa = np.asarray(fa, np.float64)
        rows.append((float(z), ft.size, fa.size,
                     float(ft.sum()), float(fa.sum())))
    out = np.asarray(rows)
    if results_file:
        with open(results_file, "w") as f:
            for z, nt, na, st, sa in rows:
                f.write(f"{z:10.3f}  {int(nt):8d}{int(na):8d}  "
                        f"{st:12.3e}{sa:12.3e}\n")
    return out

"""Independent physics validation against closed-form SEDs.

The float64-oracle parity tests (`test_grid_parity.py`) check fp32-vs-f64 of
the SAME code; nothing there would catch a shared physics error (wrong
distance convention, wrong band-average weighting, wrong mass
normalization). These tests pin the end-to-end pipeline against results
derived OUTSIDE the package: closed-form band integrals and an independent
float64 Simpson luminosity distance, using constants typed directly from
IAU/CODATA in this file. The reference validates the same physics through
Synthesizer's own test suite + astropy (e.g. fnu conversion,
reference library.py:5735-5804); here the pins are analytic.

Conventions under test (filters.py / sed.py / cosmology.py):
  f_band = ∫ f_ν(λ) T(λ) dλ/λ / ∫ T(λ) dλ/λ         (photon-count mean)
  f_ν(λ_obs) = L_ν(λ_obs/(1+z)) (1+z) / (4π d_L²)    [nJy = 1e-32 cgs]
  d_L = (1+z) (c/H0) ∫ dz'/E(z'),  E² = Ωm(1+z)³+ΩΛ  (Planck18 flat ΛCDM)
  τ(λ) = τ_V k(λ)/R_V                                 (Calzetti 2000)
"""

import numpy as np
import pytest

from synference_tpu.filters import FilterSet, tophat_filter
from synference_tpu.grids import SPSGrid
from synference_tpu.sed import BatchSEDSimulator, EmissionConfig

# -- independent constants (IAU 2015 / CODATA; NOT imported from the pkg) --
C_KM_S = 299792.458
MPC_CM = 3.0856775814913673e24
H0 = 67.66  # Planck 2018 TT,TE,EE+lowE+lensing+BAO — the package default
OM0 = 0.30966
NJY_CGS = 1.0e-32  # erg/s/cm^2/Hz per nJy

PARAM_NAMES = ("log10_mass", "redshift", "peak_age", "tau",
               "log10_metallicity", "tau_v")


def lum_dist_cm(z, n=20001):
    """Flat-ΛCDM d_L via float64 composite Simpson (independent of
    cosmology.py's fp32 Gauss-Legendre)."""
    zs = np.linspace(0.0, z, n)
    e = np.sqrt(OM0 * (1.0 + zs) ** 3 + (1.0 - OM0))
    dc_mpc = (C_KM_S / H0) * _simpson(1.0 / e, zs)
    return (1.0 + z) * dc_mpc * MPC_CM


def _simpson(y, x):
    h = x[1] - x[0]
    return h / 3.0 * (y[0] + y[-1] + 4.0 * y[1:-1:2].sum()
                      + 2.0 * y[2:-1:2].sum())


def _grid_from_lnu(lnu_of_lam, n_wav=4096, lam_min=300.0, lam_max=1.0e7):
    """2x2-cell SPSGrid whose every cell carries the same prescribed L_ν."""
    lam = np.geomspace(lam_min, lam_max, n_wav)
    spec = np.broadcast_to(
        lnu_of_lam(lam).astype(np.float32), (2, 2, n_wav)).copy()
    return SPSGrid(
        name="analytic", log10_ages=np.array([7.0, 9.5]),
        metallicities=np.array([1e-3, 1e-2]), lam=lam,
        spectra={"incident": spec},
    )


def _sim(grid, filters, igm="none"):
    return BatchSEDSimulator(
        grid, filters, PARAM_NAMES, sfh="lognormal", zdist="delta",
        emission=EmissionConfig(igm=igm), photometry_backend="xla",
    )


def _theta(z, log10_mass=9.0, tau_v=0.0):
    return np.array([[log10_mass, z, 2.0e8, 0.3, -2.5, tau_v]], np.float32)


BANDS = [("B0", 9000.0, 2000.0), ("B1", 15000.0, 3300.0),
         ("B2", 27700.0, 7000.0), ("B3", 44400.0, 10200.0)]
FILTERS = FilterSet([tophat_filter(c, ctr, w) for c, ctr, w in BANDS])


class TestFlatSpectrumFluxScale:
    """Flat L_ν: any filter's band mean IS the constant, so the pipeline
    reduces to mass normalization x distance x unit conversion — each
    pinned analytically."""

    L0 = 1.0e20  # erg/s/Hz/Msun, realistic grid scale

    @pytest.mark.parametrize("z", [0.1, 0.5, 1.5, 3.0, 6.0])
    def test_flux_equals_mass_times_distance_scale(self, z):
        sim = _sim(_grid_from_lnu(lambda lam: np.full_like(lam, self.L0)),
                   FILTERS)
        flux = np.asarray(sim.photometry(_theta(z)))[0]
        expect = (1.0e9 * self.L0 * (1.0 + z)
                  / (4.0 * np.pi * lum_dist_cm(z) ** 2) / NJY_CGS)
        # fp32 quadrature d_L + fp32 pipeline: ~1e-3 relative
        assert np.allclose(flux, expect, rtol=2e-3), (flux, expect)

    def test_mass_linearity(self):
        sim = _sim(_grid_from_lnu(lambda lam: np.full_like(lam, self.L0)),
                   FILTERS)
        f9 = np.asarray(sim.photometry(_theta(1.0, log10_mass=9.0)))
        f11 = np.asarray(sim.photometry(_theta(1.0, log10_mass=11.0)))
        assert np.allclose(f11 / f9, 100.0, rtol=1e-4)


class TestPowerLawBandMean:
    """L_ν ∝ (λ/λ0)^s: the photon-count tophat mean has the closed form
    (b^s - a^s) / (s λ0^s ln(b/a)); redshifting multiplies by (1+z)^-s.
    Pins the dλ/λ weighting and the observed-frame shift."""

    L0, LAM0 = 1.0e20, 5500.0

    @pytest.mark.parametrize("s", [-1.0, 0.7])
    @pytest.mark.parametrize("z", [0.3, 2.0])
    def test_band_mean(self, s, z):
        sim = _sim(_grid_from_lnu(
            lambda lam: self.L0 * (lam / self.LAM0) ** s), FILTERS)
        flux = np.asarray(sim.photometry(_theta(z)))[0]
        scale = (1.0e9 * (1.0 + z)
                 / (4.0 * np.pi * lum_dist_cm(z) ** 2) / NJY_CGS)
        for i, (_, ctr, w) in enumerate(BANDS):
            a, b = ctr - w / 2.0, ctr + w / 2.0
            mean = (self.L0 * (1.0 + z) ** (-s) * (b**s - a**s)
                    / (s * self.LAM0**s * np.log(b / a)))
            # discrete log-λ sampling of the band edges: ~0.5% at 4096 cols
            assert abs(flux[i] / (mean * scale) - 1.0) < 1e-2, (s, z, i)


class TestCalzettiBandRatio:
    """Attenuated/unattenuated band ratio for a flat spectrum vs a dense
    float64 Simpson integral of exp(-τ_V k(λ)/R_V) with the published
    Calzetti (2000) polynomials typed independently here."""

    @staticmethod
    def _k_over_rv(lam_aa):
        rv, mu = 4.05, lam_aa * 1.0e-4
        inv = 1.0 / mu
        k = np.where(
            mu < 0.63,
            2.659 * (-2.156 + 1.509 * inv - 0.198 * inv**2
                     + 0.011 * inv**3) + rv,
            2.659 * (-1.857 + 1.040 * inv) + rv)
        return np.maximum(k, 0.0) / rv

    @pytest.mark.parametrize("tau_v", [0.5, 1.5])
    def test_band_attenuation(self, tau_v):
        z = 0.8
        grid = _grid_from_lnu(lambda lam: np.full_like(lam, 1.0e20))
        sim = _sim(grid, FILTERS)
        f_att = np.asarray(sim.photometry(_theta(z, tau_v=tau_v)))[0]
        f_clear = np.asarray(sim.photometry(_theta(z)))[0]
        for i, (_, ctr, w) in enumerate(BANDS):
            a, b = ctr - w / 2.0, ctr + w / 2.0
            lam_obs = np.linspace(a, b, 4001)
            lam_rest = lam_obs / (1.0 + z)
            att = np.exp(-tau_v * self._k_over_rv(lam_rest))
            ratio = (_simpson(att / lam_obs, lam_obs)
                     / _simpson(1.0 / lam_obs, lam_obs))
            assert abs(f_att[i] / f_clear[i] / ratio - 1.0) < 1e-2, i


class TestIGMPhysicalLimits:
    """Inoue14/Madau95 IGM opacity acts ONLY blueward of rest-frame Lyα
    (plus series/continuum further blue): red bands must be untouched."""

    @pytest.mark.parametrize("model", ["inoue14", "madau95"])
    def test_redward_bands_unaffected(self, model):
        z = 3.0  # Lyα at 4864 Å observed — all four bands fully redward
        grid = _grid_from_lnu(lambda lam: np.full_like(lam, 1.0e20))
        f_igm = np.asarray(_sim(grid, FILTERS, igm=model)
                           .photometry(_theta(z)))[0]
        f_none = np.asarray(_sim(grid, FILTERS, igm="none")
                            .photometry(_theta(z)))[0]
        assert np.allclose(f_igm, f_none, rtol=2e-3)

    def test_blueward_band_suppressed(self):
        # at z=6, a 9000 Å band sits at rest 1286 Å — just red of Lyα, so
        # still ~clear; at z=8.5 the same band (rest 947 Å) is deep in the
        # Lyman series/continuum and must be strongly absorbed
        grid = _grid_from_lnu(lambda lam: np.full_like(lam, 1.0e20))
        blue = FilterSet([tophat_filter("B", 9000.0, 1500.0)])
        sim_igm = _sim(grid, blue, igm="inoue14")
        sim_none = _sim(grid, blue, igm="none")
        t85 = (np.asarray(sim_igm.photometry(_theta(8.5)))[0, 0]
               / np.asarray(sim_none.photometry(_theta(8.5)))[0, 0])
        assert t85 < 0.05, t85

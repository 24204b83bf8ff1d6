"""AGN component tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.agn import AGNSimulator, agn_fraction
from synference_tpu.composite import CompositeSEDSimulator
from synference_tpu.sed import BatchSEDSimulator, EmissionConfig


@pytest.fixture(scope="module")
def agn(test_grid, nircam_filters):
    return AGNSimulator(test_grid, nircam_filters)


class TestAGN:
    def test_photometry_finite_positive(self, agn):
        theta = np.array([
            [44.0, 1.0, -0.5, 0.0],
            [46.0, 3.0, -0.3, 0.5],
        ], np.float32)
        p = np.asarray(agn.photometry(theta))
        assert p.shape == (2, 7)
        assert np.isfinite(p).all() and (p > 0).all()

    def test_luminosity_scaling(self, agn):
        t1 = np.array([[44.0, 1.0, -0.5, 0.0]], np.float32)
        t2 = np.array([[45.0, 1.0, -0.5, 0.0]], np.float32)
        p1 = np.asarray(agn.photometry(t1))
        p2 = np.asarray(agn.photometry(t2))
        np.testing.assert_allclose(p2 / p1, 10.0, rtol=1e-3)

    def test_bolometric_normalization(self, agn):
        """∫ L_ν dν should equal 10**log10_l_agn."""
        out = agn.simulate(
            np.array([[45.0, 1.0, -0.5, 0.0]], np.float32), want_spectra=True
        )
        lnu = np.asarray(out["lnu"][0], np.float64)
        lam = np.asarray(agn.grid.lam, np.float64)
        nu = 2.99792458e18 / lam
        lbol = np.trapezoid(lnu[::-1], nu[::-1])
        assert abs(np.log10(lbol) - 45.0) < 0.05

    def test_slope_changes_colors(self, test_grid, nircam_filters):
        # torus off so the local band ratio reflects the disk slope alone
        agn = AGNSimulator(
            test_grid, nircam_filters,
            param_names=("log10_l_agn", "redshift", "agn_slope", "tau_v",
                         "torus_fraction"),
        )
        blue = np.asarray(agn.photometry(
            np.array([[45.0, 1.0, 0.5, 0.0, 0.0]], np.float32)))[0]
        red = np.asarray(agn.photometry(
            np.array([[45.0, 1.0, -1.5, 0.0, 0.0]], np.float32)))[0]
        # adjacent blue bands: ν^α local ratio tracks the slope directly
        assert blue[0] / blue[1] > red[0] / red[1]

    def test_composite_stellar_plus_agn(self, test_grid, nircam_filters, agn):
        stellar = BatchSEDSimulator(
            test_grid, nircam_filters,
            ("log10_mass", "redshift", "peak_age", "tau",
             "log10_metallicity", "tau_v"),
            sfh="lognormal", zdist="delta", emission=EmissionConfig(),
        )
        comp = CompositeSEDSimulator(
            {"stars": stellar, "agn": agn}, shared=("redshift",)
        )
        idx = {p: i for i, p in enumerate(comp.param_names)}
        theta = np.zeros((2, len(comp.param_names)), np.float32)
        theta[:, idx["redshift"]] = 1.0
        theta[:, idx["stars.log10_mass"]] = 9.0
        theta[:, idx["stars.peak_age"]] = 3e8
        theta[:, idx["stars.tau"]] = 0.5
        theta[:, idx["stars.log10_metallicity"]] = -2.5
        theta[:, idx["stars.tau_v"]] = 0.3
        theta[0, idx["agn.log10_l_agn"]] = 30.0  # negligible AGN
        theta[1, idx["agn.log10_l_agn"]] = 46.5  # AGN-dominated
        theta[:, idx["agn.agn_slope"]] = -0.5
        p = np.asarray(comp.photometry(theta))
        assert np.isfinite(p).all()
        assert p[1].sum() > 3.0 * p[0].sum()

    def test_agn_fraction(self, test_grid):
        lam = jnp.asarray(test_grid.lam, jnp.float32)
        stellar = jnp.ones((1, test_grid.n_wav))
        agn_l = 3.0 * jnp.ones((1, test_grid.n_wav))
        f = np.asarray(agn_fraction(stellar, agn_l, lam))
        np.testing.assert_allclose(f, 0.75, rtol=1e-5)

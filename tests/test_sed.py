"""Batch SED simulator tests: physical sanity + jit/vmap behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.dust import attenuation_curve
from synference_tpu.igm import igm_transmission
from synference_tpu.sed import BatchSEDSimulator, EmissionConfig

PARAM_NAMES = ("log10_mass", "redshift", "peak_age", "tau", "log10_metallicity", "tau_v")


@pytest.fixture(scope="module")
def sim(test_grid, nircam_filters):
    return BatchSEDSimulator(
        grid=test_grid,
        filters=nircam_filters,
        param_names=PARAM_NAMES,
        sfh="lognormal",
        zdist="delta",
        emission=EmissionConfig(incident_type="incident", igm="madau95"),
    )


def _theta(n, rng, z_range=(0.1, 6.0)):
    return np.stack(
        [
            rng.uniform(7.5, 10.5, n),  # log10_mass
            rng.uniform(*z_range, n),  # redshift
            rng.uniform(1e8, 8e8, n),  # peak_age
            rng.uniform(0.2, 1.0, n),  # tau
            rng.uniform(-3.5, -1.6, n),  # log10 Z
            rng.uniform(0.0, 1.5, n),  # tau_v
        ],
        axis=1,
    ).astype(np.float32)


class TestSimulator:
    def test_shapes_and_finite(self, sim, rng):
        theta = _theta(16, rng)
        out = sim.simulate(theta, want_spectra=True)
        assert out["photometry_njy"].shape == (16, 7)
        assert out["fnu_njy"].shape == (16, sim.grid.n_wav)
        assert np.all(np.isfinite(np.asarray(out["photometry_njy"])))
        assert np.all(np.asarray(out["photometry_njy"]) >= 0)

    def test_mass_scaling_linear(self, sim, rng):
        theta = _theta(4, rng)
        theta2 = theta.copy()
        theta2[:, 0] += 1.0  # 10x mass
        p1 = np.asarray(sim.photometry(theta))
        p2 = np.asarray(sim.photometry(theta2))
        np.testing.assert_allclose(p2 / p1, 10.0, rtol=1e-3)

    def test_fainter_at_higher_z(self, sim, rng):
        theta = _theta(1, rng, z_range=(0.5, 0.5))
        theta_far = theta.copy()
        theta_far[:, 1] = 3.0
        p_near = np.asarray(sim.photometry(theta)).sum()
        p_far = np.asarray(sim.photometry(theta_far)).sum()
        assert p_far < p_near

    def test_dust_dims_photometry(self, sim, rng):
        theta = _theta(4, rng)
        theta[:, 5] = 0.0
        theta_dusty = theta.copy()
        theta_dusty[:, 5] = 2.0
        p0 = np.asarray(sim.photometry(theta))
        p1 = np.asarray(sim.photometry(theta_dusty))
        # Calzetti k(λ)→0 beyond ~2.2µm rest, so red bands can be unchanged;
        # nothing brightens, and the blue bands strictly dim.
        assert np.all(p1 <= p0 * (1 + 1e-6))
        assert np.all(p1[:, 0] < 0.8 * p0[:, 0])

    def test_jit_matches_eager(self, sim):
        theta = _theta(8, np.random.default_rng(123))
        eager = np.asarray(sim.photometry(theta))
        jitted = np.asarray(jax.jit(sim.photometry)(theta))
        # fp reassociation under jit: compare with a floor scaled to each
        # row's brightest band (near-zero fluxes have no stable rel. error)
        atol = 1e-5 * np.abs(eager).max(axis=1, keepdims=True)
        assert np.all(np.abs(jitted - eager) <= (1e-3 * np.abs(eager) + atol))

    def test_lyman_break_crosses_filters(self, sim, rng):
        """At z~7 the Lyman break sits in/above the bluest band: flux ratio
        blue/red must drop dramatically vs z~0.5."""
        theta = _theta(1, rng, z_range=(0.5, 0.5))
        theta_hi = theta.copy()
        theta_hi[:, 1] = 7.0
        p_lo = np.asarray(sim.photometry(theta))[0]
        p_hi = np.asarray(sim.photometry(theta_hi))[0]
        ratio_lo = p_lo[0] / p_lo[-1]
        ratio_hi = p_hi[0] / p_hi[-1]
        assert ratio_hi < ratio_lo * 0.5

    def test_fixed_params(self, test_grid, nircam_filters, rng):
        sim_fixed = BatchSEDSimulator(
            grid=test_grid,
            filters=nircam_filters,
            param_names=("log10_mass", "redshift", "peak_age", "tau", "log10_metallicity"),
            sfh="lognormal",
            zdist="delta",
            emission=EmissionConfig(),
            fixed_params={"tau_v": 0.3},
        )
        theta = _theta(2, rng)[:, :5]
        p = np.asarray(sim_fixed.photometry(theta))
        assert np.all(np.isfinite(p)) and np.all(p > 0)

    def test_pacman_fesc_and_birth_cloud(self, test_grid, nircam_filters, rng):
        em = EmissionConfig(
            incident_type="incident",
            reprocessed_types=("transmitted", "nebular"),
            fesc="fesc",
            tau_v_param="tau_v",
            tau_v_bc_param="tau_v_bc",
            age_pivot_log10=7.0,
        )
        names = PARAM_NAMES + ("fesc", "tau_v_bc")
        sim2 = BatchSEDSimulator(
            grid=test_grid,
            filters=nircam_filters,
            param_names=names,
            sfh="lognormal",
            zdist="delta",
            emission=em,
        )
        base = _theta(3, rng)
        theta = np.concatenate(
            [base, np.full((3, 1), 0.1, np.float32), np.full((3, 1), 0.5, np.float32)],
            axis=1,
        )
        p = np.asarray(sim2.photometry(theta))
        assert np.all(np.isfinite(p)) and np.all(p >= 0)

    def test_dust_emission_conserves_flux_direction(self, test_grid, nircam_filters, rng):
        em_on = EmissionConfig(dust_emission=True, dust_temperature=40.0)
        em_off = EmissionConfig(dust_emission=False)
        mk = lambda em: BatchSEDSimulator(
            grid=test_grid, filters=nircam_filters, param_names=PARAM_NAMES,
            sfh="lognormal", zdist="delta", emission=em,
        )
        theta = _theta(2, rng)
        theta[:, 5] = 2.0  # dusty
        s_on = np.asarray(mk(em_on).simulate(theta, want_spectra=True)["lnu"])
        s_off = np.asarray(mk(em_off).simulate(theta, want_spectra=True)["lnu"])
        # dust emission only adds energy (in the IR)
        assert s_on.sum() > s_off.sum()


class TestDustCurves:
    def test_calzetti_shape(self):
        lam = jnp.asarray([1500.0, 3000.0, 5500.0, 9000.0, 22000.0])
        k = np.asarray(attenuation_curve("calzetti2000", lam))
        assert np.isclose(k[2], 1.0, atol=0.1)  # ~1 at V
        assert np.all(np.diff(k) < 0)  # monotonically decreasing with lam

    def test_power_law(self):
        lam = jnp.asarray([2750.0, 5500.0, 11000.0])
        k = np.asarray(attenuation_curve("power_law", lam, {"slope": -1.0}))
        np.testing.assert_allclose(k, [2.0, 1.0, 0.5], rtol=1e-5)


class TestIGM:
    def test_transparent_redward_of_lya(self):
        z = 3.0
        lam_obs = jnp.asarray([1216.0 * (1 + z) * 1.05, 9000.0, 20000.0])
        t = np.asarray(igm_transmission(lam_obs, z))
        np.testing.assert_allclose(t, 1.0, atol=1e-6)

    def test_opaque_below_lyman_limit_high_z(self):
        z = 6.0
        lam_obs = jnp.asarray([900.0 * (1 + z) * 0.5])
        t = np.asarray(igm_transmission(lam_obs, z))
        assert t[0] < 1e-3

    def test_forest_absorbs_partially(self):
        z = 3.0
        lam_obs = jnp.asarray([1100.0 * (1 + z)])  # in the forest
        t = float(igm_transmission(lam_obs, z)[0])
        assert 0.0 < t < 1.0


class TestWideFilterSet:
    def test_63_filters_paper_scale(self, test_grid, rng):
        """The reference's paper-scale config uses 63 filters
        (BASELINE.md); exercise a wide filter set end to end."""
        from synference_tpu.filters import FilterSet, tophat_filter

        centers = np.geomspace(4000.0, 80000.0, 63)
        fs = FilterSet([
            tophat_filter(f"B{i}", c, 0.15 * c)
            for i, c in enumerate(centers)
        ])
        sim = BatchSEDSimulator(
            test_grid, fs, PARAM_NAMES, sfh="lognormal", zdist="delta",
        )
        theta = _theta(16, rng)
        p = np.asarray(sim.photometry(theta))
        assert p.shape == (16, 63)
        assert np.isfinite(p).all() and (p >= 0).all()

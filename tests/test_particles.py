"""Stochastic particle SFZH sampling tests (Synthesizer sample_sfzh mode)."""

import numpy as np
import pytest

from synference_tpu.sed import BatchSEDSimulator, EmissionConfig

NAMES = ("log10_mass", "redshift", "peak_age", "tau",
         "log10_metallicity", "tau_v")


def _theta(n, rng):
    return np.stack([
        rng.uniform(8, 10, n), rng.uniform(0.5, 3, n),
        rng.uniform(1e8, 5e8, n), rng.uniform(0.3, 0.8, n),
        rng.uniform(-3, -2, n), rng.uniform(0, 1, n),
    ], axis=1).astype(np.float32)


class TestParticleSampling:
    def test_converges_to_parametric(self, test_grid, nircam_filters, rng):
        smooth = BatchSEDSimulator(test_grid, nircam_filters, NAMES)
        particle = BatchSEDSimulator(
            test_grid, nircam_filters, NAMES, n_particles=100_000
        )
        theta = _theta(4, rng)
        p_smooth = np.asarray(smooth.photometry(theta))
        p_part = np.asarray(particle.photometry(theta))
        np.testing.assert_allclose(p_part, p_smooth, rtol=0.05)

    def test_few_particles_add_scatter(self, test_grid, nircam_filters, rng):
        smooth = BatchSEDSimulator(test_grid, nircam_filters, NAMES)
        particle = BatchSEDSimulator(
            test_grid, nircam_filters, NAMES, n_particles=32
        )
        theta = _theta(8, rng)
        p_smooth = np.asarray(smooth.photometry(theta))
        p_part = np.asarray(particle.photometry(theta))
        rel = np.abs(p_part - p_smooth) / p_smooth
        assert rel.mean() > 0.01  # stochastic IMF scatter present
        assert np.isfinite(p_part).all()

    def test_mass_conserved(self, test_grid, nircam_filters, rng):
        particle = BatchSEDSimulator(
            test_grid, nircam_filters, NAMES, n_particles=500
        )
        theta = _theta(3, rng)
        out = particle.simulate(theta, want_spectra=True)
        total = np.asarray(out["sfzh"]).sum(axis=1)
        np.testing.assert_allclose(total, 10.0 ** theta[:, 0], rtol=1e-4)

    def test_different_rows_different_realizations(self, test_grid,
                                                   nircam_filters, rng):
        particle = BatchSEDSimulator(
            test_grid, nircam_filters, NAMES, n_particles=64
        )
        theta = _theta(1, rng)
        theta2 = theta.copy()
        theta2[0, 1] += 1e-3  # tiny θ change -> different fold_in key
        s1 = np.asarray(particle.simulate(theta, want_spectra=True)["sfzh"])
        s2 = np.asarray(particle.simulate(theta2, want_spectra=True)["sfzh"])
        assert not np.allclose(s1, s2)

    def test_colliding_theta_sums_differ(self, test_grid, nircam_filters,
                                         rng):
        """Two rows whose quantized θ *sums* coincide (z and tau_v trading
        one 1e-4 quantum) must still get independent particle realizations —
        the key folds in the batch row index, not just θ-derived entropy."""
        particle = BatchSEDSimulator(
            test_grid, nircam_filters, NAMES, n_particles=64
        )
        row1 = _theta(1, rng)[0]
        row2 = row1.copy()
        row2[1] += 1e-4  # redshift up one quantum
        row2[5] -= 1e-4  # tau_v down one quantum: int32 sums collide
        theta = np.stack([row1, row2])
        q = (theta * 1e4).astype(np.int64).sum(axis=1)
        assert q[0] == q[1]  # the collision the regression guards against
        sfzh = np.asarray(
            particle.simulate(theta, want_spectra=True)["sfzh"])
        assert not np.allclose(sfzh[0], sfzh[1])

"""Spectral feature path + online TSNPE tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synference_tpu.flows import build_flow
from synference_tpu.online import run_online_snpe
from synference_tpu.priors import BoxUniform
from synference_tpu.spectra import (
    SpectralFeaturePipeline,
    generate_constant_r_grid,
    match_resolution_constant_r,
    resample_spectrum,
)
from synference_tpu.train import TrainConfig

KEY = jax.random.PRNGKey(0)


class TestConstantRGrid:
    def test_spacing(self):
        g = generate_constant_r_grid(r=300, start=3000, end=30000)
        ratios = g[1:] / g[:-1]
        np.testing.assert_allclose(ratios, 1 + 0.5 / 300, rtol=1e-10)
        assert g[0] == 3000 and g[-1] >= 30000


class TestResolutionMatching:
    def test_line_broadened_to_instrument_width(self):
        r_grid, r_out = 10000.0, 500.0
        lam = generate_constant_r_grid(r=r_grid, start=4000, end=7000)
        # narrow emission line at 5500
        flux = np.exp(-0.5 * ((lam - 5500.0) / 0.5) ** 2)
        sm = np.asarray(match_resolution_constant_r(
            jnp.asarray(flux, jnp.float32), 1e5, r_out, r_grid))
        # measure FWHM of the smoothed line
        half = sm.max() / 2
        above = lam[sm > half]
        fwhm = above.max() - above.min()
        expected = 5500.0 / r_out
        assert abs(fwhm - expected) / expected < 0.2
        # flux conserved
        assert abs(sm.sum() - flux.sum()) / flux.sum() < 1e-3

    def test_noop_when_already_low_res(self):
        flux = jnp.asarray(np.random.default_rng(0).random(100), jnp.float32)
        out = match_resolution_constant_r(flux, 100.0, 500.0, 1000.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(flux))


class TestSpectralPipeline:
    def test_redshift_moves_features(self):
        rest = generate_constant_r_grid(r=2000, start=1000, end=20000)
        obs = generate_constant_r_grid(r=300, start=4000, end=50000)
        pipe = SpectralFeaturePipeline(rest, obs, instrument_r=300)
        # break at rest 3646 A
        flux = np.where(rest < 3646.0, 0.2, 1.0).astype(np.float32)
        out = np.asarray(pipe(np.stack([flux, flux]), np.array([0.5, 2.0])))
        assert out.shape == (2, len(obs))
        # break observed at 3646*(1+z)
        for i, z in enumerate([0.5, 2.0]):
            lam_break = 3646 * (1 + z)
            j = np.searchsorted(np.asarray(obs), lam_break)
            assert out[i, max(j - 8, 0)] < 0.6 * out[i, min(j + 8, len(obs) - 1)]

    def test_norm_window(self):
        rest = generate_constant_r_grid(r=1000, start=1000, end=20000)
        obs = generate_constant_r_grid(r=200, start=4000, end=30000)
        pipe = SpectralFeaturePipeline(rest, obs, instrument_r=200,
                                       norm_window=(10000.0, 12000.0))
        flux = np.full(len(rest), 7.0, np.float32)
        out = np.asarray(pipe(flux[None], np.array([0.1])))
        assert out.shape == (1, len(obs) + 1)
        m = (np.asarray(obs) >= 10000) & (np.asarray(obs) <= 12000)
        np.testing.assert_allclose(out[0, :-1][m], 1.0, rtol=1e-4)


@pytest.mark.slow
def test_online_tsnpe_recovers_parameters():
    """Simple 2-param simulator: x = [θ0+θ1, θ0−θ1] + noise. TSNPE should
    tighten the posterior around the true θ after a few rounds."""
    prior = BoxUniform([-2.0, -2.0], [2.0, 2.0], ("a", "b"))
    true_theta = np.array([0.7, -0.4], np.float32)

    noise_key = [jax.random.PRNGKey(99)]

    def simulate(theta):
        theta = jnp.asarray(theta)
        x = jnp.stack(
            [theta[:, 0] + theta[:, 1], theta[:, 0] - theta[:, 1]], axis=1
        )
        noise_key[0], k = jax.random.split(noise_key[0])
        return np.asarray(x + 0.05 * jax.random.normal(k, x.shape))

    x_obs = np.array([true_theta[0] + true_theta[1],
                      true_theta[0] - true_theta[1]], np.float32)
    flow = build_flow("mdn", 2, 2, hidden_features=24, num_components=3)
    post, data, hist = run_online_snpe(
        simulate, prior, flow, x_obs, n_rounds=2, sims_per_round=1500,
        train_config=TrainConfig(max_epochs=30, stop_after_epochs=8,
                                 batch_size=256, learning_rate=1e-3),
        key=KEY, verbose=False,
    )
    s = np.asarray(post.sample(jax.random.PRNGKey(5), x_obs, 1000))
    np.testing.assert_allclose(s.mean(0), true_theta, atol=0.15)
    # unbiased TSNPE keeps honest width (the posterior-as-proposal variant
    # would overconcentrate here); still far tighter than the prior (std 1.15)
    assert s.std(0).max() < 0.45
    assert len(hist) == 2
    # round-2 proposals concentrate near truth vs prior
    r2 = data["theta"][1]
    assert np.abs(r2.mean(0) - true_theta).max() < 0.5


class TestVariableResolution:
    def test_matches_constant_r_when_curve_flat(self):
        from synference_tpu.spectra import (
            match_resolution_constant_r,
            match_resolution_curve,
        )

        r_grid = 5000.0
        lam = generate_constant_r_grid(r=r_grid, start=4000, end=9000)
        rng = np.random.default_rng(0)
        flux = rng.random(len(lam)).astype(np.float32)
        const = np.asarray(
            match_resolution_constant_r(jnp.asarray(flux), 1e5, 300.0, r_grid)
        )
        curve = np.asarray(match_resolution_curve(
            jnp.asarray(flux), lam, 1e5,
            np.array([3000.0, 10000.0]), np.array([300.0, 300.0]), r_grid,
        ))
        np.testing.assert_allclose(curve, const, atol=0.02 * flux.max())

    def test_variable_curve_broadens_differently(self):
        from synference_tpu.spectra import match_resolution_curve

        r_grid = 10000.0
        lam = generate_constant_r_grid(r=r_grid, start=4000, end=9000)
        flux = (np.exp(-0.5 * ((lam - 5000.0) / 0.5) ** 2)
                + np.exp(-0.5 * ((lam - 8000.0) / 0.8) ** 2)).astype(np.float32)
        out = np.asarray(match_resolution_curve(
            jnp.asarray(flux), lam, 1e5,
            np.array([4000.0, 9000.0]), np.array([2000.0, 200.0]), r_grid,
        ))

        def fwhm(center):
            m = np.abs(lam - center) < center * 0.02
            seg, lseg = out[m], lam[m]
            half = seg.max() / 2
            above = lseg[seg > half]
            return above.max() - above.min()

        # interpolated curve: R(5000)=1640 -> FWHM ~3 A; R(8000)=560 -> ~14 A
        assert fwhm(5000.0) < 6.0
        assert 10.0 < fwhm(8000.0) < 20.0

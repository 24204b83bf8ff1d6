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
class TestFluxConservingResample:
    """`resample_spectrum_conserve` = the reference's spectres semantics
    (utils.py:185-254): exact flux conservation at sharp emission lines
    where linear interpolation loses (or invents) line flux."""

    def test_sharp_line_flux_conserved(self):
        from synference_tpu.spectra import resample_spectrum_conserve

        lam = np.linspace(4000.0, 7000.0, 3001)  # 1 Å pixels
        flux = np.full_like(lam, 1.0)
        flux[np.abs(lam - 5007.0) < 1.5] += 100.0  # sharp [OIII]-like line
        total_in = np.trapezoid(flux - 1.0, lam)
        # resample onto a 9x coarser grid whose pixel centers straddle the
        # line — a worst case for interpolation
        new_lam = np.linspace(4001.3, 6998.0, 334)
        out_c = np.asarray(resample_spectrum_conserve(new_lam, lam, flux))
        out_l = np.asarray(resample_spectrum(new_lam, lam, flux))
        w_new = np.gradient(new_lam)
        line_c = ((out_c - 1.0) * w_new)[np.abs(new_lam - 5007) < 40].sum()
        line_l = ((out_l - 1.0) * w_new)[np.abs(new_lam - 5007) < 40].sum()
        assert abs(line_c / total_in - 1.0) < 0.01, line_c / total_in
        # linear interpolation badly misestimates the line flux here
        assert abs(line_l / total_in - 1.0) > 0.15

    def test_matches_linear_on_smooth_spectra(self):
        from synference_tpu.spectra import resample_spectrum_conserve

        lam = np.geomspace(3000.0, 30000.0, 2000)
        flux = np.sin(lam / 3000.0) + 2.0
        new_lam = np.geomspace(3200.0, 28000.0, 700)
        out_c = np.asarray(resample_spectrum_conserve(new_lam, lam, flux))
        out_l = np.asarray(resample_spectrum(new_lam, lam, flux))
        np.testing.assert_allclose(out_c, out_l, rtol=2e-3, atol=2e-3)

    def test_batched_matches_single(self):
        from synference_tpu.spectra import resample_spectrum_conserve

        rng = np.random.default_rng(0)
        lam = np.linspace(1.0, 10.0, 200)
        flux = rng.uniform(0.5, 2.0, (5, 200)).astype(np.float32)
        new_lam = np.linspace(1.5, 9.5, 77)
        batched = np.asarray(resample_spectrum_conserve(new_lam, lam, flux))
        for i in range(5):
            single = np.asarray(
                resample_spectrum_conserve(new_lam, lam, flux[i]))
            np.testing.assert_allclose(batched[i], single, rtol=1e-6)

    def test_pipeline_flux_conserving_option(self):
        rest = generate_constant_r_grid(r=500, start=2000, end=12000)
        obs = generate_constant_r_grid(r=80, start=3000, end=20000)
        pipe = SpectralFeaturePipeline(rest, obs, instrument_r=80.0,
                                       flux_conserving=True)
        rng = np.random.default_rng(1)
        fnu = rng.uniform(1.0, 2.0, (4, rest.size)).astype(np.float32)
        z = np.array([0.1, 0.5, 1.0, 2.0], np.float32)
        out = np.asarray(pipe(fnu, z))
        assert out.shape == (4, obs.size)
        assert np.isfinite(out).all()


class TestSpectralNormalizationParity:
    """Fitter spectra-path flux normalization (reference
    `_apply_flux_normalization`, sbi_runner.py:1096-1178)."""

    def _fitter(self):
        from synference_tpu.fitter import SBIFitter

        rng = np.random.default_rng(2)
        lam = np.linspace(4000.0, 9000.0, 101)
        spec = rng.uniform(1.0, 3.0, (32, 101)).astype(np.float32)
        theta = rng.uniform(0, 1, (32, 2)).astype(np.float32)
        return SBIFitter(
            photometry=np.ones((32, 1), np.float32), parameters=theta,
            parameter_names=("a", "b"), filter_codes=("F0",),
            spectra=spec, wavelengths=lam), spec, lam

    def test_tophat_normalization(self):
        fitter, spec, lam = self._fitter()
        feats = fitter.create_feature_array_from_raw_spectra(
            normalize=("tophat", 6000.0, 500.0))
        m = np.abs(lam - 6000.0) <= 250.0
        norm = spec[:, m].mean(axis=1)
        np.testing.assert_allclose(feats[:, :-1], spec / norm[:, None],
                                   rtol=1e-5)
        np.testing.assert_allclose(feats[:, -1], np.log10(norm), rtol=1e-5)

    def test_bandpass_normalization(self):
        fitter, spec, lam = self._fitter()
        feats = fitter.create_feature_array_from_raw_spectra(
            normalize=("bandpass", 5000.0, 7000.0))
        m = (lam >= 5000.0) & (lam <= 7000.0)
        norm = spec[:, m].mean(axis=1)
        np.testing.assert_allclose(feats[:, :-1], spec / norm[:, None],
                                   rtol=1e-5)

    def test_callable_normalization(self):
        fitter, spec, lam = self._fitter()
        feats = fitter.create_feature_array_from_raw_spectra(
            normalize=lambda s, w: s.max(axis=1))
        norm = spec.max(axis=1)
        np.testing.assert_allclose(feats[:, :-1], spec / norm[:, None],
                                   rtol=1e-5)

    def test_crop_lam(self):
        fitter, spec, lam = self._fitter()
        feats = fitter.create_feature_array_from_raw_spectra(
            crop_lam=(5000.0, 7000.0))
        i0, i1 = np.searchsorted(lam, (5000.0, 7000.0))
        assert feats.shape[1] == i1 - i0

    def test_window_outside_grid_raises(self):
        fitter, spec, lam = self._fitter()
        with pytest.raises(ValueError, match="misses"):
            fitter.create_feature_array_from_raw_spectra(
                normalize=("tophat", 20000.0, 100.0))

    def test_pixel_normalization_back_compat(self):
        fitter, spec, lam = self._fitter()
        feats = fitter.create_feature_array_from_raw_spectra(
            normalize_pixel=50)
        norm = spec[:, 50]
        np.testing.assert_allclose(feats[:, :-1], spec / norm[:, None],
                                   rtol=1e-5)


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
